"""Driver-facing query library (the t2 correctness surface).

Each query is registered with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` built on the
  DataFrame API (Catalyst-optimized), and
- a DuckDB-dialect oracle SQL string computing the same result on the
  same parquet tables.

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.

Modules register themselves on import.
"""

from __future__ import annotations

from .registry import REGISTRY, Query, register  # noqa: F401

# Import for side effect: each module registers its queries.
from . import tpch  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import events_analytics  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import pipeline_text  # noqa: E402,F401
from . import pipeline_similarity  # noqa: E402,F401
from . import pipeline_dedup  # noqa: E402,F401
from . import pipeline_multimodal  # noqa: E402,F401
from . import pipeline_corpus  # noqa: E402,F401
from . import pipeline_clustering  # noqa: E402,F401
from . import pipeline_quality  # noqa: E402,F401
from . import pipeline_cleaning  # noqa: E402,F401
from . import pipeline_layout  # noqa: E402,F401
from . import pipeline_pq  # noqa: E402,F401
from . import profiling  # noqa: E402,F401
from . import pipeline_setjoin  # noqa: E402,F401
from . import pipeline_editdist  # noqa: E402,F401
from . import pipeline_curation  # noqa: E402,F401
from . import pipeline_graph  # noqa: E402,F401
from . import pipeline_pca  # noqa: E402,F401
from . import pipeline_bpe  # noqa: E402,F401
from . import pipeline_drift  # noqa: E402,F401
from . import pipeline_mmr  # noqa: E402,F401
from . import scd  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import olap  # noqa: E402,F401
from . import integrity  # noqa: E402,F401
from . import ekubo_views  # noqa: E402,F401


# Driver-priority ordering: the correctness harness checks queries in
# dict order with a bounded budget (~50 in round 1), so put the entries
# with the least prior driver evidence first — the round-1 failures
# (now fixed), the V1-V17 reference views, and the LLM-pipeline
# operators that the round-1 run never reached. Previously-green
# shapes keep their pytest oracles and round-1 CORRECTNESS rows; one
# representative per operator family stays inside the window.
DRIVER_PRIORITY = [
    # round-5 front: freshness rotation (VERDICT r4 items 1 and 2). The
    # ~50-query driver window covers, in priority order:
    #   (a) the 5 queries registered late in round 4 that have NEVER had a
    #       driver hash row (builder sim + pytest only until now),
    #   (b) queries new in round 5 (registered below their module),
    #   (c) the 17 queries whose latest green row dates to round 2 — the
    #       ≤2-round freshness policy says rotate them forward now,
    #   (d) the r3-latest rows most exposed to shared-infra churn since:
    #       the 17 Ekubo views, the three former r1 failures, the LSH/
    #       setjoin-adjacent dedup family, and ann_topk_ivfpq.
    # Every query left outside the window keeps a green r3/r4 row, so
    # after r5 no registered query's latest row is older than r3.
    # -- (a) never driver-verified (registered late round 4)
    "setjoin_prefix_jaccard",
    "cm_count_estimates",
    "corpus_curation_pipeline",
    "multimodal_binary_near_dup",
    "graph_pagerank",
    # -- (b) new in round 5
    "bm25_topk",
    "hybrid_rrf_retrieval",
    "price_quantity_regression",
    "editdist_near_pairs",
    "setjoin_prefix_jaccard_capped",
    "bloom_decontamination",
    "vocab_encode_ids",
    "market_share",
    "product_type_profit",
    "returned_item_revenue",
    "priority_line_distribution",
    "promo_revenue_share",
    "top_supplier_revenue",
    "small_quantity_order_revenue",
    "disjunctive_predicate_revenue",
    "part_promotion_suppliers",
    "sole_return_blame_suppliers",
    "between_class_pca",
    "bpe_train_merges",
    "weighted_sample_topk",
    "ks_drift_by_source",
    "mmr_diverse_topk",
    "pmi_collocations",
    "tvd_drift_by_source",
    "scd2_user_state",
    "postings_index",
    "phrase_match",
    "skipgram_pairs",
    # -- (c) latest driver row is round 2: refresh
    "bigram_logprob_score",
    "chunk_overlap",
    "constraint_violations",
    "engaged_non_buyers",
    "gopher_quality_filter",
    "length_bucket_histogram",
    "random_projection_reduce",
    "repetition_score",
    "segment_dedup",
    "semdedup_select",
    "sequence_packing",
    "source_mixing_sample",
    "stratified_sample",
    "tfidf_top_terms",
    "train_val_test_split",
    "unigram_logprob_score",
    "word_entropy_quality",
    # -- (d) r3 rows nearest the round-4/5 churn (the 10 late-round
    # TPC-H additions and the 4 session-2 round-5 queries above
    # displaced 14 r3 rows from the window — those keep green r3
    # rows, within the ≤2-round policy at r5, and rotate to the
    # front in round 6 along with ann_topk_ivfpq, v16_hourly_tvl_delta,
    # v17_staker_rewards, minhash_lsh_dedup_capped, dedup_components,
    # and all 17 v-views, displaced by the session-3 round-5 queries
    # above — every displaced query keeps a green r3 row, within the
    # ≤2-round policy at r5. The window is now exactly: 5 never-
    # verified + 28 new-in-round-5 + 17 r2-stale refreshes.)
    # -- position 51: first of the round-6 rotation (registered after
    # the window filled; builder sim MATCH at sf0.001/0.01/0.1)
    "weighted_sample_per_source",
]


def _ordered() -> dict[str, Query]:
    out = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    out.update({n: q for n, q in REGISTRY.items() if n not in out})
    return out


def queries():
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql():
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
