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
    # round-3 front: the 10 queries registered late in round 2 that the
    # driver window never reached (they pass the local sf0.001 oracle;
    # this rotation gets them hash-verified at driver level -> 107/107
    # ever-verified). Banked green r2 rows rotated out to make room.
    "ann_topk_rp_rerank",
    "corpus_shuffle_shard",
    "events_profile",
    "gap_fill_hourly",
    "pii_redaction",
    "props_map_stats",
    "source_lang_pivot",
    "value_decile_bands",
    "value_mad_by_type",
    "value_time_correlation",
    # round-3 additions with no prior driver row
    "minhash_lsh_dedup_capped",
    "approx_distinct_shingles",
    "zorder_locality",
    "pq_encode_codes",
    "pq_ann_adc_topk",
    "interval_attribution",
    "ann_topk_ivfpq",
    # round-1 CORRECTNESS errors, fixed round 2 (driver-green r2)
    "time_weighted_balance",
    "funnel_conversion",
    "range_theta_join",
    # reference view library V1-V17
    "v01_pool_states",
    "v02_tick_liquidity",
    "v03_twamm_pool_states",
    "v04_twamm_sale_rate_deltas",
    "v05_limit_order_pool_states",
    "v06_spline_pools",
    "v07_last_24h_pool_stats",
    "v08_token_registrations",
    "v09_oracle_pool_states",
    "v10_realized_volatility",
    "v11_market_depth",
    "v12_voting_weights",
    "v13_hourly_volume",
    "v14_hourly_revenue",
    "v15_hourly_price",
    "v16_hourly_tvl_delta",
    "v17_staker_rewards",
    # LLM-pipeline operators never reached by the round-1 driver run
    "ann_topk_ivf_kmeans",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "minhash_dedup_incremental",
    "decontamination_ngram",
    "dedup_components",
    "multimodal_metadata",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    "sessionize_events",
    "rollup_hourly_activity",
    "token_doc_frequency",
    "top_tokens_per_lang",
    "stratified_sample",
    "repetition_score",
    "sequence_packing",
    "word_entropy_quality",
    "unigram_logprob_score",
    "source_mixing_sample",
    "length_bucket_histogram",
    # round-2 additions with no prior driver row
    "train_val_test_split",
    "gopher_quality_filter",
    # round-2 session additions with no prior driver row (these
    # replaced seven slots previously held by queries that already
    # have green CORRECTNESS_r01 rows — maximizing total-ever-checked
    # coverage within the driver's ~50-query budget)
    "segment_dedup",
    "chunk_overlap",
    "tfidf_top_terms",
    "constraint_violations",
    "semdedup_select",
    "bigram_logprob_score",
    "random_projection_reduce",
    # O5 intersect/except — registered round 2, no prior driver row
    "engaged_non_buyers",
]


def _ordered() -> dict[str, Query]:
    out = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    out.update({n: q for n, q in REGISTRY.items() if n not in out})
    return out


def queries():
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql():
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
