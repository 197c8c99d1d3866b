"""Training-data *selection* operators: DSIR importance weighting and
contrastive hard-negative mining.

Both are beyond-reference LLM-pipeline components (the reference engine
has no text surface; these extend the mandated dedup/quality family):

- ``dsir_importance_weights`` — Data Selection via Importance
  Resampling (Xie et al., 2023): score every raw-pool document by the
  log-likelihood ratio of a hashed-feature bag-of-ngrams model fit on a
  small target corpus vs the raw pool itself, then keep the top-scoring
  docs. At 100 TB the feature tables are bucket-count-sized (8k rows
  here, ~millions at scale — still broadcastable), so the plan is: one
  exploded-token pass to build both models (map-side combine), then a
  broadcast join back onto the token stream and one per-doc aggregate —
  the corpus is scanned twice and shuffled once, on doc_id.
- ``hard_negative_mining`` — for each (query, positive) training pair,
  the top-k most-similar NON-positive candidates: the standard way to
  build contrastive training batches for embedding models. Plan shape
  is the brute-force cosine baseline (broadcast query side, per-query
  top-k window) with the positive pair anti-filtered; the oracle
  replays it exactly. The IVF/LSH bucketed variants registered in
  pipeline_similarity are the documented scale path for the candidate
  generation stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import md5_hash60_expr, tokens_expr
from .pipeline_similarity import TOP_K
from .registry import register

#: hashed-feature space size (DSIR uses 10k buckets; 8192 keeps the
#: smoothing denominator a power of two)
N_FEATURES = 8192
#: the held-out target distribution: one crawl source stands in for the
#: curated target corpus (same convention as decontamination's
#: EVAL_SOURCE)
TARGET_SOURCE = "src0"
#: how many raw-pool docs the selection keeps
SELECT_N = 100
#: importance scores are summed as integer micro-nats: the per-feature
#: log-ratio is rounded to 1e-6 BEFORE the per-doc sum, so the sum is
#: order-invariant (exact BIGINT) and value-hashes cross-engine
MICRO = 1_000_000

_TOKS_SQL = r"""
    SELECT doc_id, source,
           unnest(list_filter(string_split_regex(
               regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
               x -> x <> '')) AS token
    FROM documents
"""


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS ({_TOKS_SQL}),
    feat AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(token), 1, 15))::BIGINT % {N_FEATURES} AS f
      FROM tok
    ),
    tgt AS (SELECT f, COUNT(*) AS tc FROM feat
            WHERE source = '{TARGET_SOURCE}' GROUP BY f),
    rawc AS (SELECT f, COUNT(*) AS rc FROM feat
             WHERE source <> '{TARGET_SOURCE}' GROUP BY f),
    tots AS (
      SELECT SUM(CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS tt,
             SUM(CASE WHEN source <> '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS tr
      FROM feat
    ),
    w AS (
      SELECT d.f,
             CAST(FLOOR({MICRO} * (
               LN(CAST(COALESCE(t.tc, 0) + 1 AS DOUBLE)
                  / CAST(tots.tt + {N_FEATURES} AS DOUBLE))
               - LN(CAST(COALESCE(r.rc, 0) + 1 AS DOUBLE)
                    / CAST(tots.tr + {N_FEATURES} AS DOUBLE))
             ) + 0.5) AS BIGINT) AS w_micro
      FROM (SELECT DISTINCT f FROM feat) d
      LEFT JOIN tgt t USING (f)
      LEFT JOIN rawc r USING (f)
      CROSS JOIN tots
    )
    SELECT doc_id, n_tokens, importance_micro FROM (
      SELECT fe.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w.w_micro) AS BIGINT) AS importance_micro,
             ROW_NUMBER() OVER (ORDER BY SUM(w.w_micro) DESC, fe.doc_id)
               AS rnk
      FROM feat fe JOIN w USING (f)
      WHERE fe.source <> '{TARGET_SOURCE}'
      GROUP BY fe.doc_id
    ) WHERE rnk <= {SELECT_N}
    """,
    doc="DSIR data selection (Xie et al. 2023): hashed-unigram "
    "importance weights log p_target(f)/p_raw(f), add-one smoothed "
    "over 8192 feature buckets, summed per raw-pool document in "
    "integer micro-nats (rounded per FEATURE, so the doc sum is "
    "order-invariant and exact); top-100 docs by importance are the "
    "selected set. Scale shape: both feature models come from one "
    "exploded-token pass with map-side combine; the 8192-row weight "
    "table broadcast-joins back onto the token stream, so the only "
    "fact-sized shuffle is the final doc_id aggregate.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    feat = tok.select(
        "doc_id",
        "source",
        (md5_hash60_expr(F.col("token")) % F.lit(N_FEATURES)).alias("f"),
    ).localCheckpoint(eager=False)  # feeds tgt/rawc/tots/vocab/scoring:
    # one tokenize+hash pass instead of one per consumer (r12)
    is_tgt = F.col("source") == TARGET_SOURCE
    tgt = feat.filter(is_tgt).groupBy("f").agg(F.count(F.lit(1)).alias("tc"))
    rawc = feat.filter(~is_tgt).groupBy("f").agg(F.count(F.lit(1)).alias("rc"))
    tots = feat.agg(
        F.sum(F.when(is_tgt, 1).otherwise(0)).alias("tt"),
        F.sum(F.when(~is_tgt, 1).otherwise(0)).alias("tr"),
    )
    w = (
        feat.select("f")
        .distinct()
        .join(tgt, "f", "left")
        .join(rawc, "f", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "f",
            # FLOOR(x + 0.5), not round(): engine halfway rules differ
            # (ADVICE r7 — same idiom as decontamination_ngram)
            F.floor(
                F.lit(MICRO)
                * (
                    F.log(
                        (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                        / (F.col("tt") + N_FEATURES).cast("double")
                    )
                    - F.log(
                        (F.coalesce(F.col("rc"), F.lit(0)) + 1).cast("double")
                        / (F.col("tr") + N_FEATURES).cast("double")
                    )
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    scored = (
        feat.filter(~is_tgt)
        .join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("w_micro").cast("bigint").alias("importance_micro"),
        )
    )
    rw = W.orderBy(F.col("importance_micro").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= SELECT_N)
        .select("doc_id", "n_tokens", "importance_micro")
    )


#: every (q, q+1) vec pair with q ≡ 0 (mod QUERY_MOD) is a synthetic
#: (query, positive) training pair — deterministic, corpus-independent
QUERY_MOD = 25


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS en
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, p.vec_id AS positive_id,
             q.ev AS qv, q.en AS qn
      FROM v q JOIN v p ON p.vec_id = q.vec_id + 1
      WHERE q.vec_id % {QUERY_MOD} = 0
    ),
    sims AS (
      SELECT pr.query_id, pr.positive_id, c.vec_id AS negative_id,
             CAST(FLOOR(list_dot_product(pr.qv, c.ev) / (pr.qn * c.en)
                        * 10000 + 0.5) AS BIGINT) AS sim_i4
      FROM pairs pr, v c
      WHERE c.vec_id <> pr.query_id AND c.vec_id <> pr.positive_id
    )
    SELECT query_id, positive_id, negative_id,
           CAST(sim_i4 AS DOUBLE) / 10000.0 AS sim, rank FROM (
      SELECT query_id, positive_id, negative_id, sim_i4,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim_i4 DESC, negative_id) AS rank
      FROM sims
    ) WHERE rank <= {TOP_K}
    """,
    doc="Contrastive hard-negative mining: for each (query, positive) "
    "embedding training pair, the top-k most-cosine-similar candidates "
    "that are NOT the positive — the negatives that actually move an "
    "embedding model. The candidate scan runs on the blocked-GEMM "
    "kernel (gemm_topk_neighbors) at k+1 — the positive can occupy at "
    "most one slot, so the top-(k+1) self-excluded list always "
    "contains the top-k positive-excluded list; the positive filters "
    "out after the merge and ranks recompute on n_queries*(k+1) rows. "
    "Sims quantize to integer ten-thousandths (FLOOR(x*1e4+0.5)) "
    "before ranking on both engines; swap the exhaustive kernel for "
    "the IVF-grouped variant at billion-vector scale.",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import gemm_topk_neighbors

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    pos = emb.select(
        (F.col("vec_id") - 1).alias("query_id"),
        F.col("vec_id").alias("positive_id"),
    )
    # inner join: probes without a (query_id + 1) positive drop, as in
    # the pairs CTE. k+1 candidates per query cover the positive slot.
    pairs = probes.select(F.col("vec_id").alias("query_id")).join(pos, "query_id")
    cands = gemm_topk_neighbors(emb, probes, TOP_K + 1)
    w = W.partitionBy("query_id").orderBy(
        F.col("sim_i4").desc(), F.col("neighbor_id")
    )
    return (
        cands.join(F.broadcast(pairs), "query_id")
        .filter(F.col("neighbor_id") != F.col("positive_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "positive_id",
            F.col("neighbor_id").alias("negative_id"),
            (F.col("sim_i4") / F.lit(10000.0)).alias("sim"),
            "rank",
        )
    )
