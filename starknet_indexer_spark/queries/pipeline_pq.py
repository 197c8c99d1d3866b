"""Product-quantization (PQ) queries over the embeddings table.

PQ is the canonical billion-scale ANN compression: split each d-dim
vector into M contiguous subspaces, train a small k-means codebook per
subspace, and store each vector as M code indices (64 floats -> 4
bytes here). Search computes asymmetric distances (ADC): the exact
query vector against each candidate's *reconstructed* (decoded)
vector. Combined with IVF bucketing (`operators/similarity.py`) this
is the IVF-PQ design every large vector store runs.

Exactness: vectors are integer-quantized (operators/clustering.py
QUANT_SCALE) so codebook training, encoding, reconstruction, and ADC
distances are all exact BIGINT arithmetic — both queries carry full
value-hash DuckDB oracles despite PQ being an approximation of the
underlying geometry (the *approximation itself* is deterministic).

Scale shape: codebook training is the k-means trainer (sample-sized at
deployment); ENCODING IS MAP-ONLY (M broadcast codebooks, argmin folds
inside the scan — the corpus is never shuffled to encode it); ADC
search broadcasts the query batch and reconstructs candidates on the
fly (at deployment the per-query K x M distance table replaces
reconstruction — same arithmetic, O(M) per candidate instead of
O(dim); the plan shape is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.clustering import (
    QUANT_SCALE,
    dist2_expr,
    pq_codebooks,
    pq_encode,
    pq_reconstruct_expr,
    quantize_expr,
)
from .registry import register

PQ_DIM = 64
PQ_M = 4          # subspaces of 16 dims each
PQ_K = 16         # 16 codes per subspace -> 4 x 4-bit codes per vector
PQ_UPDATES = 1    # Lloyd rounds per codebook (oracle-compact; scale up freely)
PQ_N_QUERIES = 10
PQ_TOP_K = 5

_SUB_LEN = PQ_DIM // PQ_M


def _sub_d2(dim: int, v: str = "v", c: str = "c") -> str:
    return (
        f"CAST(list_sum([({v}.qv[k] - {c}.cv[k]) * ({v}.qv[k] - {c}.cv[k]) "
        f"for k in range(1, {dim + 1})]) AS BIGINT)"
    )


def _assign_cte(name: str, src: str, cents: str, dim: int) -> str:
    return f"""
    {name} AS (
      SELECT vec_id, qv, cluster, d2 FROM (
        SELECT vec_id, qv, cluster, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster) AS rn
        FROM (
          SELECT v.vec_id, v.qv, c.cluster_id AS cluster, {_sub_d2(dim)} AS d2
          FROM {src} v, {cents} c
        )
      ) WHERE rn = 1
    )"""


def _update_cte(name: str, assigned: str, dim: int) -> str:
    return f"""
    {name} AS (
      SELECT cluster AS cluster_id, list(m ORDER BY k) AS cv FROM (
        SELECT cluster, k,
               CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        FROM (SELECT cluster, UNNEST(qv) AS x,
                     UNNEST(range(1, {dim + 1})) AS k
              FROM {assigned})
        GROUP BY cluster, k
      ) GROUP BY cluster
    )"""


def _pq_cte_chain() -> str:
    """Shared WITH-body: quantized full vectors, then per subspace m a
    slice relation s{m}, PQ_UPDATES Lloyd rounds, and the final
    encoding f{m} = (vec_id, code, d2)."""
    steps = [
        f"""qvfull AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT_SCALE} + 0.5) AS BIGINT))
               AS qv
      FROM embeddings
    )"""
    ]
    for m in range(PQ_M):
        lo, hi = m * _SUB_LEN + 1, (m + 1) * _SUB_LEN
        steps.append(
            f"""
    s{m} AS (SELECT vec_id, qv[{lo}:{hi}] AS qv FROM qvfull),
    cb{m}_0 AS (
      SELECT vec_id AS cluster_id, qv AS cv FROM s{m} WHERE vec_id < {PQ_K}
    )"""
        )
        prev = f"cb{m}_0"
        for i in range(1, PQ_UPDATES + 1):
            steps.append(_assign_cte(f"as{m}_{i}", f"s{m}", prev, _SUB_LEN))
            steps.append(_update_cte(f"cb{m}_{i}", f"as{m}_{i}", _SUB_LEN))
            prev = f"cb{m}_{i}"
        steps.append(_assign_cte(f"f{m}", f"s{m}", prev, _SUB_LEN))
    return ",".join(steps)


_CODE_COLS = ", ".join(f"f{m}.cluster AS code_{m}" for m in range(PQ_M))
_ERR_SUM = " + ".join(f"f{m}.d2" for m in range(PQ_M))
_F_JOINS = "f0" + "".join(
    f" JOIN f{m} ON f0.vec_id = f{m}.vec_id" for m in range(1, PQ_M)
)


@register(
    "pq_encode_codes",
    oracle=f"""
    WITH {_pq_cte_chain()}
    SELECT f0.vec_id AS vec_id, {_CODE_COLS},
           CAST({_ERR_SUM} AS BIGINT) AS err
    FROM {_F_JOINS}
    """,
    doc=f"Product-quantization encoding (M={PQ_M} subspaces x K={PQ_K} "
    f"codes, {PQ_UPDATES} Lloyd round per codebook): each 64-dim "
    "embedding compresses to 4 code indices + the exact total "
    "quantization error. Codebook training reuses the integer-exact "
    "k-means trainer per slice; the encoding pass is MAP-ONLY (M "
    "broadcast codebooks, argmin folds inside the scan — the corpus "
    "is never shuffled to encode it). The full iterative pipeline is "
    "value-hash-checked against a DuckDB CTE-chain mirror.",
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", quantize_expr(F.col("embedding")).alias("qv"))
    books = pq_codebooks(vecs, PQ_DIM, PQ_M, PQ_K, PQ_UPDATES)
    return pq_encode(vecs, books, PQ_DIM)


@register(
    "pq_ann_adc_topk",
    oracle=f"""
    WITH {_pq_cte_chain()},
    codes AS (
      SELECT f0.vec_id AS vec_id, {_CODE_COLS} FROM {_F_JOINS}
    ),
    recon AS (
      SELECT codes.vec_id AS neighbor_id,
             cb0_{PQ_UPDATES}.cv || cb1_{PQ_UPDATES}.cv
               || cb2_{PQ_UPDATES}.cv || cb3_{PQ_UPDATES}.cv AS rv
      FROM codes
      JOIN cb0_{PQ_UPDATES} ON codes.code_0 = cb0_{PQ_UPDATES}.cluster_id
      JOIN cb1_{PQ_UPDATES} ON codes.code_1 = cb1_{PQ_UPDATES}.cluster_id
      JOIN cb2_{PQ_UPDATES} ON codes.code_2 = cb2_{PQ_UPDATES}.cluster_id
      JOIN cb3_{PQ_UPDATES} ON codes.code_3 = cb3_{PQ_UPDATES}.cluster_id
    ),
    q AS (
      SELECT vec_id AS query_id, qv FROM qvfull WHERE vec_id < {PQ_N_QUERIES}
    ),
    dists AS (
      SELECT q.query_id, r.neighbor_id,
             CAST(list_sum([(q.qv[k] - r.rv[k]) * (q.qv[k] - r.rv[k])
                            for k in range(1, {PQ_DIM + 1})]) AS BIGINT) AS d2
      FROM q, recon r WHERE q.query_id <> r.neighbor_id
    )
    SELECT query_id, neighbor_id, d2, rank FROM (
      SELECT query_id, neighbor_id, d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d2, neighbor_id) AS rank
      FROM dists
    ) WHERE rank <= {PQ_TOP_K}
    """,
    doc=f"Asymmetric-distance (ADC) top-{PQ_TOP_K} search over "
    "PQ-encoded vectors: the exact query vector scores against each "
    "candidate's reconstructed (decoded) vector — the search half of "
    "the IVF-PQ design. The query batch is broadcast, candidates "
    "reconstruct map-side from the same broadcast codebooks, and the "
    "only shuffle is the per-query top-k window. Integer-exact end "
    "to end, so the approximate search is itself hash-verified. At "
    "deployment the per-query K x M lookup table replaces "
    "reconstruction (same arithmetic, O(M) per candidate). Measured "
    "on the near-random synthetic embeddings (PQ's hardest regime): "
    "ADC@5 recall ~0.26 alone, >= 0.9 composed with an exact re-rank "
    "of the ADC top-100 shortlist — the deployment shape, pinned in "
    "tests/test_operators.py::TestProductQuantization.",
)
def pq_ann_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", quantize_expr(F.col("embedding")).alias("qv"))
    books = pq_codebooks(vecs, PQ_DIM, PQ_M, PQ_K, PQ_UPDATES)
    codes = pq_encode(vecs, books, PQ_DIM)

    enc = codes
    for m, cents in enumerate(books):
        arr = cents.agg(
            F.collect_list(F.struct("cluster_id", "cv")).alias(f"__cs_{m}")
        )
        enc = enc.crossJoin(F.broadcast(arr))
    recon = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        pq_reconstruct_expr(
            [f"__cs_{m}" for m in range(PQ_M)],
            [f"code_{m}" for m in range(PQ_M)],
        ).alias("rv"),
    )

    q = vecs.filter(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv")
    )
    dists = (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dist2_expr(F.col("qv"), F.col("rv")).alias("d2"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("d2"), F.col("neighbor_id"))
    return (
        dists.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "neighbor_id", "d2", "rank")
    )
