"""LSH-bucketed approximate nearest-neighbor search over embeddings.

Scale path for ``ann_topk_cosine`` (the brute-force baseline in
``queries.pipeline_similarity``): random-hyperplane LSH assigns every
vector a small integer bucket; the query-to-candidate join is an
equi-join on the bucket id instead of a full cross product. At 100 TB:

- bucket assignment is a projection (map-only, codegen'd fold over the
  array column) — no shuffle;
- the candidate join shuffles on ``bucket`` — with 2^n_planes buckets
  the expected bucket population is N / 2^n, tunable to executor
  memory; skewed buckets (dense regions) split with AQE skew-join;
- per-query top-k is a bounded window inside each bucket — never a
  global sort.

Recall is the standard SRP-LSH trade: vectors whose cosine similarity
is high share all n sign-bits with probability (1 - θ/π)^n. Multiple
independent tables (OR-amplification) raise recall; the operator takes
``n_planes`` and callers union tables if needed.

The hyperplanes are **deterministic literal constants** (fixed LCG,
seed in-source) embedded into both the Spark plan and the DuckDB
oracle SQL — same floats, same sequential-fold dot product, same signs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

EMBEDDING_DIM = 64
N_PLANES = 4  # 16 buckets; at sf0.01 (500 vecs) ~31 candidates/bucket


def _lcg_floats(seed: int, n: int) -> list[float]:
    """Deterministic pseudo-random floats in [-1, 1), 6 dp — literal
    constants, identical on both engines (no runtime RNG)."""
    x = seed & ((1 << 64) - 1)
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(round((x >> 33) / float(1 << 31) - 1.0, 6))
    return out


HYPERPLANES: list[list[float]] = [
    _lcg_floats(42 + 1000 * j, EMBEDDING_DIM) for j in range(N_PLANES)
]


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order double fold — matches DuckDB list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def plane_literal(j: int) -> Column:
    return F.array(*[F.lit(c) for c in HYPERPLANES[j]])


def bucket_expr(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket id: bit j set iff dot(vec, plane_j) >= 0."""
    bucket = None
    for j in range(n_planes):
        bit = (
            F.when(dot_expr(vec, plane_literal(j)) >= 0, F.lit(1 << j))
            .otherwise(F.lit(0))
            .cast("int")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def with_bucket(df: DataFrame, vec_col: str = "embedding", out: str = "bucket") -> DataFrame:
    return df.withColumn(out, bucket_expr(F.col(vec_col)))


def bucket_sql_exprs(vec_sql: str, n_planes: int = N_PLANES) -> str:
    """The identical bucket computation in DuckDB SQL (oracle side)."""
    bits = []
    for j in range(n_planes):
        plane = "[" + ", ".join(repr(c) for c in HYPERPLANES[j]) + "]::DOUBLE[]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_sql}, {plane}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bits)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

N_CENTROIDS = 16
N_PROBE = 4


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, rank_limit: int, id_col: str = "vec_id"
) -> DataFrame:
    """Rank centroids per vector by cosine and keep the top
    ``rank_limit`` (1 for list assignment, N_PROBE for query probing).
    A real deployment trains centroids with k-means; here they are a
    deterministic sample (first N_CENTROIDS vectors), which changes
    recall, not the plumbing.

    ``rank_limit == 1`` (the whole-corpus assignment pass) is genuinely
    map-only: the centroid set broadcasts as ONE array row and the
    argmax runs as an array fold inside the scan — no exchange of the
    corpus at any size. The window formulation would shuffle+sort the
    entire corpus on ``id_col`` just to pick each row's max. The
    general path (used for the tiny query-probe set) keeps the
    explode + per-vector window.

    Contract: ``emb`` has (id_col, ev, en) — vector + norm; ``centroids``
    has (centroid_id, cv, cn)."""
    if rank_limit == 1:
        cent_arr = centroids.agg(
            F.collect_list(F.struct("centroid_id", "cv", "cn")).alias("cents")
        )
        # struct-ordered max: (sim, -centroid_id) — highest sim wins,
        # ties prefer the smallest centroid id, matching the window
        # path's ORDER BY sim DESC, centroid_id
        best = F.array_max(
            F.transform(
                "cents",
                lambda c: F.struct(
                    (dot_expr(F.col("ev"), c["cv"]) / (F.col("en") * c["cn"])).alias(
                        "sim"
                    ),
                    (-c["centroid_id"]).alias("neg_id"),
                ),
            )
        )
        return (
            emb.crossJoin(F.broadcast(cent_arr))
            .withColumn("best", best)
            .select(
                id_col,
                "ev",
                "en",
                (-F.col("best.neg_id")).alias("centroid_id"),
                F.col("best.sim").alias("sim"),
                F.lit(1).alias("crank"),
            )
        )
    sim = dot_expr(F.col("ev"), F.col("cv")) / (F.col("en") * F.col("cn"))
    w = W.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select(id_col, "ev", "en", "centroid_id", sim.alias("sim"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rank_limit)
    )
