"""K-means clustering over embedding vectors (Lloyd's algorithm).

Training-data-pipeline surface: corpus clustering for semantic dedup,
cluster-balanced sampling, and IVF centroid training (the
``operators.similarity.ivf_assign`` docstring's "real deployment
trains centroids with k-means" — this is that trainer).

Exactness design — why an *iterative* algorithm can still carry a
value-hash DuckDB oracle:

- Vectors are quantized once to integer micro-units
  (``round(x * 1e6)`` via the engine-portable FLOOR(x*1e6+0.5)), so
  every distance is an exact BIGINT sum of squared integer diffs —
  no float addition anywhere in the hot loop, hence no
  summation-order nondeterminism between Spark partitions or between
  Spark and DuckDB.
- Centroid updates are integer floor-means (FLOOR(sum/count) in
  double over BIGINT sums — exact while |sum| < 2^53, i.e. up to
  ~9e9 unit-scale vectors per cluster; beyond that shard the mean).
- Argmin ties break on the smaller centroid id, totally ordering the
  assignment.

Scale shape: the assignment pass is MAP-ONLY — centroids collapse to
one broadcast array row and the argmin is an array fold inside the
scan (same trick as ``ivf_assign(rank_limit=1)``); the corpus is never
shuffled to assign it. The update pass shuffles (cluster, component)
partial sums with map-side combine — K*dim result rows regardless of
corpus size. At 100 TB the standard play is mini-batch k-means (fit on
a sample, assign the full corpus with the final map-only pass); both
passes here are that building block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One unit = 1e-6 of the raw component value.
QUANT_SCALE = 1_000_000


def quantize_expr(vec: Column) -> Column:
    """float array -> BIGINT micro-unit array, identical on both
    engines (FLOOR(x*1e6+0.5) — round() half-way behavior differs
    between Spark and DuckDB, floor+0.5 does not)."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * QUANT_SCALE + F.lit(0.5)).cast("bigint"),
    )


def dist2_expr(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between two BIGINT arrays — an
    integer fold, no floats."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Map-only nearest-centroid assignment. ``vecs``: (vec_id, qv);
    ``cents``: (cluster_id, cv). Returns (vec_id, qv, cluster, d2).
    Ties -> smallest cluster_id (struct-max over (-d2, -id))."""
    cent_arr = cents.agg(F.collect_list(F.struct("cluster_id", "cv")).alias("cs"))
    best = F.array_max(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                (-dist2_expr(F.col("qv"), c["cv"])).alias("neg_d"),
                (-c["cluster_id"]).alias("neg_id"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(cent_arr))
        .withColumn("best", best)
        .select(
            "vec_id",
            "qv",
            (-F.col("best.neg_id")).alias("cluster"),
            (-F.col("best.neg_d")).alias("d2"),
        )
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """Per-cluster integer floor-mean centroids from an assignment.
    posexplode -> (cluster, pos) partial sums (map-side combine; the
    shuffled relation is K*dim rows) -> reassemble ordered arrays.
    Clusters that lost all members simply drop out (standard k-means;
    deterministic on both engines)."""
    comp = assigned.select("cluster", F.posexplode("qv").alias("pos", "x"))
    means = comp.groupBy("cluster", "pos").agg(
        F.floor(F.sum("x").cast("double") / F.count("*")).cast("bigint").alias("m")
    )
    return (
        means.groupBy("cluster")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
        .select(F.col("cluster").alias("cluster_id"), "cv")
    )


def kmeans_centroids(vecs: DataFrame, init_cents: DataFrame, n_updates: int) -> DataFrame:
    """The trained centroid relation (cluster_id, cv) after
    ``n_updates`` Lloyd rounds.

    Each round's centroids are lazily localCheckpoint'ed so the plan
    does NOT nest one full assign+update subtree per round —
    unbounded lineage makes Catalyst analysis superlinear in
    n_updates (the same truncation connected_components applies per
    iteration, operators/graph.py). Lazy (eager=False) keeps query
    construction free of jobs; the checkpoint materializes on first
    execution."""
    cents = init_cents
    for _ in range(n_updates):
        cents = kmeans_update(kmeans_assign(vecs, cents)).localCheckpoint(eager=False)
    return cents


def kmeans(vecs: DataFrame, init_cents: DataFrame, n_updates: int) -> DataFrame:
    """Lloyd's algorithm: ``n_updates`` assign+update rounds followed
    by a final assignment. Returns (vec_id, qv, cluster, d2)."""
    return kmeans_assign(vecs, kmeans_centroids(vecs, init_cents, n_updates))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the billion-scale ANN compression path
# ---------------------------------------------------------------------------


def pq_codebooks(
    vecs: DataFrame, dim: int, m_subspaces: int, k: int, n_updates: int
) -> list[DataFrame]:
    """One k-means codebook per subspace: split each quantized vector
    into ``m_subspaces`` contiguous slices and run the integer-exact
    Lloyd trainer on each (init = the first ``k`` vectors' slices,
    deterministic). Returns the list of (cluster_id, cv) relations.

    At 100 TB the trainer runs on a sample (mini-batch k-means, like
    the full-vector case); each codebook is k rows of dim/M ints —
    trivially broadcastable."""
    sub_len = dim // m_subspaces
    books = []
    for m in range(m_subspaces):
        sub = vecs.select(
            "vec_id", F.slice("qv", m * sub_len + 1, sub_len).alias("qv")
        )
        init = sub.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cluster_id"), F.col("qv").alias("cv")
        )
        books.append(kmeans_centroids(sub, init, n_updates))
    return books


def attach_codebook_broadcasts(
    df: DataFrame, books: list[DataFrame], prefix: str = "__cs_"
) -> DataFrame:
    """Cross-join one broadcast array<struct(cluster_id, cv)> row per
    codebook onto ``df`` (columns ``{prefix}{m}``). Books come out of
    ``kmeans_centroids`` lazily checkpointed, so attaching them to
    several consumers does NOT retrain — the materialized RDD is
    shared."""
    out = df
    for m, cents in enumerate(books):
        arr = cents.agg(
            F.collect_list(F.struct("cluster_id", "cv")).alias(f"{prefix}{m}")
        )
        out = out.crossJoin(F.broadcast(arr))
    return out


def pq_encode(
    vecs: DataFrame,
    books: list[DataFrame],
    dim: int,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as M codebook indices (the PQ compressed
    form: dim floats -> M small ints, e.g. 64x4B -> 4x1B) plus the
    exact total quantization error.

    MAP-ONLY: every codebook collapses to one broadcast array row and
    each code is an argmin fold over the vector's slice inside the
    scan — the corpus is never shuffled to encode it, the same shape
    as ``kmeans_assign``. Ties break to the smaller code id, totally
    ordering the output (hash-checkable).

    ``passthrough`` (r12): extra ``vecs`` columns carried through to
    the output unchanged. The IVF-PQ search pipeline needs each code
    row's coarse ``cluster``; re-attaching it afterwards was a
    corpus x corpus sort-merge join on vec_id — carrying it through
    the map-only encode removes that shuffle outright (guide §2.4)."""
    m_subspaces = len(books)
    sub_len = dim // m_subspaces
    out = attach_codebook_broadcasts(vecs, books)

    def _scorer(s: Column):
        # closure factory: the lambda must be single-arg (a 2-arg
        # Python lambda — even via a default — is treated by PySpark
        # as the (element, index) form and binds the index instead)
        return lambda c: F.struct(
            (-dist2_expr(s, c["cv"])).alias("neg_d"),
            (-c["cluster_id"]).alias("neg_id"),
        )

    for m in range(m_subspaces):
        sub = F.slice(F.col("qv"), m * sub_len + 1, sub_len)
        best = F.array_max(F.transform(F.col(f"__cs_{m}"), _scorer(sub)))
        out = out.withColumn(f"__best_{m}", best)
    err = None
    cols = [F.col("vec_id"), *[F.col(c) for c in passthrough]]
    for m in range(m_subspaces):
        cols.append(
            (-F.col(f"__best_{m}.neg_id")).cast("int").alias(f"code_{m}")
        )
        e = -F.col(f"__best_{m}.neg_d")
        err = e if err is None else err + e
    return out.select(*cols, err.cast("bigint").alias("err"))


def pq_reconstruct_expr(books_cols: list[str], code_cols: list[str]):
    """Column expr: concatenate each code's codebook entry back into a
    full-dim integer vector (the decoded form ADC distances are
    computed against). ``books_cols`` name broadcast array<struct
    (cluster_id, cv)> columns; lookup is a map build + element_at."""
    parts = []
    for bc, cc in zip(books_cols, code_cols):
        m = F.map_from_entries(
            F.transform(
                F.col(bc), lambda c: F.struct(c["cluster_id"], c["cv"])
            )
        )
        parts.append(F.element_at(m, F.col(cc).cast("long")))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out
