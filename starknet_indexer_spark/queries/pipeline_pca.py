"""Exact between-class PCA: the dominant principal direction of the
class-centroid (between-class) scatter matrix, by integer matrix
squaring.

Supervised dimensionality reduction for embedding columns — the first
discriminant-style axis used for class-aware projection, cluster
separation scoring, and picking the split dimension for a labeled
corpus. ``random_projection_reduce`` covers the oblivious JL path;
this is the data-dependent one, with the full value-hash oracle float
eigensolvers cannot give.

Honesty note on WHY between-class + squaring (and not plain power
iteration on the full covariance): the synthetic embedding corpus is
nearly isotropic — the full scatter's top-two eigenvalue ratio is
1.01–1.07 across SFs, so a few power-iteration rounds provably cannot
converge (measured cos ≈ 0.18 after 3 rounds at sf0.001, ≈ 0.00 at
sf0.1 where the all-ones start is almost orthogonal to the top
eigenvector). The between-class scatter B = sum_c u_c u_c^T is
rank-#classes with a real gap, and REPEATED SQUARING raises the
eigenvalue ratio to the 64th power (B^64 after 6 squarings), which
converges from any start with nonzero overlap: measured cosine vs
numpy's eigensolver = 1.000000 at sf0.001/0.01/0.1
(tests/test_pipeline_ml.py pins > 0.999).

Exactness design (same family as ``kmeans_cluster_assign`` /
``graph_pagerank``):

- Components quantized once to 1e-4 units via the engine-portable
  ``FLOOR(x*1e4 + 0.5)``.
- Mean-centered class directions without rationals:
  ``u_c = N*s_c - n_c*S`` (s_c/n_c = class sum/count, S/N = global)
  — an integer vector parallel to ``N*n_c*(centroid_c - mean)``.
- Every relation is renormalized to |entry| <= 1e6 by truncating
  integral division (both engines truncate toward zero), making ALL
  magnitude bounds corpus-size-independent: a squaring's raw entries
  are <= d*(1e6)^2*1e6 = 6.4e19, far inside decimal(38,0)/HUGEINT.
- Final loading = row sums of B^64 (the matvec with the all-ones
  start), renormalized to <= 1e6 and emitted as BIGINT.

Scale shape: the ONLY corpus-sized stage is one posexplode +
map-side-combined groupBy(label, dim) — #classes * d = 640 result
rows regardless of corpus size. The outer product, the 6 squarings,
and the final row-sum all operate on the d^2-row (4096) relation;
each squaring is lazily localCheckpointed so the self-join does not
double the plan per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

PCA_QUANT = 10_000  # vector components -> 1e-4 units
PCA_NORM = 1_000_000  # renormalized |entry| target magnitude
PCA_SQUARINGS = 6  # B^(2^6) = B^64
D38 = "decimal(38,0)"


def _oracle() -> str:
    rounds = []
    for r in range(1, PCA_SQUARINGS + 1):
        rounds.append(
            f"""
    s{r} AS MATERIALIZED (
      SELECT a.i AS i, b.j AS j, SUM(a.a * b.a) AS p
      FROM a{r - 1} a JOIN a{r - 1} b ON a.j = b.i
      GROUP BY 1, 2
    ),
    x{r} AS (SELECT MAX(ABS(p)) AS mx FROM s{r}),
    a{r} AS MATERIALIZED (
      SELECT i, j,
             (p * {PCA_NORM}) // GREATEST((SELECT mx FROM x{r}), 1) AS a
      FROM s{r}
    )"""
        )
    return f"""
    WITH q AS (
      SELECT label,
             list_transform(
               embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {PCA_QUANT} + 0.5) AS BIGINT)
             ) AS qv
      FROM embeddings
    ),
    cs AS (
      SELECT label, t.i AS i, SUM(qv[t.i]) AS s, COUNT(*) AS nc
      FROM q, UNNEST(range(1, len(qv) + 1)) AS t(i)
      GROUP BY 1, 2
    ),
    gs AS (SELECT i, SUM(s) AS gsum, SUM(nc) AS n FROM cs GROUP BY i),
    u AS (
      SELECT cs.label, cs.i,
             CAST(g.n AS HUGEINT) * cs.s - CAST(cs.nc AS HUGEINT) * g.gsum AS u
      FROM cs JOIN gs g ON g.i = cs.i
    ),
    umx AS (SELECT label, MAX(ABS(u)) AS mx FROM u GROUP BY label),
    un AS MATERIALIZED (
      SELECT u.label, u.i,
             (u.u * {PCA_NORM}) // GREATEST(m.mx, 1) AS u
      FROM u JOIN umx m ON m.label = u.label
    ),
    b0 AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j, SUM(a.u * b.u) AS p
      FROM un a JOIN un b ON a.label = b.label
      GROUP BY 1, 2
    ),
    x0 AS (SELECT MAX(ABS(p)) AS mx FROM b0),
    a0 AS MATERIALIZED (
      SELECT i, j,
             (p * {PCA_NORM}) // GREATEST((SELECT mx FROM x0), 1) AS a
      FROM b0
    ),
    {",".join(rounds)},
    v AS (SELECT i, SUM(a) AS v FROM a{PCA_SQUARINGS} GROUP BY i),
    vx AS (SELECT MAX(ABS(v)) AS mx FROM v)
    SELECT CAST(i AS BIGINT) AS dim,
           CAST((v * {PCA_NORM}) // GREATEST((SELECT mx FROM vx), 1) AS BIGINT)
             AS loading
    FROM v
    """


# -- single-batch matrix kernel (optimization round 12) --------------
#
# The relation this query iterates on is d x d = 4096 entries
# REGARDLESS of corpus size (every magnitude renormalizes to <= 1e6 —
# see module docstring), so after the one corpus-sized aggregation the
# entire chain (per-class renorm -> outer product -> 6 squarings ->
# row sums) runs in ONE Arrow batch on one executor task (guide §2.4:
# remove shuffles outright — the former plan paid ~20 tiny stages, 6 x
# (self-join + groupBy + renorm agg + crossJoin broadcast), all fixed
# scheduling overhead at any data size; guide §4.2: hand the whole
# bounded batch to vectorized native code). Arithmetic is IDENTICAL
# and exact:
#
# - the unbounded-magnitude values (u components ~ N^2 * 1e4 * d, and
#   every renorm dividend x * 1e6) use arbitrary-precision Python
#   ints — same integers the decimal(38,0) path produced;
# - `div`'s truncation-toward-zero is _tdiv below (Python // floors,
#   so negative dividends are sign-split);
# - the renorm-bounded stages (squarings: |entry| <= 1e6, accumulator
#   <= d * 1e12 = 6.4e13) run as numpy int64 matmuls — exact, bound
#   corpus-size-independent;
# - the outer-product accumulator is bounded by n_classes * 1e12; the
#   kernel asserts n_classes < 9e6 loudly (the label vocabulary is a
#   class enum, orders of magnitude below that at any corpus size).


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark decimal `div`
    / DuckDB `//` semantics; Python's // floors, hence the sign split."""
    return -((-a) // b) if a < 0 else a // b


@register(
    "between_class_pca",
    oracle=_oracle(),
    doc="Dominant principal direction of the between-class scatter "
    "B = sum_c u_c u_c^T (u_c = N*s_c - n_c*S, the integer centered "
    "class directions) of the labeled embedding corpus, computed as "
    f"the row sums of B^{2 ** PCA_SQUARINGS} via {PCA_SQUARINGS} "
    "integer matrix squarings — squaring raises the eigenvalue gap "
    "to the 64th power, so the result provably matches the float "
    "eigensolver (numpy cross-check cos = 1.000000 at three SFs, "
    "pinned > 0.999 in tests) while staying value-hash exact: every "
    "relation renormalizes to |entry| <= 1e6 by truncating integral "
    "division, so all bounds are corpus-size-independent and "
    "decimal(38,0)/HUGEINT arithmetic agrees bit-for-bit. The only "
    "corpus-sized stage is one map-side-combined groupBy(label, dim) "
    "(640 rows out); the outer product, squarings, and final row-sum "
    "touch only the 4096-row matrix relation.",
)
def between_class_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("label", "embedding")
    q = emb.select(
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * PCA_QUANT + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("qv"),
    )
    # The one corpus-sized pass: class sums per dimension (1-based dim
    # to match the oracle's list indexing), map-side combined.
    cs = (
        q.select("label", F.posexplode("qv").alias("i0", "x"))
        .groupBy("label", (F.col("i0") + 1).alias("i"))
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("nc"))
    )
    gs = cs.groupBy("i").agg(
        F.sum("s").alias("gsum"), F.sum("nc").alias("n")
    )
    u = cs.join(gs, "i").select(
        "label",
        "i",
        (
            F.col("n").cast(D38) * F.col("s").cast(D38)
            - F.col("nc").cast(D38) * F.col("gsum").cast(D38)
        ).alias("u"),
    )
    # One Arrow batch holds the full (label, i, u) relation — class
    # count x d rows, corpus-size-independent — and the kernel runs
    # the entire renorm/outer-product/squaring chain in native code
    # (see kernel note above). coalesce(1): the relation must arrive
    # as one group; it is bounded, this is not a corpus coalesce.
    def kernel(batches):
        import numpy as np
        import pandas as pd

        parts = [b for b in batches]
        pdf = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(columns=["label", "i", "u"])
        )
        if pdf.empty:
            return  # empty corpus: 0 rows, as before
        # per-class renorm in arbitrary-precision ints (u and the
        # renorm dividend are the unbounded-magnitude values)
        by_label: dict = {}
        for lbl, i, uu in zip(pdf["label"], pdf["i"], pdf["u"]):
            by_label.setdefault(lbl, {})[int(i)] = int(uu)
        dims = sorted(next(iter(by_label.values())))
        d = len(dims)
        if len(by_label) >= 9_000_000:
            raise ValueError(
                "between_class_pca kernel: class count "
                f"{len(by_label)} exceeds the int64 outer-product bound"
            )
        rows = []
        for lbl in by_label:
            vec = [by_label[lbl][i] for i in dims]
            mx = max(max(abs(x) for x in vec), 1)
            rows.append([_tdiv(x * PCA_NORM, mx) for x in vec])
        U = np.array(rows, dtype=np.int64)  # |entry| <= 1e6
        B = U.T @ U  # <= n_classes * 1e12 (guarded above)

        def renorm(M: np.ndarray) -> np.ndarray:
            mx = max(int(np.abs(M).max()), 1)
            flat = [_tdiv(int(x) * PCA_NORM, mx) for x in M.ravel()]
            return np.array(flat, dtype=np.int64).reshape(M.shape)

        M = renorm(B)
        for _ in range(PCA_SQUARINGS):
            # |entry| <= 1e6 -> accumulator <= d * 1e12 = 6.4e13
            M = renorm(M @ M)
        v = renorm(M.sum(axis=1).reshape(1, -1)).ravel()
        yield pd.DataFrame(
            {"dim": np.array(dims, dtype=np.int64), "loading": v}
        )

    return u.select("label", "i", "u").coalesce(1).mapInPandas(
        kernel, "dim bigint, loading bigint"
    )
