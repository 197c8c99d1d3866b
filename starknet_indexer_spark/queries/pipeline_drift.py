"""Distribution-drift monitoring: exact two-sample Kolmogorov-Smirnov
statistic of every source slice against the rest of the corpus.

A production training-data pipeline watches each ingested slice for
distribution drift — "did src7's length profile move away from the
corpus?" is the canonical data-quality alarm before a bad crawl batch
poisons a mixing schedule. The KS D statistic is the standard
nonparametric two-sample test, and it is EXACTLY computable from
integer cumulative counts: for disjoint samples A (one source) and B
(the rest), ``D = max_x |cdfA(x) - cdfB(x)|``, and multiplying out the
denominators gives ``d_num = max_x |cumA(x)*nB - cumB(x)*nA|`` — pure
integer arithmetic, value-hash reproducible, no floats anywhere.

Scale shape: the ONLY corpus-sized stage is one map-side-combined
``groupBy(source, n_chars)`` count. Everything after operates on the
(#sources x #distinct-values) grid — bounded by data semantics (length
values, label cardinalities), not corpus size. The grid is built with
a broadcast cross join of two tiny aggregates, cumulative counts are
per-source window sums over that grid, and the final argmax is a
grouped aggregate over it. No corpus-sized shuffle, sort, or second
scan. Products are computed in decimal(38,0)/HUGEINT so the counts
can be web-scale; the emitted ``d_num`` is cast to BIGINT, which holds
up to ~3e9 rows per slice (beyond that, emit the decimal directly —
``d_ppm`` is scale-free either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .registry import register

D38 = "decimal(38,0)"


@register(
    "ks_drift_by_source",
    oracle="""
    WITH cnt AS (
      -- NULL keys filtered at the load (code-review r10): a NULL
      -- source/n_chars row would zero out of the plain grid equi-join
      -- (the TVD/PSI bug) AND diverge in the cumulative window's NULL
      -- ordering (Spark NULLS FIRST vs DuckDB NULLS LAST) — and a CDF
      -- point at NULL length is meaningless anyway
      SELECT source, n_chars, COUNT(*) AS c
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
      GROUP BY 1, 2
    ),
    xs AS (
      SELECT n_chars, SUM(c) AS cg FROM cnt GROUP BY 1
    ),
    xg AS (
      SELECT n_chars,
             SUM(cg) OVER (ORDER BY n_chars
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_g
      FROM xs
    ),
    srcs AS (
      SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1
    ),
    tot AS (SELECT SUM(n_s) AS n FROM srcs),
    grid AS (
      SELECT s.source, s.n_s, x.n_chars, x.cum_g, COALESCE(c.c, 0) AS c
      FROM srcs s CROSS JOIN xg x
      LEFT JOIN cnt c ON c.source = s.source AND c.n_chars = x.n_chars
    ),
    cum AS (
      SELECT source, n_s, n_chars, cum_g,
             SUM(c) OVER (PARTITION BY source ORDER BY n_chars
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_s
      FROM grid
    ),
    diffs AS (
      SELECT source, n_s, (SELECT n FROM tot) - n_s AS n_r, n_chars,
             ABS(CAST(cum_s AS HUGEINT) * ((SELECT n FROM tot) - n_s)
                 - CAST(cum_g - cum_s AS HUGEINT) * n_s) AS d
      FROM cum
    ),
    mx AS (
      SELECT source, n_s, n_r, n_chars, d,
             MAX(d) OVER (PARTITION BY source) AS d_num
      FROM diffs
    )
    SELECT source,
           CAST(n_s AS BIGINT) AS n_source,
           CAST(n_r AS BIGINT) AS n_rest,
           CAST(d_num AS BIGINT) AS d_num,
           -- GREATEST guard: n_r = 0 (single-source corpus) makes every
           -- diff 0, so 0 // 1 = 0 rather than a division error
           CAST((d_num * 1000000) // GREATEST(CAST(n_s AS HUGEINT) * n_r, 1)
                AS BIGINT) AS d_ppm,
           CAST(MIN(n_chars) AS BIGINT) AS ks_at
    FROM mx WHERE d = d_num
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="Exact two-sample Kolmogorov-Smirnov drift monitor: for every "
    "source slice vs the REST of the corpus (disjoint samples), "
    "d_num = max_x |cum_s(x)*n_rest - cum_rest(x)*n_source| over the "
    "n_chars length distribution — the KS D statistic with "
    "denominators multiplied out, so the whole test is integer-exact "
    "and value-hash checkable (d_ppm = D in parts-per-million via "
    "truncating division; ks_at = smallest length achieving the "
    "max). One corpus-sized map-side-combined groupBy(source, "
    "n_chars); all remaining work is windows and joins on the "
    "#sources x #distinct-lengths grid, which is bounded by value "
    "semantics, not corpus size. Products in decimal(38,0)/HUGEINT.",
)
def ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL keys dropped at the load — see the oracle comment (a NULL
    # row would vanish from the equi-joined grid while still counting
    # in the totals, and NULL orders differently in the two engines'
    # cumulative windows)
    docs = (
        load(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .filter(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
    )
    # The one corpus-sized pass (map-side combined; ~sources*lengths rows out).
    cnt = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    xs = cnt.groupBy("n_chars").agg(F.sum("c").alias("cg"))
    xg = xs.select(
        "n_chars",
        F.sum("cg")
        .over(W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_g"),
    )
    srcs = cnt.groupBy("source").agg(F.sum("c").alias("n_s"))
    tot = srcs.agg(F.sum("n_s").alias("n"))
    grid = (
        srcs.crossJoin(F.broadcast(xg))
        .join(cnt, ["source", "n_chars"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    cum = grid.select(
        "source",
        "n_s",
        "n_chars",
        "cum_g",
        F.sum("c")
        .over(
            W.partitionBy("source")
            .orderBy("n_chars")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cum_s"),
    )
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        (F.col("n") - F.col("n_s")).alias("n_r"),
        "n_chars",
        F.abs(
            F.col("cum_s").cast(D38) * (F.col("n") - F.col("n_s")).cast(D38)
            - (F.col("cum_g") - F.col("cum_s")).cast(D38) * F.col("n_s").cast(D38)
        ).alias("d"),
    )
    mx = diffs.withColumn("d_num", F.max("d").over(W.partitionBy("source")))
    return (
        mx.filter(F.col("d") == F.col("d_num"))
        .groupBy(
            "source",
            F.col("n_s").cast("bigint").alias("n_source"),
            F.col("n_r").cast("bigint").alias("n_rest"),
            F.col("d_num").cast("bigint").alias("d_num"),
            F.expr(
                "CAST((d_num * 1000000) div greatest("
                "CAST(n_s AS decimal(38,0)) * n_r, CAST(1 AS decimal(38,0))"
                ") AS BIGINT)"
            ).alias("d_ppm"),
        )
        .agg(F.min("n_chars").cast("bigint").alias("ks_at"))
    )


@register(
    "tvd_drift_by_source",
    oracle="""
    WITH cnt AS (
      SELECT source, lang, COUNT(*) AS c
      FROM documents GROUP BY 1, 2
    ),
    langs AS (SELECT lang, SUM(c) AS cg FROM cnt GROUP BY 1),
    srcs AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
    tot AS (SELECT SUM(n_s) AS n FROM srcs),
    grid AS (
      SELECT s.source, s.n_s, l.lang, l.cg, COALESCE(c.c, 0) AS c
      FROM srcs s CROSS JOIN langs l
      LEFT JOIN cnt c ON c.source IS NOT DISTINCT FROM s.source
                     AND c.lang IS NOT DISTINCT FROM l.lang
    ),
    terms AS (
      SELECT source, n_s, (SELECT n FROM tot) - n_s AS n_r,
             ABS(CAST(c AS HUGEINT) * ((SELECT n FROM tot) - n_s)
                 - CAST(cg - c AS HUGEINT) * n_s) AS t
      FROM grid
    )
    SELECT source,
           CAST(n_s AS BIGINT) AS n_source,
           CAST(n_r AS BIGINT) AS n_rest,
           CAST(SUM(t) AS BIGINT) AS tvd_num,
           -- GREATEST guard: n_r = 0 => every term is 0, so 0 // 1 = 0
           CAST((SUM(t) * 1000000)
                // GREATEST(2 * CAST(n_s AS HUGEINT) * n_r, 1) AS BIGINT)
             AS tvd_ppm
    FROM terms
    GROUP BY source, n_s, n_r
    """,
    doc="Categorical-distribution drift monitor: exact total variation "
    "distance of every source slice's language mix vs the rest of the "
    "corpus — TVD = (1/2) sum_x |p_s(x) - p_rest(x)|, with "
    "denominators multiplied out (tvd_num = sum_x |c_s*n_rest - "
    "c_rest*n_source|, tvd_ppm via truncating division) so the whole "
    "statistic is integer arithmetic, the categorical complement to "
    "ks_drift_by_source's continuous CDF test. One corpus-sized "
    "map-side-combined groupBy(source, lang); everything after lives "
    "on the sources x categories grid (broadcast cross join), bounded "
    "by category cardinality, not corpus size. HUGEINT/decimal(38,0) "
    "products; emitted BIGINTs hold to ~3e9 rows/slice.",
)
def tvd_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("source", "lang")
    cnt = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    return tvd_from_counts(cnt)


def _null_safe_grid(
    srcs: DataFrame, langs: DataFrame, cnt: DataFrame
) -> DataFrame:
    """sources x categories grid with each cell's count, zero-filled.

    The cell join is NULL-SAFE on (source, lang): a NULL lang category
    appears in the langs dimension (with its true cg), and a plain
    equi-join would coalesce its per-source cells to c=0 — excluding
    each source's own NULL-lang mass from p_s while still counting it
    in the rest, silently skewing the statistic if NULL langs ever
    enter the corpus. The oracles mirror with IS NOT DISTINCT FROM."""
    g = srcs.crossJoin(F.broadcast(langs))
    return (
        g.alias("g")
        .join(
            cnt.alias("cc"),
            F.col("g.source").eqNullSafe(F.col("cc.source"))
            & F.col("g.lang").eqNullSafe(F.col("cc.lang")),
            "left",
        )
        .select("g.*", F.coalesce(F.col("cc.c"), F.lit(0)).alias("c"))
    )


def tvd_from_counts(cnt: DataFrame) -> DataFrame:
    """TVD drift of each source vs rest-of-corpus from a (source,
    lang, c) count relation — shared by the batch query above and the
    streaming monitor (streaming/drift.py), which maintains the count
    relation incrementally and re-derives drift from it per batch."""
    langs = cnt.groupBy("lang").agg(F.sum("c").alias("cg"))
    srcs = cnt.groupBy("source").agg(F.sum("c").alias("n_s"))
    tot = srcs.agg(F.sum("n_s").alias("n"))
    grid = (
        _null_safe_grid(srcs, langs, cnt)
        .crossJoin(F.broadcast(tot))
    )
    term = F.abs(
        F.col("c").cast(D38) * (F.col("n") - F.col("n_s")).cast(D38)
        - (F.col("cg") - F.col("c")).cast(D38) * F.col("n_s").cast(D38)
    )
    return (
        grid.groupBy(
            "source",
            F.col("n_s").cast("bigint").alias("n_source"),
            (F.col("n") - F.col("n_s")).cast("bigint").alias("n_rest"),
        )
        .agg(F.sum(term).alias("tvd"))
        .select(
            "source",
            "n_source",
            "n_rest",
            F.col("tvd").cast("bigint").alias("tvd_num"),
            F.expr(
                "CAST((tvd * 1000000) div greatest(CAST(2 AS decimal(38,0))"
                " * n_source * n_rest, CAST(1 AS decimal(38,0))) AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )


#: industry alert threshold: PSI > 0.2 = major population shift
PSI_ALERT_MICRO = 200_000


@register(
    "psi_drift_by_source",
    oracle=f"""
    WITH cnt AS (
      SELECT source, lang, COUNT(*) AS c
      FROM documents GROUP BY 1, 2
    ),
    langs AS (SELECT lang, SUM(c) AS cg FROM cnt GROUP BY 1),
    srcs AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
    k AS (SELECT COUNT(*) AS n_cat FROM langs),
    tot AS (SELECT SUM(n_s) AS n FROM srcs),
    grid AS (
      SELECT s.source, s.n_s, l.lang, l.cg, COALESCE(c.c, 0) AS c,
             (SELECT n FROM tot) - s.n_s AS n_r,
             (SELECT n_cat FROM k) AS n_cat
      FROM srcs s CROSS JOIN langs l
      LEFT JOIN cnt c ON c.source IS NOT DISTINCT FROM s.source
                     AND c.lang IS NOT DISTINCT FROM l.lang
    ),
    -- Laplace-smoothed category shares: p_s = (c+1)/(n_s+K),
    -- p_r = (cg-c+1)/(n_r+K) — exact-integer numerators/denominators,
    -- each share ONE IEEE division, the log ratio ONE division of two
    -- IEEE products; per-term micro-nat flooring before the sum makes
    -- the statistic an order-invariant BIGINT
    terms AS (
      SELECT source, n_s, n_r,
             CAST(FLOOR(1000000.0 *
               (CAST(c + 1 AS DOUBLE) / CAST(n_s + n_cat AS DOUBLE)
                - CAST(cg - c + 1 AS DOUBLE) / CAST(n_r + n_cat AS DOUBLE))
               * LN((CAST(c + 1 AS DOUBLE) * CAST(n_r + n_cat AS DOUBLE))
                    / (CAST(cg - c + 1 AS DOUBLE) * CAST(n_s + n_cat AS DOUBLE)))
               + 0.5) AS BIGINT) AS t
      FROM grid
    )
    SELECT source,
           CAST(n_s AS BIGINT) AS n_source,
           CAST(n_r AS BIGINT) AS n_rest,
           CAST(SUM(t) AS BIGINT) AS psi_micro,
           CAST(SUM(t) >= {PSI_ALERT_MICRO} AS BIGINT) AS alert
    FROM terms GROUP BY source, n_s, n_r
    """,
    doc="Population Stability Index drift monitor: "
    "PSI = sum_x (p_s(x) - p_rest(x)) * ln(p_s(x)/p_rest(x)) of every "
    "source slice's language mix vs the rest — the metric production "
    "ML monitoring dashboards standardize on (alert at PSI > 0.2), "
    "completing the drift family next to the exact-integer KS (CDF "
    "test) and TVD (L1 test). Zero cells take Laplace smoothing "
    "((c+1)/(n+K), the convention that keeps PSI finite). Exactness: "
    "every share is one IEEE division of exact integers, the log "
    "ratio one division of two IEEE products, and each (nonnegative) "
    "term floors to micro-nats BEFORE the sum — order-invariant "
    "BIGINTs on both engines. Scale shape: identical to TVD — one "
    "corpus-sized map-side-combined groupBy(source, lang); everything "
    "after lives on the sources x categories grid.",
)
def psi_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("source", "lang")
    cnt = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    return psi_from_counts(cnt)


def psi_from_counts(cnt: DataFrame) -> DataFrame:
    """PSI drift of each source vs rest from a (source, lang, c) count
    relation — the same shared-sufficient-statistic shape as
    tvd_from_counts, so the streaming drift monitor can derive it from
    its maintained count state."""
    langs = cnt.groupBy("lang").agg(F.sum("c").alias("cg"))
    srcs = cnt.groupBy("source").agg(F.sum("c").alias("n_s"))
    k = langs.agg(F.count(F.lit(1)).alias("n_cat"))
    tot = srcs.agg(F.sum("n_s").alias("n"))
    grid = (
        _null_safe_grid(srcs, langs, cnt)
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(k))
        .withColumn("n_r", F.col("n") - F.col("n_s"))
    )
    p_s = (F.col("c") + 1).cast("double") / (F.col("n_s") + F.col("n_cat")).cast(
        "double"
    )
    p_r = (F.col("cg") - F.col("c") + 1).cast("double") / (
        F.col("n_r") + F.col("n_cat")
    ).cast("double")
    ratio = (
        (F.col("c") + 1).cast("double") * (F.col("n_r") + F.col("n_cat")).cast("double")
    ) / (
        (F.col("cg") - F.col("c") + 1).cast("double")
        * (F.col("n_s") + F.col("n_cat")).cast("double")
    )
    term = F.floor(F.lit(1000000.0) * (p_s - p_r) * F.log(ratio) + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        grid.groupBy(
            "source",
            F.col("n_s").cast("bigint").alias("n_source"),
            F.col("n_r").cast("bigint").alias("n_rest"),
        )
        .agg(F.sum(term).cast("bigint").alias("psi_micro"))
        .withColumn(
            "alert", (F.col("psi_micro") >= PSI_ALERT_MICRO).cast("bigint")
        )
    )
