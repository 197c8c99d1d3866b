"""Exact bivariate statistics: correlation and least-squares
regression computed from integer moments.

``value_time_correlation`` (events_analytics.py) already exercises the
engines' native float corr()/covar_samp() aggregates; this module adds
the *exact* formulation — the five co-moments are summed in the
integer-cents domain (decimal(38,0) on Spark, HUGEINT on DuckDB, so
partial-aggregation order cannot perturb the result), and only the
final ratios (Pearson r, OLS slope/intercept) are evaluated in double
from identical exact operands. That exactness is what makes the query
reproducible across partitionings and cluster sizes — the property the
float version only approximates via 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

D38 = "decimal(38,0)"


@register(
    "price_quantity_regression",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM c GROUP BY l_returnflag
    ),
    d AS (
      SELECT l_returnflag, n,
             n * sxy - sx * sy AS cov_n,
             n * sxx - sx * sx AS varx_n,
             n * syy - sy * sy AS vary_n,
             sx, sy
      FROM m
    )
    SELECT l_returnflag,
           n AS n_rows,
           ROUND(CAST(cov_n AS DOUBLE)
                 / SQRT(CAST(varx_n AS DOUBLE) * CAST(vary_n AS DOUBLE)), 6) AS corr,
           ROUND(CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE) / n
                  - (CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / n)) / 100, 6) AS intercept
    FROM d
    """,
    doc="Exact bivariate statistics per return flag: Pearson "
    "correlation and least-squares slope/intercept of extended price "
    "on quantity. Instead of the engines' float corr()/regr_slope() "
    "(whose partial-aggregation order differs between Spark "
    "partitions and DuckDB), the five moments are summed exactly in "
    "the integer-cents domain (decimal(38,0) on Spark, HUGEINT on "
    "DuckDB — identical integers; headroom check: n*syy stays under "
    "1e32 even at sf10), and only the final ratios are evaluated in "
    "double from the same exact operands. One map-side-combined hash "
    "aggregate over the fact table; nothing else shuffles. The cents "
    "scaling cancels in corr and slope; the intercept divides back "
    "to dollars.",
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.select(
        "l_returnflag", x.alias("x"), y.alias("y")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(D38)).alias("sx"),
        F.sum(F.col("y").cast(D38)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(D38)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(D38)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(D38)).alias("sxy"),
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_n")
    varx_n = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("varx_n")
    vary_n = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("vary_n")
    d = m.select("l_returnflag", "n", "sx", "sy", cov_n, varx_n, vary_n)
    slope_raw = F.col("cov_n").cast("double") / F.col("varx_n").cast("double")
    return d.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.round(
            F.col("cov_n").cast("double")
            / F.sqrt(F.col("varx_n").cast("double") * F.col("vary_n").cast("double")),
            6,
        ).alias("corr"),
        F.round(slope_raw, 6).alias("slope"),
        F.round(
            (
                F.col("sy").cast("double") / F.col("n")
                - slope_raw * (F.col("sx").cast("double") / F.col("n"))
            )
            / 100,
            6,
        ).alias("intercept"),
    )
