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


@register(
    "grouping_sets_revenue",
    oracle="""
    WITH j AS (
      SELECT n.n_name AS n_name,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT COALESCE(n_name, 'ALL') AS nation,
           COALESCE(CAST(o_year AS VARCHAR), 'ALL') AS order_year,
           CAST(GROUPING(n_name, o_year) AS BIGINT) AS gid,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM j GROUP BY CUBE(n_name, o_year)
    """,
    doc="Multi-level OLAP aggregate: revenue by (nation, year), "
    "(nation), (year), and grand total in ONE pass via CUBE — Spark "
    "expands the grouping sets inside a single shuffle (each input "
    "row contributes to all 4 grouping-set partials map-side) instead "
    "of a union of 4 scans. grouping_id() disambiguates rolled-up "
    "NULLs from data NULLs; revenue stays in integer cents so every "
    "level is partial-aggregation-order exact. At 100 TB a cube over "
    "k low-cardinality dims costs one scan + one shuffle of "
    "2^k-expanded partials — the standard dashboard-rollup shape.",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.round(F.col("o_totalprice") * 100).cast(D38).alias("cents"),
        )
    )
    return (
        j.cube("n_name", "o_year")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias(
                "order_year"
            ),
            "gid",
            "revenue_cents",
            "n_orders",
        )
    )


@register(
    "ohlc_hourly",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, value,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             (epoch_us(ts) - epoch_us(date_trunc('hour', ts))) * 1000000
               + event_id AS ordk
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
    )
    SELECT event_type, hour,
           arg_min(value, ordk) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ordk) AS close,
           CAST(SUM(cents) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM e GROUP BY event_type, hour
    """,
    doc="OHLC time-series downsampling: per (event_type, hour) candle "
    "with open/close = value at the first/last (ts, event_id) — "
    "min_by/max_by over a struct ordering key, so ties are "
    "deterministic — high/low = plain min/max, volume in integer "
    "cents. The canonical market-data resample (the reference's "
    "hourly price/volume views are this shape over swaps, "
    "src/dao.ts:845-933) as ONE hash aggregate: no window, no sort, "
    "no self-join — at 100 TB it is a single map-side-combined "
    "shuffle on (series, bucket). The Spark kernel orders by a STRUCT "
    "(offset-in-hour micros, event_id) — exact for any event_id; only "
    "this DuckDB oracle folds the pair into one BIGINT (arg_min there "
    "cannot order by a struct), collision-free below event_id 1e6 "
    "(test corpora max 1e5).",
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the candle algebra lives in operators/timeseries.py — ONE
    # definition shared with the streaming incremental view
    # (streaming/ohlc.py), whose equivalence tests pin
    # incremental == this batch recompute
    from ..operators.timeseries import ohlc_candles

    return ohlc_candles(load(spark, sf_dir, "events"))


# --- truncated dyadic EWMA ------------------------------------------------
#: alpha = 1/2 decay, truncated at EWMA_K lags: weight 2^(EWMA_K - d)
#: for distance d makes every weight a power of two, so numerator and
#: denominator are EXACT BIGINTs on both engines (no float recursion —
#: the classic EWMA recurrence is order-dependent in float and cannot
#: be value-hash-checked; the truncated dyadic form is the operator's
#: exact, distributable definition, with the first EWMA_K rows per
#: series using their available prefix)
EWMA_K = 20


@register(
    "ewma_hourly_close",
    oracle=f"""
    WITH e AS (
      SELECT event_type, ts, event_id, date_trunc('hour', ts) AS hour,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
    ),
    w AS (
      SELECT cur.event_type, cur.hour, cur.ts, cur.event_id,
             CAST(SUM(prev.cents *
                      CAST(POWER(CAST(2 AS DOUBLE),
                                 {EWMA_K} - (cur.rn - prev.rn)) AS BIGINT))
                  AS BIGINT) AS num,
             CAST(SUM(CAST(POWER(CAST(2 AS DOUBLE),
                                 {EWMA_K} - (cur.rn - prev.rn)) AS BIGINT))
                  AS BIGINT) AS den
      FROM e cur JOIN e prev
        ON prev.event_type = cur.event_type
       AND prev.rn BETWEEN cur.rn - {EWMA_K} AND cur.rn
      GROUP BY cur.event_type, cur.hour, cur.ts, cur.event_id
    )
    SELECT event_type, hour,
           arg_max(CAST(FLOOR(1000000 * (CAST(num AS DOUBLE)
                                         / CAST(den AS DOUBLE)) + 0.5) AS BIGINT),
                   (epoch_us(ts) - epoch_us(hour)) * 1000000 + event_id)
             AS close_ewma_micro,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM w GROUP BY event_type, hour
    """,
    doc="Exponentially-weighted moving average, hourly closing value "
    "per event_type: alpha=1/2 EWMA over the last 20 ticks (truncated "
    "dyadic form — every weight a power of two, so numerator and "
    "denominator sum EXACTLY as BIGINTs; the float recurrence is "
    "order-dependent and unverifiable). The lag join is BANDED: each "
    "row joins only its own and the previous rn-band of its series "
    "(bounded 2K candidates per row, never a per-key cross product), "
    "the same interval-banding that keeps range joins linear at "
    "100 TB. Per-hour close picked by max_by over the (offset, "
    "event_id) struct key on Spark; the oracle folds it to BIGINT "
    "(valid under 1e6 test ids).",
)
def ewma_hourly_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    e = (
        ev.filter(
            F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            "event_type",
            "ts",
            "event_id",
            F.date_trunc("hour", "ts").alias("hour"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy("ts", "event_id")
            ),
        )
    )
    # banded self-join: current row explodes into (its band, next band)
    # so a prev row in band b matches every cur row within K rows ahead
    cur = e.select(
        F.col("event_type"),
        F.col("hour"),
        F.col("ts"),
        F.col("event_id"),
        F.col("rn"),
        F.explode(
            F.array(
                (F.col("rn") / EWMA_K).cast("bigint"),
                (F.col("rn") / EWMA_K).cast("bigint") - 1,
            )
        ).alias("band"),
    )
    prev = e.select(
        F.col("event_type").alias("p_type"),
        F.col("rn").alias("p_rn"),
        F.col("cents").alias("p_cents"),
        (F.col("rn") / EWMA_K).cast("bigint").alias("p_band"),
    )
    weight = F.pow(F.lit(2.0), F.lit(EWMA_K) - (F.col("rn") - F.col("p_rn"))).cast(
        "bigint"
    )
    joined = (
        cur.join(
            prev,
            (F.col("p_type") == F.col("event_type"))
            & (F.col("p_band") == F.col("band"))
            & (F.col("p_rn") >= F.col("rn") - EWMA_K)
            & (F.col("p_rn") <= F.col("rn")),
        )
        .groupBy("event_type", "hour", "ts", "event_id")
        .agg(
            F.sum(F.col("p_cents") * weight).cast("bigint").alias("num"),
            F.sum(weight).cast("bigint").alias("den"),
        )
    )
    # FLOOR(x + 0.5), not round(): the dyadic den makes exact .5
    # quotients REACHABLE, and Spark/DuckDB round() halfway rules
    # differ per type (ADVICE r7 — same idiom as decontamination_ngram)
    ewma_micro = F.floor(
        F.lit(1000000)
        * (F.col("num").cast("double") / F.col("den").cast("double"))
        + F.lit(0.5)
    ).cast("bigint")
    ordk = F.struct(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("hour"))).alias("off"),
        F.col("event_id").cast("bigint").alias("eid"),
    )
    return (
        joined.select("event_type", "hour", ewma_micro.alias("em"), ordk.alias("k"))
        .groupBy("event_type", "hour")
        .agg(
            F.max_by("em", "k").alias("close_ewma_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .select("event_type", "hour", "close_ewma_micro", "n_rows")
    )
