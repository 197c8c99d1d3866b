"""Ekubo-analytics analogues over the synthetic ``events`` stream table.

The reference computes all analytics over an event-sourced stream keyed
by a monotone ``event_id`` (src/dao.ts:124). The driver corpus's
``events`` table has the same shape (event_id BIGINT, ts, user_id,
event_type, value), so every derived-view pattern from SURVEY.md §2.4
(V1/V2/V7/V10/V12/V13/V15/V16) is exercised here with the same operator
composition it needs on the Ekubo tables — argmax-per-key, mirrored
unions, hourly rollups, sliding windows, lag-based volatility,
time-weighted integrals.

Sign convention (mirrors pool-perspective deltas, src/dao.ts FIXTURES
note): 'purchase'/'signup' are inflows (+value), everything else an
outflow (−value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .registry import register

DEC = "decimal(18,4)"
# For sums of derived doubles (ln, products): cast to a wide decimal so
# the aggregate is order-insensitive (see registry.py policy).
DEC_WIDE = "decimal(30,15)"

INFLOW = ("purchase", "signup")

# hour bucket as whole-second epoch BIGINT (both engines truncate
# identically on whole hours; raw ns-vs-us timestamps do not compare
# reliably — registry.py policy)
def _hour_ts() -> F.Column:
    return F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_ts")


ORACLE_HOUR_TS = "CAST(epoch(date_trunc('hour', ts)) AS BIGINT)"


def _signed_value() -> F.Column:
    return F.when(F.col("event_type").isin(*INFLOW), F.col("value").cast(DEC)).otherwise(
        -F.col("value").cast(DEC)
    )


_ORACLE_SIGNED = (
    "CASE WHEN event_type IN ('purchase','signup') THEN CAST(value AS DECIMAL(18,4)) "
    "ELSE -CAST(value AS DECIMAL(18,4)) END"
)


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_id, event_id) AS last_event_id,
           arg_max(event_type, event_id) AS last_event_type,
           arg_max(value, event_id) AS last_value
    FROM events GROUP BY user_id
    """,
    doc="Argmax-per-key: latest event per user by monotone event_id "
    "(SURVEY §2.3 A3/W5; reference last-swap-per-pool lateral, "
    "src/dao.ts:392-405, rewritten as max_by).",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # max_by: single shuffle, no window sort — at scale this is one
    # partial-aggregated pass instead of a full per-key sort.
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max_by("value", "event_id").alias("last_value"),
    )


@register(
    "latest_state_per_user",
    oracle="""
    WITH last_purchase AS (
      SELECT user_id,
             MAX(event_id) AS last_purchase_id,
             arg_max(value, event_id) AS last_purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    later_clicks AS (
      SELECT e.user_id,
             SUM(CAST(e.value AS DECIMAL(18,4))) AS later_click_sum
      FROM events e JOIN last_purchase lp
        ON e.user_id = lp.user_id AND e.event_id > lp.last_purchase_id
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    )
    SELECT lp.user_id, lp.last_purchase_id, lp.last_purchase_value,
           CAST(COALESCE(lc.later_click_sum, 0) AS DOUBLE) AS later_click_sum
    FROM last_purchase lp LEFT JOIN later_clicks lc ON lp.user_id = lc.user_id
    """,
    doc="pool_states_view analogue (V1, src/dao.ts:384-427): latest "
    "anchor event per key + sum of qualifying later events, left-joined "
    "back with COALESCE 0.",
)
def latest_state_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    last_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("event_id").alias("last_purchase_id"),
            F.max_by("value", "event_id").alias("last_purchase_value"),
        )
    )
    # The anchor set is one row per key — broadcast it so the big event
    # scan joins map-side (reference equivalent: pool_states joins the
    # per-pool argmax back to position_updates, src/dao.ts:412-427).
    later_clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(last_purchase.select("user_id", "last_purchase_id")), "user_id")
        .filter(F.col("event_id") > F.col("last_purchase_id"))
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast(DEC)).alias("later_click_sum"))
    )
    return (
        last_purchase.join(later_clicks, "user_id", "left")
        .select(
            "user_id",
            "last_purchase_id",
            "last_purchase_value",
            F.coalesce(F.col("later_click_sum"), F.lit(0)).cast("double").alias("later_click_sum"),
        )
    )


@register(
    "hourly_rollup",
    oracle=f"""
    SELECT user_id, event_type,
           {ORACLE_HOUR_TS} AS hour_ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id, event_type, hour_ts
    """,
    doc="Tumbling hourly rollup (V13 hourly_volume_by_token, "
    "src/dao.ts:1544-1615): DATE_TRUNC bucket + grouped sums.",
)
def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type", _hour_ts(), "value")
        .groupBy("user_id", "event_type", "hour_ts")
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "sliding_24h_stats",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events)
    SELECT e.user_id,
           CAST(SUM(CASE WHEN e.event_type = 'purchase'
                         THEN CAST(e.value AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
             AS purchases_24h,
           CAST(SUM(CASE WHEN e.event_type = 'view'
                         THEN CAST(e.value AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
             AS views_24h,
           COUNT(*) AS events_24h
    FROM events e, mx
    WHERE e.ts >= mx.max_ts - INTERVAL 24 HOURS
    GROUP BY e.user_id
    """,
    doc="24h sliding stats anchored at max event time (V7 "
    "last_24h_pool_stats, src/dao.ts:882-936; NOW() parameterized as "
    "max(ts) for determinism — SURVEY §4.2). Scalar subquery R4.",
)
def sliding_24h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value").cast(DEC)).otherwise(F.lit(0)))
            .cast("double")
            .alias("purchases_24h"),
            F.sum(F.when(F.col("event_type") == "view", F.col("value").cast(DEC)).otherwise(F.lit(0)))
            .cast("double")
            .alias("views_24h"),
            F.count(F.lit(1)).alias("events_24h"),
        )
    )


@register(
    "value_routing",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type IN ('purchase','signup')
                         THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS inflow,
           CAST(SUM(CASE WHEN event_type NOT IN ('purchase','signup')
                         THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS outflow,
           CAST(SUM(CASE WHEN event_type IN ('purchase','signup')
                         THEN CAST(value AS DECIMAL(18,4))
                         ELSE -CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS net_flow
    FROM events GROUP BY user_id
    """,
    doc="CASE-routed conditional aggregation (SURVEY §2.3 R3/A2; "
    "reference token routing CASE WHEN delta0 >= 0 THEN token0 ELSE "
    "token1, src/dao.ts:1550, and conditional sums 885-905).",
)
def value_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    val = F.col("value").cast(DEC)
    is_in = F.col("event_type").isin(*INFLOW)
    return ev.groupBy("user_id").agg(
        F.sum(F.when(is_in, val).otherwise(F.lit(0))).cast("double").alias("inflow"),
        F.sum(F.when(~is_in, val).otherwise(F.lit(0))).cast("double").alias("outflow"),
        F.sum(_signed_value()).cast("double").alias("net_flow"),
    )


@register(
    "bucket_ledger",
    oracle=f"""
    WITH deltas AS (
      SELECT user_id, CAST(FLOOR(value / 25) AS INTEGER) AS bucket,
             {_ORACLE_SIGNED} AS delta
      FROM events
      UNION ALL
      SELECT user_id, CAST(FLOOR(value / 25) AS INTEGER) + 4 AS bucket,
             -({_ORACLE_SIGNED}) AS delta
      FROM events
    )
    SELECT user_id, bucket, CAST(SUM(delta) AS DOUBLE) AS net_delta
    FROM deltas GROUP BY user_id, bucket
    HAVING SUM(delta) <> 0
    """,
    doc="Mirrored-union boundary ledger (V2 per_pool_per_tick_liquidity, "
    "src/dao.ts:475-499): +delta at lower bound, -delta at upper bound, "
    "summed per (key, boundary), zero rows dropped (SURVEY §2.3 J7/A1/A10).",
)
def bucket_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 25).cast("int")
    lower = ev.select("user_id", bucket.alias("bucket"), _signed_value().alias("delta"))
    upper = ev.select(
        "user_id", (bucket + 4).alias("bucket"), (-_signed_value()).alias("delta")
    )
    return (
        lower.unionByName(upper)
        .groupBy("user_id", "bucket")
        .agg(F.sum("delta").alias("net_delta_dec"))
        .filter(F.col("net_delta_dec") != 0)
        .select("user_id", "bucket", F.col("net_delta_dec").cast("double").alias("net_delta"))
    )


@register(
    "realized_volatility",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, {ORACLE_HOUR_TS} AS hour_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS price
      FROM events GROUP BY user_id, hour_ts
      HAVING SUM(CAST(value AS DECIMAL(18,4))) > 0
    ),
    diffs AS (
      SELECT user_id,
             LN(price / LAG(price) OVER (PARTITION BY user_id ORDER BY hour_ts))
               AS log_diff
      FROM hourly
    )
    SELECT user_id,
           ROUND(SQRT(CAST(SUM(CAST(log_diff * log_diff AS DECIMAL(30,15))) AS DOUBLE)), 6)
             AS volatility,
           COUNT(log_diff) AS n_obs
    FROM diffs WHERE log_diff IS NOT NULL
    GROUP BY user_id
    """,
    doc="Realized volatility sqrt(sum(ln-diff^2)) over hourly series "
    "(V10 token_pair_realized_volatility, src/dao.ts:1038-1083; "
    "SURVEY §2.3 W2/A6). Squared diffs pass through DECIMAL(30,15) so "
    "the sum is order-insensitive.",
)
def realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select("user_id", _hour_ts(), "value")
        .groupBy("user_id", "hour_ts")
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("price"))
        # zero-price hours would divide-by-zero the next row's ratio
        # (ANSI mode); the reference's price series is strictly positive
        .filter(F.col("price") > 0)
    )
    w = W.partitionBy("user_id").orderBy("hour_ts")
    diffs = hourly.withColumn("log_diff", F.log(F.col("price") / F.lag("price").over(w)))
    return (
        diffs.filter(F.col("log_diff").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("log_diff") * F.col("log_diff")).cast(DEC_WIDE)).cast("double")),
                6,
            ).alias("volatility"),
            F.count("log_diff").alias("n_obs"),
        )
    )


@register(
    "time_weighted_balance",
    oracle="""
    WITH bounds AS (SELECT MAX(epoch_us(ts)) AS end_us, MIN(epoch_us(ts)) AS start_us
                    FROM events),
    deltas AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CASE WHEN event_type IN ('purchase','signup')
                  THEN CAST(value AS DECIMAL(18,4))
                  ELSE -CAST(value AS DECIMAL(18,4)) END AS delta
      FROM events
    ),
    running AS (
      SELECT user_id, t_us,
             SUM(delta) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS UNBOUNDED PRECEDING) AS balance,
             LEAD(t_us, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_t_us
      FROM deltas
    )
    -- Three determinism guards (each observed failing at sf0.1):
    -- 1. balance DECIMAL(38,4) x BIGINT exceeds decimal width -> DuckDB
    --    silently falls back to DOUBLE and the integral loses
    --    exactness; the narrowing casts keep every product an exact
    --    DECIMAL(38,0) on both engines.
    -- 2. The integral is kept in INTEGER units (1e-4 value x µs):
    --    decimal(38,4)->double conversion is single-rounded in Spark
    --    (BigDecimal.doubleValue) but double(int128)/1e4 (two
    --    roundings) in DuckDB — off by 1 ulp on knife-edge values.
    --    int->double is correctly rounded on both.
    -- 3. FLOOR(x + 0.5), not ROUND(..): engine round() builtins
    --    disagree on exact half-way quotients; on identical inputs
    --    this floor form is the same IEEE op sequence on both.
    SELECT r.user_id,
           FLOOR(CAST(SUM(CAST(CAST(r.balance AS DECIMAL(20,4)) * 10000 AS DECIMAL(24,0))
                          * CAST(COALESCE(r.next_t_us, b.end_us) - r.t_us AS DECIMAL(13,0)))
                      AS DOUBLE)
                 * 100 / (b.end_us - b.start_us) + 0.5) / 1000000 AS twab
    FROM running r, bounds b
    GROUP BY r.user_id, b.end_us, b.start_us
    """,
    doc="Time-weighted average balance: running sum x interval-to-next "
    "integral over the global window (V12 "
    "proposal_delegate_voting_weights, src/dao.ts:1231-1352; SURVEY "
    "§2.3 W3/W4/A7). Exact: decimal balance x integer microseconds; "
    "the 6-dp presentation rounding is half-up via floor(x*1e6+0.5) "
    "because engine round() builtins disagree on exact half-way "
    "quotients.",
)
def time_weighted_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.max(F.unix_micros("ts")).alias("end_us"), F.min(F.unix_micros("ts")).alias("start_us")
    )
    deltas = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us"), _signed_value().alias("delta")
    )
    w = W.partitionBy("user_id").orderBy("event_id")
    running = deltas.select(
        "user_id",
        "t_us",
        F.sum("delta").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("balance"),
        F.lead("t_us", 1).over(w).alias("next_t_us"),
    )
    return (
        running.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "end_us", "start_us")
        .agg(
            (
                F.floor(
                    F.sum(
                        (F.col("balance").cast("decimal(20,4)") * 10000).cast("decimal(24,0)")
                        * (
                            F.coalesce(F.col("next_t_us"), F.col("end_us")) - F.col("t_us")
                        ).cast("decimal(13,0)")
                    ).cast("double")
                    * 100
                    / (F.col("end_us") - F.col("start_us"))
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("twab")
        )
        .select("user_id", "twab")
    )


@register(
    "two_stage_price",
    oracle=f"""
    WITH stage1 AS (
      SELECT user_id, {ORACLE_HOUR_TS} AS hour_ts,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ts,
             SUM(CAST(value AS DECIMAL(18,4))) AS hour_sum
      FROM events GROUP BY user_id, hour_ts, day_ts
    )
    SELECT user_id, day_ts,
           CAST(SUM(hour_sum * hour_sum) AS DOUBLE) AS total,
           CAST(SUM(ABS(hour_sum)) AS DOUBLE) AS k_volume,
           COUNT(*) AS n_hours
    FROM stage1 GROUP BY user_id, day_ts
    """,
    doc="Two-stage partial aggregation: per-(key,hour) sums squared and "
    "re-aggregated per day (V15 hourly_price_data per-block pair sums, "
    "src/dao.ts:1656-1688; SURVEY §2.3 A8).",
)
def two_stage_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stage1 = (
        ev.select(
            "user_id",
            _hour_ts(),
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_ts"),
            "value",
        )
        .groupBy("user_id", "hour_ts", "day_ts")
        .agg(F.sum(F.col("value").cast(DEC)).alias("hour_sum"))
    )
    return stage1.groupBy("user_id", "day_ts").agg(
        F.sum(F.col("hour_sum") * F.col("hour_sum")).cast("double").alias("total"),
        F.sum(F.abs(F.col("hour_sum"))).cast("double").alias("k_volume"),
        F.count(F.lit(1)).alias("n_hours"),
    )


@register(
    "median_value",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS median_value,
           ROUND(quantile_cont(value, 0.9), 6) AS p90_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentile (V11 market depth's "
    "percentile_cont(0.5), src/dao.ts:1113-1129; SURVEY §2.3 A5 — "
    "exact for oracle parity; percentile_approx is the 100TB path).",
)
def median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "global_top1",
    oracle="""
    SELECT arg_max(event_id, event_id) AS event_id,
           arg_max(event_type, event_id) AS event_type,
           arg_max(user_id, event_id) AS user_id
    FROM events
    """,
    doc="Global ORDER BY DESC LIMIT 1 (latest block time, "
    "src/dao.ts:1039-1043; SURVEY §2.3 W6/O2).",
)
def global_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("event_id").desc())
        .limit(1)
        .select("event_id", "event_type", "user_id")
    )


@register(
    "active_users_union",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc="UNION-distinct of two filtered key sets (delegate sentinel set, "
    "src/dao.ts:1296-1299; SURVEY §2.3 O4).",
)
def active_users_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.union(b).distinct()


@register(
    "asof_latest_purchase",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             event_type, value
      FROM events
    ),
    p AS (
      SELECT user_id, sec, arg_max(value, event_id) AS pv
      FROM e WHERE event_type = 'purchase' GROUP BY user_id, sec
    ),
    c AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.sec, ROUND(p.pv, 6) AS last_purchase
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.sec >= p.sec
    """,
    doc="Backward as-of join (operators.asof): each click annotated "
    "with the user's most recent purchase value at-or-before it. "
    "Union+window implementation — one shuffle on the key and a "
    "per-partition sort, never the O(left×right) range theta join. "
    "Oracle uses DuckDB's native ASOF JOIN; tie semantics (right row "
    "effective at t matches left at t) agree by construction.",
)
def asof_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        "event_type",
        "value",
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "sec")
        .agg(F.max_by("value", "event_id").alias("pv"))
    )
    c = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "sec")
    return asof_join(c, p, ["user_id"], "sec", ["pv"]).select(
        "event_id", "user_id", "sec", F.round("pv", 6).alias("last_purchase")
    )


@register(
    "rolling_window_stats",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w_range AS n_1h,
           FLOOR(CAST(SUM(v) OVER w_range AS DOUBLE) * 1e6 + 0.5) / 1e6 AS sum_1h,
           FLOOR(CAST(SUM(v) OVER w_rows AS DOUBLE)
                 / (COUNT(*) OVER w_rows) * 1e6 + 0.5) / 1e6 AS ma5
    FROM e
    WINDOW
      w_range AS (PARTITION BY user_id ORDER BY ts_s
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
      w_rows AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    doc="Sliding window frames — the two frame kinds the engine's "
    "window layer supports beyond the reference's UNBOUNDED frames "
    "(SURVEY §2.3 W4): a trailing 1-hour RANGE frame keyed on event "
    "time (per-event 1h count/sum — tie-insensitive: all peers at the "
    "boundary are in-frame on both engines) and a 5-row ROWS frame "
    "moving average ordered by the unique event_id (ROWS frames need "
    "a total order to be deterministic). Both windows partition by "
    "user_id, so one exchange serves both sorts. Sums pass through "
    "DECIMAL(18,6) for order-insensitive exactness; derived ratios "
    "round via FLOOR(x*1e6+0.5) (engine round() differs on halves).",
)
def rolling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w_range = W.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    w_rows = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-4, 0)
    six = F.lit(1e6)
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w_range).alias("n_1h"),
        (F.floor(F.sum("v").over(w_range).cast("double") * six + F.lit(0.5)) / six).alias(
            "sum_1h"
        ),
        (
            F.floor(
                F.sum("v").over(w_rows).cast("double")
                / F.count("*").over(w_rows)
                * six
                + F.lit(0.5)
            )
            / six
        ).alias("ma5"),
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured extraction: the JSON ``props`` payload parsed "
    "with a declared schema (``from_json`` — typed, Catalyst-optimized, "
    "null on malformed) and aggregated per event type. Schema-on-read "
    "stays a projection: the parse is map-side, the only shuffle is "
    "the low-cardinality groupBy. At 100 TB the play is identical — "
    "parse once into a silver column, never re-parse per query "
    "(the same silver-table rule as the dedup shingle relation).",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    v AS (SELECT user_id, MIN(t) AS t1 FROM e WHERE event_type = 'view'
          GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.t) AS t2
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.t > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.t) AS t3
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.t > c.t2
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / (SELECT COUNT(*) FROM v), 6) AS view_to_purchase_rate
    """,
    doc="Ordered funnel (view -> click after it -> purchase after "
    "that): each stage is a per-user conditional MIN constrained by "
    "the previous stage's time — the sequential-pattern shape of "
    "product analytics at event-warehouse scale. The oracle writes it "
    "as three self-join stages; the Spark plan instead chains three "
    "conditional window-MINs over ONE user_id partitioning (stage k's "
    "predicate references stage k-1's column, legal inside the same "
    "window spec), then collapses per-user flags — the whole funnel "
    "costs one events shuffle plus the per-user reduce, versus the "
    "naive three aggregate-join rounds (10 exchanges measured). "
    "Stage timestamps compare in whole microseconds on both engines "
    "(epoch_us vs the catalog's ns->us truncation).",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
    )
    w = W.partitionBy("user_id")
    typ = F.col("event_type")
    staged = (
        ev.withColumn("t1", F.min(F.when(typ == "view", F.col("t"))).over(w))
        .withColumn(
            "t2",
            F.min(
                F.when((typ == "click") & (F.col("t") > F.col("t1")), F.col("t"))
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when((typ == "purchase") & (F.col("t") > F.col("t2")), F.col("t"))
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("t1").isNotNull()).alias("viewed"),
        F.max(F.col("t2").isNotNull()).alias("clicked"),
        F.max(F.col("t3").isNotNull()).alias("purchased"),
    )
    n = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        n("viewed").alias("n_viewed"),
        n("clicked").alias("n_clicked_after_view"),
        n("purchased").alias("n_purchased_after_click"),
    ).select(
        "n_users",
        "n_viewed",
        "n_clicked_after_view",
        "n_purchased_after_click",
        F.round(
            F.col("n_purchased_after_click") / F.col("n_viewed").cast("double"), 6
        ).alias("view_to_purchase_rate"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800 AS week_bucket
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(week_bucket) AS cohort_week FROM e
               GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, week_bucket FROM e)
    SELECT c.cohort_week,
           a.week_bucket - c.cohort_week AS week_offset,
           COUNT(*) AS n_active_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_week, week_offset
    """,
    doc="Weekly retention cohorts: users bucketed by first-seen week, "
    "counted in each later activity week. Weeks are epoch-seconds "
    "div 604800 — pure integer math, immune to the engines' "
    "different week-start calendar conventions. The cohort argmin, "
    "the activity distinct, and the join all key on user_id (one "
    "partitioning reused); only the final small (cohort x offset) "
    "aggregate re-shuffles. The standard growth-analytics rollup "
    "over an event-sourced table (same argmin-per-key core as V1 "
    "pool_states, src/dao.ts:384-427).",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 604800).cast("long").alias("week_bucket"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week_bucket").alias("cohort_week"))
    activity = ev.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_bucket") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "value_decile_bands",
    oracle="""
    WITH ranked AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v_fixed,
             NTILE(10) OVER w AS decile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM events
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY CAST(FLOOR(value * 10000 + 0.5) AS BIGINT), event_id)
    )
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS n_events,
           MIN(v_fixed) AS v_min,
           MAX(v_fixed) AS v_max,
           ROUND(MIN(pr), 6) AS pr_min,
           ROUND(MAX(cd), 6) AS cd_max
    FROM ranked
    GROUP BY event_type, decile
    """,
    doc="Decile banding per event_type: NTILE(10) + PERCENT_RANK + "
    "CUME_DIST over one shared window (the ranked-distribution family "
    "of window functions, previously unexercised), then per-band "
    "stats. Values are fixed-point BIGINTs and the window order is "
    "totally determined by (value, event_id), so band edges are "
    "engine-exact. One exchange on event_type serves the window AND "
    "the grouping (the agg key prefixes the window key).",
)
def value_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v_fixed = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
    w = W.partitionBy("event_type").orderBy("v_fixed", "event_id")
    ranked = ev.select("event_type", "event_id", v_fixed.alias("v_fixed")).select(
        "event_type",
        "v_fixed",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("event_type", F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("v_fixed").alias("v_min"),
        F.max("v_fixed").alias("v_max"),
        F.round(F.min("pr"), 6).alias("pr_min"),
        F.round(F.max("cd"), 6).alias("cd_max"),
    )


@register(
    "gap_fill_hourly",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
             CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(hour_ts) AS lo, MAX(hour_ts) AS hi FROM hourly
    ),
    spine AS (
      SELECT et.event_type, s.h AS hour_ts
      FROM (SELECT DISTINCT event_type FROM hourly) et
      CROSS JOIN (SELECT UNNEST(range((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds) + 3600,
                                      3600)) AS h) s
    )
    SELECT s.event_type, s.hour_ts,
           COALESCE(h.v, 0) AS v,
           CAST(h.v IS NULL AS BIGINT) AS was_gap,
           LAST_VALUE(h.v IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hour_ts
             ROWS UNBOUNDED PRECEDING) AS v_ffill
    FROM spine s LEFT JOIN hourly h USING (event_type, hour_ts)
    """,
    doc="Time-series gap fill / resample: a dense hour spine "
    "(sequence over the global [min, max] hour range) left-joined "
    "against the hourly rollup, with missing hours zero-filled AND "
    "forward-filled (last_value IGNORE NULLS). The spine "
    "(event_types x hours) is the null-preserved probe side — it "
    "cannot be a broadcast build side; the already-aggregated rollup "
    "is, under AQE. The fill window partitions by event_type. The "
    "hypertable operation the reference's hourly views (V13-V16) "
    "would need for chart-ready output.",
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v_fixed = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
    hourly = (
        ev.select(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_ts"),
            v_fixed.alias("vf"),
        )
        .groupBy("event_type", "hour_ts")
        .agg(F.sum("vf").cast("bigint").alias("v"))
    )
    bounds = hourly.agg(
        F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi")
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(3600).cast("bigint"))
            ).alias("hour_ts"),
        )
    )
    w = W.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        W.unboundedPreceding, 0
    )
    # the spine is the null-preserved side of the outer join, so it
    # cannot be the broadcast build side; the rollup (already
    # aggregated: event_types x active hours) is the small build side
    # and AQE broadcasts it
    return (
        spine.join(hourly, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce(F.col("v"), F.lit(0)).cast("bigint").alias("v"),
            F.col("v").isNull().cast("bigint").alias("was_gap"),
            F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
        )
    )


@register(
    "props_map_stats",
    oracle="""
    WITH kv AS (
      SELECT unnest(map_entries(CAST(CAST(props AS JSON)
                                     AS MAP(VARCHAR, VARCHAR)))) AS e
      FROM events
    )
    SELECT e.key AS prop_key,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.value) AS n_distinct_values,
           CAST(SUM(TRY_CAST(e.value AS BIGINT)) AS BIGINT) AS sum_numeric
    FROM kv
    GROUP BY e.key
    """,
    doc="Schema-FREE semi-structured pass: props parsed as "
    "MAP<STRING,STRING> (the open-schema counterpart of "
    "json_props_extract's declared struct), exploded to (key, value) "
    "rows, per-key cardinality + numeric rollup. Exercises MapType + "
    "explode(map) + try_cast. Map-side parse/explode; one shuffle on "
    "the (low-cardinality) key. Same 100 TB rule as every JSON query: "
    "parse once into a silver map column, never re-parse per query.",
)
def props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return (
        ev.select(F.explode(m).alias("prop_key", "v"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("v").alias("n_distinct_values"),
            F.sum(F.col("v").try_cast("bigint")).cast("bigint").alias("sum_numeric"),
        )
    )


@register(
    "events_profile",
    oracle="""
    WITH base AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(user_id) AS nn_user, COUNT(DISTINCT user_id) AS nd_user,
             CAST(MIN(user_id) AS STRING) AS mn_user,
             CAST(MAX(user_id) AS STRING) AS mx_user,
             COUNT(event_type) AS nn_type, COUNT(DISTINCT event_type) AS nd_type,
             CAST(MIN(event_type) AS STRING) AS mn_type,
             CAST(MAX(event_type) AS STRING) AS mx_type,
             COUNT(value) AS nn_value, COUNT(DISTINCT value) AS nd_value,
             CAST(CAST(FLOOR(MIN(value) * 10000 + 0.5) AS BIGINT) AS STRING) AS mn_value,
             CAST(CAST(FLOOR(MAX(value) * 10000 + 0.5) AS BIGINT) AS STRING) AS mx_value
      FROM events
    )
    SELECT 'user_id' AS column_name, n_rows, n_rows - nn_user AS n_nulls,
           nd_user AS n_distinct, mn_user AS min_value, mx_user AS max_value
    FROM base
    UNION ALL
    SELECT 'event_type', n_rows, n_rows - nn_type, nd_type, mn_type, mx_type FROM base
    UNION ALL
    SELECT 'value', n_rows, n_rows - nn_value, nd_value, mn_value, mx_value FROM base
    """,
    doc="Column profiling (Deequ/dbt-style dataset statistics): one "
    "pass computes per-column null counts, distinct cardinalities and "
    "min/max for a declared column set, then UNPIVOTS (stack) the "
    "single stats row into one row per column. The scan happens ONCE "
    "for all columns — the profiling shape that stays affordable at "
    "100 TB, vs one query per column. Floats are profiled as "
    "fixed-point strings for engine-exact comparison.",
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v_fixed_min = F.floor(F.min("value") * 10000 + F.lit(0.5)).cast("bigint")
    v_fixed_max = F.floor(F.max("value") * 10000 + F.lit(0.5)).cast("bigint")
    base = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("user_id").alias("nn_user"),
        F.countDistinct("user_id").alias("nd_user"),
        F.min("user_id").cast("string").alias("mn_user"),
        F.max("user_id").cast("string").alias("mx_user"),
        F.count("event_type").alias("nn_type"),
        F.countDistinct("event_type").alias("nd_type"),
        F.min("event_type").cast("string").alias("mn_type"),
        F.max("event_type").cast("string").alias("mx_type"),
        F.count("value").alias("nn_value"),
        F.countDistinct("value").alias("nd_value"),
        v_fixed_min.cast("string").alias("mn_value"),
        v_fixed_max.cast("string").alias("mx_value"),
    )
    # stack(): the unpivot — 1 stats row -> 1 row per profiled column
    return base.select(
        F.expr(
            """stack(3,
               'user_id', n_rows, n_rows - nn_user, nd_user, mn_user, mx_user,
               'event_type', n_rows, n_rows - nn_type, nd_type, mn_type, mx_type,
               'value', n_rows, n_rows - nn_value, nd_value, mn_value, mx_value)
               AS (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"""
        )
    )


@register(
    "value_time_correlation",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CASE WHEN COUNT(*) > 1 AND stddev_samp(value) > 0
                 AND stddev_samp(CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)) > 0
                THEN ROUND(corr(value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)), 6)
           END AS corr_value_hour,
           CASE WHEN COUNT(*) > 1
                THEN ROUND(covar_samp(value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)), 6)
           END AS covar_value_hour,
           CASE WHEN COUNT(*) > 1 THEN ROUND(stddev_samp(value), 6)
           END AS stddev_value
    FROM events
    GROUP BY event_type
    """,
    doc="Bivariate statistics per event type: Pearson correlation and "
    "sample covariance between value and hour-of-day, plus sample "
    "stddev — the statistical-aggregate family (corr/covar/stddev) "
    "beyond plain sums. Single hash aggregation with map-side "
    "partial moments (both engines accumulate the same co-moment "
    "recurrences); results rounded to the driver's 6-dp comparison "
    "precision.",
)
def value_time_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour = F.hour("ts").cast("double")
    # degenerate groups (one row, or zero variance in either operand)
    # are NULLed explicitly: Spark's corr/covar_samp/stddev_samp emit
    # NaN there while DuckDB emits NULL — an engine divergence the
    # value-hash would flag on any corpus with a sparse event_type
    n = F.count(F.lit(1))
    sv = F.stddev_samp("value")
    sh = F.stddev_samp(hour)
    return ev.groupBy("event_type").agg(
        n.alias("n_events"),
        F.when((n > 1) & (sv > 0) & (sh > 0), F.round(F.corr("value", hour), 6)).alias(
            "corr_value_hour"
        ),
        F.when(n > 1, F.round(F.covar_samp("value", hour), 6)).alias(
            "covar_value_hour"
        ),
        F.when(n > 1, F.round(sv, 6)).alias("stddev_value"),
    )


@register(
    "value_mad_by_type",
    oracle="""
    WITH fx AS (
      SELECT event_type,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    med AS (
      SELECT event_type, CAST(median(v) AS DOUBLE) AS med_v
      FROM fx GROUP BY event_type
    ),
    dev AS (
      SELECT f.event_type, ABS(f.v - m.med_v) AS d, m.med_v
      FROM fx f JOIN med m USING (event_type)
    )
    SELECT event_type,
           ROUND(MAX(med_v), 6) AS median_v,
           ROUND(CAST(median(d) AS DOUBLE), 6) AS mad_v,
           COUNT(*) AS n_events
    FROM dev
    GROUP BY event_type
    """,
    doc="Robust dispersion per event type: median absolute deviation "
    "(MAD) — the outlier-resistant scale estimate a quality pipeline "
    "prefers over stddev on heavy-tailed value distributions. Two "
    "exact-percentile passes over fixed-point values, both keyed on "
    "event_type so the median broadcast-joins back onto the same "
    "partitioning. At 100 TB swap exact percentile for "
    "percentile_approx per the documented policy (median_value "
    "docstring).",
)
def value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
    fx = ev.select("event_type", v.alias("v"))
    med = fx.groupBy("event_type").agg(
        F.percentile("v", F.lit(0.5)).alias("med_v")
    )
    dev = fx.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med_v")).alias("d"), "med_v"
    )
    return dev.groupBy("event_type").agg(
        F.round(F.max("med_v"), 6).alias("median_v"),
        F.round(F.percentile("d", F.lit(0.5)), 6).alias("mad_v"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "interval_attribution",
    oracle="""
    WITH buys AS (
      SELECT user_id, event_id AS buy_id, ts AS buy_ts
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, event_id AS view_id, ts AS view_ts
      FROM events WHERE event_type = 'view'
    ),
    paired AS (
      SELECT b.buy_id, v.view_id
      FROM buys b JOIN views v
        ON b.user_id = v.user_id
       AND v.view_ts >= b.buy_ts - INTERVAL 1 HOUR
       AND v.view_ts <= b.buy_ts
    )
    SELECT buy_id,
           COUNT(*) AS n_views,
           MIN(view_id) AS first_view_id,
           MAX(view_id) AS last_view_id
    FROM paired GROUP BY buy_id
    """,
    doc="Event-time interval attribution: each purchase matched to the "
    "same user's page-views in the preceding hour, then aggregated "
    "per purchase. Built on streaming/joins.interval_join run in "
    "batch mode — the SAME operator code that passes the stream=="
    "batch equivalence test (test_streaming_native.py), so this "
    "driver hash row certifies the streaming operator's join "
    "semantics too (J5 range join, streaming §2.5 surface). The join "
    "shuffles both sides on user_id; at scale both streams "
    "pre-bucket on the key.",
)
def interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import interval_join

    ev = load(spark, sf_dir, "events")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), F.col("ts").alias("buy_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    paired = interval_join(
        buys,
        views,
        keys=["user_id"],
        left_ts="buy_ts",
        right_ts="view_ts",
        lower="-1 hour",
        upper="0 seconds",
    )
    return paired.groupBy("buy_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.min("view_id").alias("first_view_id"),
        F.max("view_id").alias("last_view_id"),
    )
