"""Range/interval algebra, theta joins, cross-join scaffolds, multi-way
unions, and dedup-canonicalization — the remaining SURVEY.md §2.3
operator families (J4/J5/J8, O3, V8/V16 analogues).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

DEC = "decimal(18,4)"

DAY = 86400
WINDOW_START = 852076800  # 1997-01-01 UTC
WINDOW_END = 867715200  # 1997-06-30 UTC
EVENTS_EPOCH = 1704067200  # 2024-01-01 UTC


@register(
    "interval_intersect",
    oracle=f"""
    WITH iv AS (
      SELECT o_orderpriority,
             CAST(epoch(o_orderdate) AS BIGINT) AS lo,
             CAST(epoch(o_orderdate) AS BIGINT) + 30 * {DAY} AS hi
      FROM orders
    ),
    clipped AS (
      SELECT o_orderpriority,
             GREATEST(lo, {WINDOW_START}) AS clo,
             LEAST(hi, {WINDOW_END}) AS chi
      FROM iv
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_overlapping,
           CAST(SUM((chi - clo) // {DAY}) AS BIGINT) AS overlap_days
    FROM clipped WHERE chi > clo
    GROUP BY o_orderpriority
    """,
    doc="Interval intersection via greatest/least + emptiness check "
    "(SURVEY §2.3 J8; reference int4range algebra "
    "src/dao.ts:1160-1179). 30-day order intervals clipped to a fixed "
    "window; empty intersections dropped.",
)
def interval_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lo = F.unix_timestamp("o_orderdate")
    hi = lo + 30 * DAY
    clo = F.greatest(lo, F.lit(WINDOW_START))
    chi = F.least(hi, F.lit(WINDOW_END))
    return (
        orders.select("o_orderpriority", clo.alias("clo"), chi.alias("chi"))
        .filter(F.col("chi") > F.col("clo"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_overlapping"),
            F.sum(F.floor((F.col("chi") - F.col("clo")) / DAY)).alias("overlap_days"),
        )
    )


@register(
    "range_theta_join",
    oracle=f"""
    WITH windows AS (
      SELECT k,
             {EVENTS_EPOCH} + k * 5 * {DAY} AS w_start,
             {EVENTS_EPOCH} + (k + 1) * 5 * {DAY} AS w_end
      FROM (SELECT UNNEST(range(6)) AS k)
    )
    SELECT w.k AS window_id, w.w_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS window_volume
    FROM events e JOIN windows w
      ON (epoch_us(e.ts) // 1000000) >= w.w_start
     AND (epoch_us(e.ts) // 1000000) <  w.w_end
    GROUP BY w.k, w.w_start
    """,
    doc="Range-predicate (theta) join of a fact stream against generated "
    "time windows (SURVEY §2.3 J5; reference active-order windows "
    "start_time <= t AND end_time > t, src/dao.ts:791-794; "
    "generate_series analogue src/dao.ts:1087). The tiny window side is "
    "broadcast, so the theta join is a map-side nested loop, not a "
    "cartesian shuffle.",
)
def range_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    windows = spark.range(6).select(
        F.col("id").alias("window_id"),
        (F.lit(EVENTS_EPOCH) + F.col("id") * 5 * DAY).alias("w_start"),
        (F.lit(EVENTS_EPOCH) + (F.col("id") + 1) * 5 * DAY).alias("w_end"),
    )
    sec = F.floor(F.unix_micros("ts") / 1_000_000)
    return (
        ev.select(sec.alias("sec"), F.col("value").cast(DEC).alias("v"))
        .join(
            F.broadcast(windows),
            (F.col("sec") >= F.col("w_start")) & (F.col("sec") < F.col("w_end")),
        )
        .groupBy("window_id", "w_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("window_volume"),
        )
    )


@register(
    "hourly_net_flow",
    oracle="""
    WITH deltas AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, CAST(value AS DECIMAL(18,4)) AS delta
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, date_trunc('hour', ts), -CAST(value AS DECIMAL(18,4))
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, date_trunc('hour', ts),
             CAST(value AS DECIMAL(18,4)) * CAST(0.5 AS DECIMAL(2,1))
      FROM events WHERE event_type = 'click'
    )
    SELECT user_id, CAST(epoch(hour) AS BIGINT) AS hour_ts,
           CAST(SUM(delta) AS DOUBLE) AS net_flow,
           COUNT(*) AS n_deltas
    FROM deltas GROUP BY user_id, hour_ts
    """,
    doc="Multi-branch UNION ALL with per-branch sign/scale conventions, "
    "re-aggregated per (key, hour) (V16 hourly_tvl_delta_by_token "
    "5-way union, src/dao.ts:1690-1787; SURVEY §2.3 O3/A1).",
)
def hourly_net_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    val = F.col("value").cast(DEC)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", hour.alias("hour"), val.alias("delta")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", hour.alias("hour"), (-val).alias("delta")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", hour.alias("hour"), (val * F.lit("0.5").cast("decimal(2,1)")).alias("delta")
    )
    return (
        purchases.unionByName(errors)
        .unionByName(clicks)
        .groupBy("user_id", F.unix_timestamp("hour").alias("hour_ts"))
        .agg(
            F.sum("delta").cast("double").alias("net_flow"),
            F.count(F.lit(1)).alias("n_deltas"),
        )
    )


@register(
    "depth_levels",
    oracle="""
    WITH levels AS (
      SELECT UNNEST(range(1, 11)) AS level
    )
    SELECT e.event_type, l.level * 50 AS threshold,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS depth_volume
    FROM events e JOIN levels l ON e.value <= l.level * 50
    GROUP BY e.event_type, threshold
    """,
    doc="Cross-join against a generated ladder of depth levels with "
    "cumulative containment (V11 pool_market_depth's CROSS JOIN "
    "depth_percentages + generate_series, src/dao.ts:1085-1207; "
    "SURVEY §2.3 J4). Broadcast nested-loop on the 10-row side.",
)
def depth_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    levels = spark.range(1, 11).select((F.col("id") * 50).alias("threshold"))
    return (
        ev.join(F.broadcast(levels), F.col("value") <= F.col("threshold"))
        .groupBy("event_type", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("depth_volume"),
        )
    )


@register(
    "source_canonicalization",
    oracle="""
    WITH valid AS (
      SELECT doc_id, source, lang, n_chars FROM documents
      WHERE LENGTH(lang) BETWEEN 2 AND 9 AND regexp_matches(lang, '^[\\x00-\\x7F]*$')
    ),
    lang_owner AS (
      SELECT lang, arg_min(source, doc_id) AS owner,
             MIN(doc_id) AS first_doc_id
      FROM valid GROUP BY lang
    ),
    latest AS (
      SELECT source, lang,
             MAX(doc_id) AS last_doc_id,
             arg_max(n_chars, doc_id) AS n_chars
      FROM valid GROUP BY source, lang
    )
    SELECT o.lang, o.owner, o.first_doc_id, l.last_doc_id, l.n_chars
    FROM lang_owner o JOIN latest l ON l.lang = o.lang AND l.source = o.owner
    """,
    doc="Dedup-canonicalization with first-claimant-wins + latest-row-wins "
    "semantics (V8 latest_token_registrations, src/dao.ts:970-1023: "
    "first registrant owns the symbol, latest registration per address "
    "supplies metadata; ASCII/length validation src/dao.ts:987-993).",
)
def source_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    valid = docs.filter(
        F.length("lang").between(2, 9) & F.col("lang").rlike("^[\\x00-\\x7F]*$")
    ).select("doc_id", "source", "lang", "n_chars")
    lang_owner = valid.groupBy("lang").agg(
        F.min_by("source", "doc_id").alias("owner"),
        F.min("doc_id").alias("first_doc_id"),
    )
    latest = valid.groupBy(
        F.col("source").alias("l_source"), F.col("lang").alias("l_lang")
    ).agg(
        F.max("doc_id").alias("last_doc_id"),
        F.max_by("n_chars", "doc_id").alias("n_chars"),
    )
    return (
        F.broadcast(lang_owner)
        .join(
            latest,
            (F.col("l_lang") == F.col("lang")) & (F.col("l_source") == F.col("owner")),
        )
        .select("lang", "owner", "first_doc_id", "last_doc_id", "n_chars")
    )


@register(
    "engaged_non_buyers",
    oracle="""
    WITH w AS (
      SELECT user_id, event_type FROM events
      WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    )
    SELECT user_id FROM w WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM w WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM w WHERE event_type = 'purchase'
    """,
    doc="O5 INTERSECT/EXCEPT (SURVEY §2.3; unused by the reference's "
    "SQL but part of the declared operator surface): users who both "
    "clicked and viewed but never purchased. Spark rewrites "
    "intersect/except to left-semi/left-anti joins — same hash-join "
    "physical shape as the reference's NOT EXISTS patterns.",
)
def engaged_non_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day-1 slice: at full-history scope every user hits all event
    # types and the result degenerates to empty
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .select("user_id", "event_type")
    )
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(viewers).exceptAll(buyers.distinct()).distinct()
