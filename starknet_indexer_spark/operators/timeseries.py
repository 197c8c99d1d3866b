"""Time-series candle (OHLC) kernel, shared by the batch query and the
streaming incremental view.

A candle is a MERGEABLE aggregate: alongside the public columns
(open/high/low/close/volume/count) the state carries the ordering keys
of the open and close rows, so two partial candles over disjoint row
sets merge exactly — open comes from the side with the smaller
open_ordk, close from the larger close_ordk, the rest are plain
min/max/sum. A single input row is itself a unit candle, which makes
ONE merge function the whole algebra:

    candle(rows) = ohlc_merge(unit_candles(rows))
    candle(A ∪ B) = ohlc_merge(candle(A) ∪ candle(B))

That second identity is what the streaming view relies on (state ∪
batch partials → merged state) and what the equivalence tests pin
against the batch query.

The ordering key is a STRUCT (offset-in-hour microseconds, event_id):
Spark's min/min_by order structs lexicographically, so the key is exact
for any event_id — no fold, no collision bound. This kernel is also the
production streaming state (streaming/ohlc.py), where a folded BIGINT
key would silently misorder open/close once event_id reached 1e6. Only
the DuckDB test oracle folds the pair into one BIGINT (arg_min there
cannot order by a struct); that fold is collision-free below event_id
1e6 and the test corpora stay under 1e5 — a Spark-vs-Spark regression
test pins the kernel itself at event_id >= 1e12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OHLC_KEY = ["event_type", "hour"]

#: merged/public candle column order (after the key)
OHLC_STATE_COLS = [
    "open_ordk",
    "open",
    "high",
    "low",
    "close_ordk",
    "close",
    "volume_cents",
    "n_events",
]
OHLC_PUBLIC_COLS = ["open", "high", "low", "close", "volume_cents", "n_events"]


def unit_candles(events: DataFrame) -> DataFrame:
    """One unit candle per event row (the algebra's generators)."""
    e = events.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        "ts",
        "event_id",
        "value",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    ordk = F.struct(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("hour"))).alias("off"),
        F.col("event_id").cast("bigint").alias("eid"),
    )
    return e.select(
        "event_type",
        "hour",
        ordk.alias("open_ordk"),
        F.col("value").alias("open"),
        F.col("value").alias("high"),
        F.col("value").alias("low"),
        ordk.alias("close_ordk"),
        F.col("value").alias("close"),
        F.col("cents").alias("volume_cents"),
        F.lit(1).cast("bigint").alias("n_events"),
    )


def ohlc_merge(candles: DataFrame) -> DataFrame:
    """Merge any mix of unit/partial candles per (event_type, hour)."""
    return candles.groupBy(*OHLC_KEY).agg(
        F.min("open_ordk").alias("open_ordk"),
        F.min_by("open", "open_ordk").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("close_ordk").alias("close_ordk"),
        F.max_by("close", "close_ordk").alias("close"),
        F.sum("volume_cents").cast("bigint").alias("volume_cents"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


def ohlc_candles(events: DataFrame) -> DataFrame:
    """Batch candle table: public columns only."""
    return ohlc_merge(unit_candles(events)).select(*OHLC_KEY, *OHLC_PUBLIC_COLS)
