"""Native Structured-Streaming windowed aggregation.

SURVEY.md §2.5: the reference's hourly rollups (V13-V16) are tumbling
``DATE_TRUNC('hour')`` aggregates refreshed by upsert; the engine's
batch path reproduces that in runtime.py. This module is the *native
streaming* expression of the same semantics: event-time window +
watermark, so a long-running stream maintains the rollup continuously
with bounded state — the watermark bounds how late an event may arrive
before its window's state is evicted.

Chain-fed deployments set a short watermark (block order is
authoritative; lateness ≈ 0 — SURVEY §2.5 late-data row); feeds with
genuine lateness widen it. State size = open windows × key
cardinality, independent of history length — the property that lets
this run forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    stream: DataFrame,
    ts_col: str,
    key_cols: list[str],
    agg_exprs: list[Column],
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time rollup over a streaming DataFrame. Output
    carries the window start as ``hour`` (matching the batch
    ``date_trunc`` rollups so downstream consumers are
    mode-agnostic)."""
    agged = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *key_cols)
        .agg(*agg_exprs)
    )
    measure_cols = [c for c in agged.columns if c != "w" and c not in key_cols]
    return agged.select(F.col("w.start").alias("hour"), *key_cols, *measure_cols)


def sessionized(
    stream: DataFrame,
    ts_col: str,
    key_cols: list[str],
    agg_exprs: list[Column],
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time session windows: per key, events closer than ``gap``
    merge into one session; a session closes (and its state is
    evictable) once the watermark passes its end. This is the native
    streaming counterpart of the batch ``sessionize_events`` query
    (queries/pipeline_corpus.py) — ``F.session_window`` works in both
    modes, so batch==stream equivalence is testable with the same
    operator. State is bounded by *open* sessions per key, not history
    length — the property that lets gap-sessionization run
    indefinitely on a high-rate stream."""
    agged = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *key_cols)
        .agg(*agg_exprs)
    )
    measure_cols = [c for c in agged.columns if c != "sw" and c not in key_cols]
    return agged.select(
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        *key_cols,
        *measure_cols,
    )
