"""Streaming incremental OHLC view: the online twin of the
``ohlc_hourly`` batch query.

The reference maintains its hourly market views (price/volume/tvl,
src/dao.ts:845-933) by re-aggregating a trailing window on a cadence;
a candle table can do strictly better because a candle is a MERGEABLE
aggregate (operators/timeseries.py): the maintained state per
(event_type, hour) is a partial candle carrying the open/close
ordering keys, and each micro-batch folds in with one merge —

    state' = ohlc_merge(state ∪ unit_candles(batch))

restricted to the buckets the batch touches. No window re-aggregation,
no late-data cliff: a late row for ANY historical hour merges exactly
(the ordering keys make open/close order-independent), which a
recompute-the-tail scheme only gets within its window.

State layout mirrors streaming/incremental.py: parquet partitioned by
``bucket = pmod(xxhash64(event_type, hour), N_BUCKETS)``; a batch
rewrites only affected buckets via staging + per-bucket os.replace.
Equivalence (tests/test_streaming_ohlc.py): after any batch split,
``read_state`` equals the batch ``ohlc_hourly`` over the union — the
merge-algebra identity pinned end to end. Epoch markers make
at-least-once replay a no-op (shared epochs.epoch_idempotent).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import (
    OHLC_KEY,
    OHLC_PUBLIC_COLS,
    OHLC_STATE_COLS,
    ohlc_merge,
    unit_candles,
)
from .epochs import epoch_idempotent

N_BUCKETS = 16


def _bucket(*cols) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(N_BUCKETS)).cast("int")


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained candle table, public columns (equals the batch
    ohlc_hourly over every row folded in so far)."""
    if not os.path.isdir(state_dir) or not any(
        d.startswith("bucket=") for d in os.listdir(state_dir)
    ):
        schema = (
            "event_type string, hour timestamp, open double, high double,"
            " low double, close double, volume_cents bigint, n_events bigint"
        )
        return spark.createDataFrame([], schema)
    return spark.read.parquet(state_dir).select(*OHLC_KEY, *OHLC_PUBLIC_COLS)


def apply_batch(spark: SparkSession, events: DataFrame, state_dir: str) -> None:
    """Fold one batch of event rows into the candle state."""
    partial = ohlc_merge(unit_candles(events)).withColumn(
        "bucket", _bucket(*OHLC_KEY)
    )
    partial = partial.cache()
    affected = [r["bucket"] for r in partial.select("bucket").distinct().collect()]
    if not affected:
        partial.unpersist()
        return

    have_state = os.path.isdir(state_dir) and any(
        d == f"bucket={b}" for b in affected for d in os.listdir(state_dir)
    )
    if have_state:
        state = spark.read.parquet(state_dir).filter(F.col("bucket").isin(affected))
        merged = ohlc_merge(
            state.select(*OHLC_KEY, *OHLC_STATE_COLS).unionByName(
                partial.select(*OHLC_KEY, *OHLC_STATE_COLS)
            )
        )
    else:
        merged = partial.select(*OHLC_KEY, *OHLC_STATE_COLS)
    merged = merged.withColumn("bucket", _bucket(*OHLC_KEY)).cache()

    # rewrite affected buckets via staging + per-bucket swap (same
    # pattern and rationale as streaming/incremental.py)
    staging = state_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    os.makedirs(state_dir, exist_ok=True)
    for b in affected:
        live = os.path.join(state_dir, f"bucket={b}")
        shutil.rmtree(live, ignore_errors=True)
        staged = os.path.join(staging, f"bucket={b}")
        if os.path.isdir(staged):
            os.replace(staged, live)
    shutil.rmtree(staging, ignore_errors=True)
    merged.unpersist()
    partial.unpersist()


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """Structured Streaming driver: event rows arriving in feed_dir
    fold into the candle state per micro-batch, epoch-marker
    idempotent."""
    reader = spark.readStream
    reader = reader.schema(
        schema if schema is not None else spark.read.parquet(feed_dir).schema
    )
    stream = reader.parquet(feed_dir)
    process = epoch_idempotent(
        state_dir,
        checkpoint_dir,
        lambda batch_df, _epoch: apply_batch(spark, batch_df, state_dir),
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
