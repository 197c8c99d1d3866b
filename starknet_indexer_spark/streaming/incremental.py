"""Incremental maintenance of the per-pool-per-tick liquidity ledger.

Reference: Postgres triggers keep ``per_pool_per_tick_liquidity_
incremental_view`` in O(1)-per-insert lockstep with its defining view
(src/dao.ts:517-647); delete-on-zero at 535-540; the table is seeded
*from* the view (510-515), which is the equivalence oracle this module
inherits as a test.

Spark has no triggers. The equivalent is a MERGE per micro-batch:

    state(pool, tick)  <-  state ⟗ batch_deltas, summed, zero-net dropped

State layout for 100 TB: parquet partitioned by
``bucket = pmod(xxhash64(pool_key_hash), N_BUCKETS)``. A micro-batch
touches only the buckets its pools hash into, so the merge reads and
rewrites a bounded slice of state — the parquet analogue of a Delta
MERGE touching matched files only. The full outer join is per-bucket
and both sides are partitioned by the same key, so at scale the join
shuffles only the (small) batch side once bucket pruning has done its
work.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views.tick_liquidity import tick_liquidity_deltas
from .epochs import epoch_idempotent

N_BUCKETS = 16
_KEY = ["pool_key_hash", "tick"]
_MEASURES = ["net_liquidity_delta_diff", "total_liquidity_on_tick"]


def _bucket(col) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained ledger (equals the V2 view over all ingested
    position_updates). The view's ``net != 0`` filter is applied at
    READ time: the state itself retains zero-net rows whose total is
    nonzero (the reference trigger does the same, deleting only on
    total zero, src/dao.ts:535-561) so a later delta at that tick
    resumes from the true running total instead of from scratch."""
    if not os.path.isdir(state_dir) or not any(
        d.startswith("bucket=") for d in os.listdir(state_dir)
    ):
        schema = "pool_key_hash decimal(38,0), tick int, net_liquidity_delta_diff decimal(38,0), total_liquidity_on_tick decimal(38,0)"
        return spark.createDataFrame([], schema)
    return (
        spark.read.parquet(state_dir)
        .drop("bucket")
        .filter(F.col("net_liquidity_delta_diff") != 0)
    )


def apply_batch(spark: SparkSession, position_updates: DataFrame, state_dir: str) -> None:
    """MERGE one batch of position_updates into the state table."""
    deltas = tick_liquidity_deltas(position_updates).withColumn(
        "bucket", _bucket(F.col("pool_key_hash"))
    )
    deltas = deltas.cache()
    affected = [r["bucket"] for r in deltas.select("bucket").distinct().collect()]
    if not affected:
        deltas.unpersist()
        return

    have_state = os.path.isdir(state_dir) and any(
        d == f"bucket={b}" for b in affected for d in os.listdir(state_dir)
    )
    if have_state:
        state = spark.read.parquet(state_dir).filter(F.col("bucket").isin(affected))
        merged = (
            state.select(*_KEY, *_MEASURES)
            .unionByName(deltas.select(*_KEY, *_MEASURES))
            .groupBy(*_KEY)
            .agg(*[F.sum(m).alias(m) for m in _MEASURES])
        )
    else:
        merged = deltas.select(*_KEY, *_MEASURES)
    # state retention: drop a row only when it carries NO information
    # (both measures zero). Deleting on net-zero alone would forget a
    # live total: net can cross zero while positions still reference
    # the tick, and a later delta must resume from the accumulated
    # total (reference trigger deletes on TOTAL zero,
    # src/dao.ts:535-561; the view's net!=0 filter is applied by
    # read_state when serving).
    merged = (
        merged.filter(
            (F.col("net_liquidity_delta_diff") != 0)
            | (F.col("total_liquidity_on_tick") != 0)
        )
        .withColumn("bucket", _bucket(F.col("pool_key_hash")))
        .cache()
    )
    survivors = {r["bucket"] for r in merged.select("bucket").distinct().collect()}

    # rewrite affected buckets via staging dir + atomic-ish swap: write
    # everything first, move partition dirs into place only after the
    # full write succeeded (Delta would make this a single txn)
    staging = state_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    if survivors:
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
    deltas.unpersist()


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """Structured Streaming driver: position_updates rows arriving in
    ``feed_dir`` are merged into the ledger per micro-batch.

    foreachBatch is at-least-once: if the streaming checkpoint commit
    fails AFTER process() succeeded, the same epoch is re-delivered on
    restart — and an additive merge would double-count it. An
    epoch-marker file written after each successful apply makes the
    common replay case a no-op. The remaining window (crash between
    the bucket swap and the marker write) is the multi-file
    transactionality a table format (Delta/Iceberg MERGE) closes; with
    plain parquet directories it is documented, not eliminated."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.schema(spark.read.parquet(feed_dir).schema)
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
