"""Incremental maintenance of the per-pool-per-tick liquidity ledger.

Reference: Postgres triggers keep ``per_pool_per_tick_liquidity_
incremental_view`` in O(1)-per-insert lockstep with its defining view
(src/dao.ts:517-647); delete-on-zero at 535-540; the table is seeded
*from* the view (510-515), which is the equivalence oracle this module
inherits as a test.

Spark has no triggers. The equivalent is a MERGE per micro-batch:

    state(pool, tick)  <-  state ⟗ batch_deltas, summed, zero-net dropped

State layout for 100 TB: parquet partitioned by
``bucket = pmod(xxhash64(pool_key_hash), N_BUCKETS)`` inside
generation directories (streaming/state_table.py). A micro-batch
touches only the buckets its pools hash into — the merge reads and
rewrites a bounded slice of state while unaffected buckets carry
forward as hardlinks, and one atomic CURRENT-pointer replace publishes
the generation: the parquet analogue of a Delta MERGE, commit point
included.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views.tick_liquidity import tick_liquidity_deltas
from . import state_table

N_BUCKETS = 16

_EMPTY_DDL = (
    "pool_key_hash decimal(38,0), tick int,"
    " net_liquidity_delta_diff decimal(38,0),"
    " total_liquidity_on_tick decimal(38,0)"
)
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
    return (
        state_table.read_state(spark, state_dir, _EMPTY_DDL)
        .select(*_KEY, *_MEASURES)
        .filter(F.col("net_liquidity_delta_diff") != 0)
    )


def _merge(rows: DataFrame) -> DataFrame:
    """Sum partials per key; drop rows carrying NO information (both
    measures zero). Deleting on net-zero alone would forget a live
    total: net can cross zero while positions still reference the
    tick, and a later delta must resume from the accumulated total
    (reference trigger deletes on TOTAL zero, src/dao.ts:535-561; the
    view's net!=0 filter is applied by read_state when serving)."""
    merged = rows.groupBy(*_KEY).agg(
        *[F.sum(m).alias(m) for m in _MEASURES]
    )
    return merged.filter(
        (F.col("net_liquidity_delta_diff") != 0)
        | (F.col("total_liquidity_on_tick") != 0)
    )


def apply_batch(
    spark: SparkSession,
    position_updates: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    """MERGE one batch of position_updates into the state table.

    Commits go through streaming/state_table.py: merged affected
    buckets land in a new generation (unaffected buckets hardlinked
    forward) published by one atomic CURRENT-pointer replace — the
    original per-bucket rmtree+rename swap had an unrecoverable
    mid-swap data-loss window (see state_table's module docstring)."""
    state_table.merge_batch(
        spark,
        state_dir,
        tick_liquidity_deltas(position_updates),
        _merge,
        _KEY,
        _MEASURES,
        _bucket(F.col("pool_key_hash")),
        _EMPTY_DDL,
        token=epoch_token,
    )


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """Structured Streaming driver: position_updates rows arriving in
    ``feed_dir`` are merged into the ledger per micro-batch.

    foreachBatch is at-least-once: the epoch marker makes the common
    replay a no-op, and the epoch token committed INSIDE the state
    generation (state_table) closes the residual window between the
    generation flip and the marker write. Scaffolding shared via
    state_table.stream_maintain_with."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        state_dir,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark, batch_df, state_dir, epoch_token=token
        ),
        schema=schema,
    )
