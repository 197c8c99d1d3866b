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

State commits go through streaming/state_table.py (generation dirs,
bucket = pmod(xxhash64(event_type, hour), N_BUCKETS), hardlinked
unaffected buckets, one atomic CURRENT-pointer flip — see that module
for the crash analysis). Equivalence (tests/test_streaming_ohlc.py):
after any batch split, ``read_state`` equals the batch ``ohlc_hourly``
over the union — the merge-algebra identity pinned end to end. Epoch
markers + the in-generation token make at-least-once replay a no-op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import (
    OHLC_KEY,
    OHLC_PUBLIC_COLS,
    OHLC_STATE_COLS,
    ohlc_merge,
    unit_candles,
)
from . import state_table

N_BUCKETS = 16

#: state_dirs already confirmed struct-keyed (migration probe memo)
_MIGRATED_DIRS: set[str] = set()

_EMPTY_DDL = (
    "event_type string, hour timestamp,"
    " open_ordk struct<off:bigint,eid:bigint>, open double,"
    " high double, low double,"
    " close_ordk struct<off:bigint,eid:bigint>, close double,"
    " volume_cents bigint, n_events bigint"
)


def _bucket(*cols) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(N_BUCKETS)).cast("int")


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained candle table, public columns (equals the batch
    ohlc_hourly over every row folded in so far)."""
    return state_table.read_state(spark, state_dir, _EMPTY_DDL).select(
        *OHLC_KEY, *OHLC_PUBLIC_COLS
    )


def migrate_legacy_ordk_state(spark: SparkSession, state_dir: str) -> bool:
    """One-time upgrade of a state_dir written by the pre-struct kernel.

    The old ordering key folded (offset_us, event_id) into ONE BIGINT as
    ``offset_us * 1e6 + event_id`` (valid only below event_id 1e6 — the
    reason the kernel moved to a struct). The fold is invertible inside
    its validity range, so instead of crash-looping on the
    unionByName type mismatch (bigint vs struct) the first post-upgrade
    batch converts the live generation in place: ``off = ordk div 1e6``,
    ``eid = ordk % 1e6``, committed as a new generation carrying the
    SAME epoch token (replay semantics unchanged). Returns True when a
    migration ran."""
    # ADVICE r7: the dtype probe (a parquet read + schema inspection of
    # the live generation) ran on EVERY micro-batch, long after any
    # migration completed. Once a state_dir is observed non-legacy it
    # can never become legacy again within this process (only this
    # module writes it, always struct-keyed), so memoize per state_dir.
    if state_dir in _MIGRATED_DIRS:
        return False
    d = state_table.current_gen_dir(state_dir)
    if d is None:
        # empty state: nothing to migrate, and the first merge writes
        # struct-keyed rows — safe to memoize
        _MIGRATED_DIRS.add(state_dir)
        return False
    df = spark.read.parquet(d)
    if dict(df.dtypes).get("open_ordk") != "bigint":
        _MIGRATED_DIRS.add(state_dir)
        return False

    def unfold(col: str):
        # integer DIV, not float division: a double quotient near the
        # boundary could truncate off-by-one after the cast
        return F.struct(
            F.expr(f"{col} DIV 1000000").cast("bigint").alias("off"),
            F.pmod(F.col(col), F.lit(1_000_000)).cast("bigint").alias("eid"),
        )

    conv = df.select(
        *OHLC_KEY,
        unfold("open_ordk").alias("open_ordk"),
        "open",
        "high",
        "low",
        unfold("close_ordk").alias("close_ordk"),
        "close",
        "volume_cents",
        "n_events",
        "bucket",
    )
    affected = [r["bucket"] for r in df.select("bucket").distinct().collect()]
    state_table.commit_generation(
        state_dir, conv, affected=affected, token=state_table.applied_token(state_dir)
    )
    _MIGRATED_DIRS.add(state_dir)
    return True


def apply_batch(
    spark: SparkSession,
    events: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one batch of event rows into the candle state.

    State commits go through streaming/state_table.py: the merged
    affected buckets land in a new generation (unaffected buckets
    hardlinked forward) and one atomic CURRENT-pointer replace
    publishes them — no crash point can lose a bucket or double-apply
    a replayed epoch (the token commits with the generation)."""
    migrate_legacy_ordk_state(spark, state_dir)
    state_table.merge_batch(
        spark,
        state_dir,
        ohlc_merge(unit_candles(events)),
        ohlc_merge,
        OHLC_KEY,
        OHLC_STATE_COLS,
        _bucket(*OHLC_KEY),
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
    """Structured Streaming driver: event rows arriving in feed_dir
    fold into the candle state per micro-batch, epoch-marker + token
    idempotent (shared state_table.stream_maintain_with scaffolding)."""
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
