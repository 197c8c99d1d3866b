"""Streaming distribution-drift monitor: the online twin of
``tvd_drift_by_source``.

A continuously-ingesting corpus needs the drift alarm to fire as
batches land, not at the next full scan. The monitor maintains the
(source, lang) count relation incrementally — the sufficient statistic
for TVD — and re-derives each source's exact total-variation distance
against the rest of the corpus after every micro-batch. Because the
state is the COUNTS (bounded by #sources x #categories, independent of
corpus size), the per-batch cost is one map-side-combined agg of the
batch plus constant-size state arithmetic: at 100 TB the monitor costs
the same as at 100 MB once the batch is counted.

Equivalence (tests/test_streaming_drift.py): after any sequence of
batches, the monitor's drift table is value-identical to running the
batch ``tvd_drift_by_source`` computation over the union of all
batches — the same incremental==recompute oracle the other maintained
states in this package carry.

State lives in a ``state_table`` generation (VERDICT r8 mandate #7 —
this module previously hand-rolled a staging-then-swap protocol; the
shared generation-pointer table gives the same atomicity with one
implementation): commits are an atomic CURRENT-pointer flip, the epoch
token rides INSIDE the generation so a crash between the flip and the
outer epoch marker cannot double-count a replayed batch, and crash
recovery is state_table.recover's orphan-generation sweep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.pipeline_drift import psi_from_counts, tvd_from_counts
from . import state_table

DEFAULT_ALERT_PPM = 200_000  # alert when TVD >= 0.2

#: count state is tiny (#sources x #langs); a handful of buckets keeps
#: the generation layout uniform with the corpus-sized states
N_BUCKETS = 4

_EMPTY_DDL = "source string, lang string, c bigint"
_KEY = ["source", "lang"]


def _bucket() -> Column:
    return F.pmod(F.xxhash64("source", "lang"), F.lit(N_BUCKETS)).cast("int")


def _merge(df: DataFrame) -> DataFrame:
    return df.groupBy("source", "lang").agg(
        F.sum("c").cast("bigint").alias("c")
    )


def recover(state_dir: str) -> None:
    """Heal a crashed commit: delete generations the CURRENT pointer
    does not reference (state_table.recover). Called by the writer
    entry (merge_batch does this internally) and at process startup —
    deliberately NOT by the read path: readers resolve the pointer to
    a complete, immutable generation and never mutate."""
    state_table.recover(state_dir)


def read_counts(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The maintained (source, lang, c) counts; None before the first
    committed generation."""
    if state_table.current_gen_dir(state_dir) is None:
        return None
    return state_table.read_state(spark, state_dir, _EMPTY_DDL).select(
        "source", "lang", "c"
    )


def drift_table(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current per-source TVD drift derived from the maintained counts."""
    cnt = read_counts(spark, state_dir)
    return None if cnt is None else tvd_from_counts(cnt)


def alerts(spark: SparkSession, state_dir: str, threshold_ppm: int = DEFAULT_ALERT_PPM):
    d = drift_table(spark, state_dir)
    return None if d is None else d.filter(F.col("tvd_ppm") >= threshold_ppm)


def psi_table(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current per-source PSI drift derived from the SAME maintained
    count state (the sufficient statistic is shared across KS/TVD/PSI;
    only the read-time functional differs)."""
    cnt = read_counts(spark, state_dir)
    return None if cnt is None else psi_from_counts(cnt)


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one batch of (source, lang) rows into the count state.

    ``epoch_token`` (checkpoint-namespace-qualified epoch id) makes the
    fold idempotent on its own: the token commits atomically WITH the
    counts (inside the generation), so a crash after the pointer flip
    but before the caller's epoch marker cannot double-count the
    replayed batch — merge_batch short-circuits on the applied token."""
    delta = batch.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    state_table.merge_batch(
        spark,
        state_dir,
        delta,
        _merge,
        _KEY,
        ["c"],
        _bucket(),
        _EMPTY_DDL,
        token=epoch_token,
    )


def stream_monitor(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """Structured Streaming driver: document rows arriving in feed_dir
    update the count state per micro-batch (epoch-marker + in-generation
    token idempotent; scaffolding shared via
    state_table.stream_maintain_with)."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        state_dir,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark, batch_df, state_dir, epoch_token=token
        ),
        schema=schema,
        select_cols=["source", "lang"],
    )
