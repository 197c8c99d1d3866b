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

State writes use the staging-then-swap pattern (write fully, then one
os.replace) so a crash never leaves a half-written count table; an
epoch marker makes foreachBatch's at-least-once replay a no-op.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.pipeline_drift import tvd_from_counts

DEFAULT_ALERT_PPM = 200_000  # alert when TVD >= 0.2


def recover(state_dir: str) -> None:
    """Heal a crash mid-swap: if the live dir is missing but the
    ``._old`` generation exists, the crash landed between the two
    os.replace calls — restore the old generation. If BOTH exist, the
    crash landed after the swap completed — the old generation is
    superseded trash (the same two branches as
    maintenance.recover_bucket_swaps).

    Called by the WRITER (apply_batch entry) and at process startup —
    deliberately NOT by the read path: a reader running destructive
    recovery would race a live writer mid-swap (restoring the old
    generation between the writer's two os.replace calls makes the
    second replace fail on a non-empty destination)."""
    live = os.path.join(state_dir, "counts")
    trash = os.path.join(state_dir, "counts._old")
    if os.path.isdir(trash):
        if os.path.isdir(live):
            shutil.rmtree(trash)
        else:
            os.replace(trash, live)


def read_counts(spark: SparkSession, state_dir: str) -> DataFrame | None:
    live = os.path.join(state_dir, "counts")
    if not os.path.isdir(live):
        return None
    return spark.read.parquet(live)


def drift_table(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current per-source TVD drift derived from the maintained counts."""
    cnt = read_counts(spark, state_dir)
    return None if cnt is None else tvd_from_counts(cnt)


def alerts(spark: SparkSession, state_dir: str, threshold_ppm: int = DEFAULT_ALERT_PPM):
    d = drift_table(spark, state_dir)
    return None if d is None else d.filter(F.col("tvd_ppm") >= threshold_ppm)


def _applied_epoch_token(counts_dir: str) -> str | None:
    """The epoch token recorded inside the live count state, if any.

    Stored as ``_epoch`` inside the parquet directory: Spark ignores
    underscore-prefixed files, and because the token is written into
    STAGING before the swap, ``os.replace`` is the atomic commit point
    for (counts, epoch) together — a crash between the swap and the
    outer epoch-marker write can no longer double-apply the batch."""
    try:
        with open(os.path.join(counts_dir, "_epoch")) as f:
            return f.read().strip()
    except OSError:
        return None


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one batch of (source, lang) rows into the count state.

    ``epoch_token`` (checkpoint-namespace-qualified epoch id) makes the
    fold idempotent on its own: if the live state already records this
    token, the batch was fully committed by a previous attempt whose
    crash landed after the swap but before the caller's epoch marker —
    skip instead of double-counting."""
    recover(state_dir)  # single-writer: heal any mid-swap crash first
    live = os.path.join(state_dir, "counts")
    if epoch_token is not None and _applied_epoch_token(live) == epoch_token:
        return
    delta = batch.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    old = read_counts(spark, state_dir)
    merged = (
        delta
        if old is None
        else old.unionByName(delta)
        .groupBy("source", "lang")
        .agg(F.sum("c").alias("c"))
    )
    staging = os.path.join(state_dir, "counts._staging")
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").parquet(staging)
    if epoch_token is not None:
        with open(os.path.join(staging, "_epoch"), "w") as f:
            f.write(epoch_token)
    trash = os.path.join(state_dir, "counts._old")
    shutil.rmtree(trash, ignore_errors=True)
    if os.path.isdir(live):
        os.replace(live, trash)
    os.replace(staging, live)
    shutil.rmtree(trash, ignore_errors=True)


def stream_monitor(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """Structured Streaming driver: document rows arriving in feed_dir
    update the count state per micro-batch (epoch-marker + in-state
    token idempotent; scaffolding shared via
    state_table.stream_maintain_with — the drift state itself stays a
    single-directory staging swap, already atomic on its own)."""
    from .state_table import stream_maintain_with

    return stream_maintain_with(
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
