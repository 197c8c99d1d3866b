"""Streaming isotonic-calibration maintenance: the per-score label
counts as ONE additive state table; the PAV fit derives at read time.

The isotonic fit's sufficient statistic is the DISTINCT-score relation
(score_micro, w, pos) — per-doc scores partition cleanly across
micro-batches, so (w, pos) are purely additive and the state after any
stream prefix EQUALS the batch aggregate over the rows seen so far
(same mergeable-state fold as the NB model and the decontamination
index). The fit itself — equal-width binning from the state's min/max
plus the minimax PAV — is NOT maintained incrementally: bin edges move
as new score extremes arrive, and PAV pools are global, so the honest
incremental unit is the count relation, with the fit recomputed at
read time over the (tiny) distinct-score state. That recomputation is
bin-relation-sized (<= 256 bins, 65k grid rows) regardless of how many
documents folded — the same "heavy pass is incremental, cheap tail is
recomputed" split the drift monitors use for their KS statistic.

Deployment shape at 100 TB: the labeled scoring feed trains the
calibrator continuously; any filter job reads the current generation
and broadcasts the <=256-row calibration table to map scored documents
onto calibrated keep-probabilities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.pipeline_calibration import (
    doc_scores,
    isotonic_fit_from_score_counts,
    score_counts,
)
from . import state_table

N_BUCKETS = 8

_EMPTY_DDL = "score bigint, w bigint, pos bigint"
_KEY = ["score"]


def _bucket(*cols) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(N_BUCKETS)).cast("int")


def _merge(df: DataFrame) -> DataFrame:
    return df.groupBy("score").agg(
        F.sum("w").cast("bigint").alias("w"),
        F.sum("pos").cast("bigint").alias("pos"),
    )


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one batch of (doc_id, lang, text) rows into the per-score
    label counts. Docs are assumed exactly-once across epochs."""
    state_table.merge_batch(
        spark,
        state_dir,
        score_counts(doc_scores(docs)),
        _merge,
        _KEY,
        ["w", "pos"],
        _bucket(*_KEY),
        _EMPTY_DDL,
        token=epoch_token,
    )


def read_score_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained (score, w, pos) relation — equals
    score_counts(doc_scores(all rows folded so far))."""
    return state_table.read_state(spark, state_dir, _EMPTY_DDL).select(
        "score", "w", "pos"
    )


def read_calibration(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current isotonic fit over the maintained counts — identical
    output (and math) to the registered isotonic_calibration query
    once the same rows have folded."""
    return isotonic_fit_from_score_counts(read_score_counts(spark, state_dir))


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
):
    """Structured Streaming driver: labeled document rows arriving in
    ``feed_dir`` extend the score counts per micro-batch (shared
    state_table.stream_maintain_with scaffolding)."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        state_dir,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark, batch_df, state_dir, epoch_token=token
        ),
        schema=schema,
        select_cols=["doc_id", "lang", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
