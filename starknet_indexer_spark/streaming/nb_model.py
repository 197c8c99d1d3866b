"""Streaming Naive-Bayes model maintenance: online training of the
learned-filter classifier as ONE additive state table.

The NB sufficient statistics — per-class token-feature counts and doc
counts (queries/pipeline_classifier.nb_count_partials) — are purely
ADDITIVE, so "training on a stream" is the same mergeable-state fold
the OHLC candles and the drift histograms use: per micro-batch,
aggregate the batch's (c, f, cnt) partials and sum them into the
affected buckets of the live generation (state_table generation dirs,
epoch-token idempotent replay). No gradient steps, no epochs — the
model after any prefix of the stream IS the batch-trained model over
the rows seen so far, exactly (tests/test_streaming_nb.py pins
stream == batch for the counts AND for the downstream confusion
matrix).

At 100 TB this is the deployed shape for count-based filter models:
the labeled feed trains continuously; scoring jobs broadcast
``read_model``'s weight table (features x classes — tiny) against any
corpus. Contrast with ensure_ivfpq_codebooks (offline artifact,
refreshed on drift): counting models are cheap enough to keep
perpetually current.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.pipeline_classifier import (
    nb_confusion_from_counts,
    nb_count_partials,
    nb_features,
)
from . import state_table

N_BUCKETS = 8

_EMPTY_DDL = "c string, f bigint, cnt bigint"
_KEY = ["c", "f"]


def _bucket(*cols) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(N_BUCKETS)).cast("int")


def _merge(df: DataFrame) -> DataFrame:
    return df.groupBy("c", "f").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one batch of (doc_id, lang, text) rows into the model
    counts. Docs are assumed exactly-once across epochs (the epoch
    marker + token protocol absorbs replays of the SAME batch)."""
    state_table.merge_batch(
        spark,
        state_dir,
        nb_count_partials(nb_features(docs)),
        _merge,
        _KEY,
        ["cnt"],
        _bucket(*_KEY),
        _EMPTY_DDL,
        token=epoch_token,
    )


def read_model(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained (c, f, cnt) count relation — equals
    nb_count_partials(nb_features(all rows folded so far))."""
    return state_table.read_state(spark, state_dir, _EMPTY_DDL).select(
        "c", "f", "cnt"
    )


def confusion(
    spark: SparkSession, state_dir: str, docs: DataFrame
) -> DataFrame:
    """Score ``docs`` with the stream-trained model: identical math to
    the registered nb_lang_classifier query, counts swapped for the
    maintained state."""
    return nb_confusion_from_counts(
        read_model(spark, state_dir), nb_features(docs)
    )


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
):
    """Structured Streaming driver: labeled document rows arriving in
    ``feed_dir`` train the model per micro-batch (shared
    state_table.stream_maintain_with scaffolding — epoch-marker +
    in-generation token idempotence)."""
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
