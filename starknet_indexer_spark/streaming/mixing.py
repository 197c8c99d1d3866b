"""Streaming mixing-allocation maintenance: per-source token counts
as ONE additive state table; the temperature-scaled budget derives at
read time.

The data-mixing recipe (temperature_mix_allocation — n_i^0.5 weights,
largest-remainder integer apportionment) depends on the corpus only
through per-source token counts, which are purely additive across
micro-batches. So the live mixing dashboard a pretraining run
consults ("how does the budget shift as the new crawl lands?") is a
maintained count state plus a source-cardinality-sized read-time
derivation — the same shared-sufficient-statistic split as the drift
monitors (counts incremental, functional recomputed) and the isotonic
calibrator. Fold cost per batch: one map-side-combined token count
over the batch, a merge touching at most #sources state rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens_expr
from ..queries.pipeline_quality import mix_allocation_from_counts
from . import state_table

N_BUCKETS = 4

_EMPTY_DDL = "source string, n_tokens bigint"
_KEY = ["source"]


def _bucket(*cols) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(N_BUCKETS)).cast("int")


def _merge(df: DataFrame) -> DataFrame:
    return df.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("n_tokens")
    )


def _token_partials(docs: DataFrame) -> DataFrame:
    return (
        docs.filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one batch of (source, text) rows into the per-source token
    counts. Docs are assumed exactly-once across epochs."""
    state_table.merge_batch(
        spark,
        state_dir,
        _token_partials(docs),
        _merge,
        _KEY,
        ["n_tokens"],
        _bucket(*_KEY),
        _EMPTY_DDL,
        token=epoch_token,
    )


def read_token_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained (source, n_tokens) relation."""
    return state_table.read_state(spark, state_dir, _EMPTY_DDL).select(
        "source", "n_tokens"
    )


def read_allocation(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current temperature-scaled token budget — identical output
    (and math) to the registered temperature_mix_allocation query once
    the same rows have folded."""
    return mix_allocation_from_counts(read_token_counts(spark, state_dir))


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` extend the token counts per micro-batch."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        state_dir,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark, batch_df, state_dir, epoch_token=token
        ),
        schema=schema,
        select_cols=["doc_id", "source", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
