"""Streaming weighted sample maintenance: an exact-k weight-
proportional without-replacement sample of an UNBOUNDED document feed,
held current in O(k) state.

Efraimidis-Spirakis keys make weighted sampling MERGEABLE: each doc's
key is a deterministic pure function of (doc_id, weight)
(queries/pipeline_corpus._es_sample_key_col — the md5 max-draw form),
and the sample is simply the top-k docs by key. Top-k is a mergeable
aggregate as long as the full top-k set is retained:

    topk(A ∪ B) = topk(topk(A) ∪ topk(B))

so the maintained state is k rows, each micro-batch contributes its own
top-k candidates, and the merge is one window over <= 2k rows. After
ANY prefix of the stream the state equals the batch
``weighted_sample_topk`` over the rows seen so far, exactly
(tests/test_streaming_es_sample.py).

This is the streaming form of reservoir sampling a 100 TB feed needs —
no RNG state, no per-row sequential dependency (the classic Algorithm R
is order-dependent and unmergeable), replay-idempotent via the shared
epoch-token protocol, and the state is k rows regardless of feed size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..queries.pipeline_corpus import WSAMPLE_K, _es_sample_key_col
from . import state_table

_EMPTY_DDL = "doc_id bigint, source string, weight bigint, sample_key string"
_KEY = ["doc_id"]


def _bucket(*_cols) -> Column:
    # k rows of state: one bucket is the right physical layout
    return F.lit(0).cast("int")


def _top_k(df: DataFrame) -> DataFrame:
    w = W.orderBy(F.col("sample_key").desc(), "doc_id")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= WSAMPLE_K)
        .drop("__rn")
    )


def batch_candidates(docs: DataFrame) -> DataFrame:
    """A batch's top-k contribution (same key derivation as the batch
    query — the two cannot diverge). orderBy().limit(), not a global
    window: TakeOrdered keeps per-partition heaps and never funnels the
    batch through one task (the window form would); the tiny merge
    window in ``_top_k`` is reserved for the <= 2k-row state union."""
    keyed = docs.select(
        "doc_id",
        "source",
        (F.lit(1) + F.least(F.expr("n_chars div 80"), F.lit(7)))
        .cast("bigint")
        .alias("weight"),
    ).withColumn("sample_key", _es_sample_key_col())
    return keyed.orderBy(F.col("sample_key").desc(), "doc_id").limit(WSAMPLE_K)


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    epoch_token: str | None = None,
) -> None:
    state_table.merge_batch(
        spark,
        state_dir,
        batch_candidates(docs),
        _top_k,
        _KEY,
        ["source", "weight", "sample_key"],
        _bucket(),
        _EMPTY_DDL,
        token=epoch_token,
    )


def read_sample(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained sample — equals weighted_sample_topk over every
    row folded so far."""
    return state_table.read_state(spark, state_dir, _EMPTY_DDL).select(
        "doc_id", "source", "weight", "sample_key"
    )


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
):
    """Structured Streaming driver: document rows arriving in feed_dir
    keep the weighted sample current per micro-batch (shared
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
        select_cols=["doc_id", "source", "n_chars"],
        max_files_per_trigger=max_files_per_trigger,
    )
