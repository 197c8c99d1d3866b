"""Continuously-maintained CDC chunk-hash ledger (VERDICT r10 #5).

Operationalizes the batch storage-dedup estimator
(queries/pipeline_cdc.cdc_chunk_dedup) as per-corpus maintained state:
a storage pipeline folds each document micro-batch once, and the
current savings ledger — total vs unique chunk bytes, achievable
dedup savings — is readable at any moment without re-chunking the
corpus. This is exactly the per-corpus state the dedup-index protocol
(streaming/dedup_index.py) carries for near-dup pairs, applied to the
rsync/LBFS chunk layer.

State layout (generation-pointer tables, streaming/state_table.py):

- ``root/chunks``: (chunk_hash, n_copies, chunk_len) keyed by
  chunk_hash, bucketed on xxhash64(chunk_hash) — merge = SUM(n_copies)
  + MAX(chunk_len), the same per-hash relation the batch query
  aggregates;
- ``root/seen_docs``: (doc_id) keyed by doc_id — the novelty guard.
  Chunk counts are ADDITIVE (unlike the pair indexes, whose outputs
  dedup by key), so a document redelivered in a LATER epoch would
  double-count its chunks; the anti-join against seen_docs absorbs it
  (same-epoch replays are absorbed by each state's token guard).

Fold order per batch: chunks BEFORE seen_docs. A crash between the two
leaves the replay safe: the chunks merge short-circuits on its epoch
token while the seen_docs fold completes. The reverse order would be
lossy — a replayed batch would anti-join against a seen_docs that
already contains it and never fold its chunks.

Equality contract (tests/test_cdc_ledger.py): after any batch split of
a corpus, ``ledger`` == the batch ``cdc_chunk_dedup`` query on the
same corpus — the final aggregate is literally the same function
(pipeline_cdc.storage_ledger). Stream restart over the same checkpoint
is a no-op.

Scale shape: the chunker is the batch query's Arrow-batched map-only
kernel over the BATCH only; the fold's single shuffle is the per-hash
aggregate bounded by the batch's unique content; the merge touches
only the state buckets the batch's hashes land in. The read-time
ledger is one tiny agg over the chunk relation (hashes + two ints —
never text), so it tracks unique corpus content, not corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.pipeline_cdc import _cdc_chunks, storage_ledger
from . import state_table

N_BUCKETS = 8

_CHUNKS = "chunks"
_SEEN = "seen_docs"
_CHUNKS_DDL = "chunk_hash string, n_copies bigint, chunk_len bigint"
_SEEN_DDL = "doc_id bigint"


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one (doc_id, text) micro-batch into the chunk ledger."""
    chunks_state = os.path.join(root, _CHUNKS)
    seen_state = os.path.join(root, _SEEN)
    if epoch_token is not None and (
        state_table.applied_token(chunks_state) == epoch_token
        and state_table.applied_token(seen_state) == epoch_token
    ):
        return

    seen = state_table.read_state(spark, seen_state, _SEEN_DDL).select("doc_id")
    # novelty guard: in-batch duplicates collapse to one copy (a feed
    # row is a document version, not an occurrence), and docs already
    # folded in an earlier epoch are excluded — chunk counts are
    # additive, so this is what makes redelivery safe across epochs
    # partitioning note: the feed batch arrives as one file -> one scan
    # task, but dropDuplicates shuffles to the session's shuffle
    # partitions, so the chunker downstream already runs wide — no
    # extra rebalance needed (contrast silver.spread in the map-only
    # index folds)
    novel = (
        docs.select("doc_id", "text")
        .dropDuplicates(["doc_id"])
        .join(seen, "doc_id", "left_anti")
        .cache()
    )
    try:
        per_hash = _cdc_chunks(novel).groupBy("chunk_hash").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.max("chunk_len").cast("bigint").alias("chunk_len"),
        )
        state_table.merge_batch(
            spark,
            chunks_state,
            per_hash,
            lambda df: df.groupBy("chunk_hash").agg(
                F.sum("n_copies").cast("bigint").alias("n_copies"),
                F.max("chunk_len").cast("bigint").alias("chunk_len"),
            ),
            ["chunk_hash"],
            ["n_copies", "chunk_len"],
            F.pmod(F.xxhash64("chunk_hash"), F.lit(N_BUCKETS)).cast("int"),
            _CHUNKS_DDL,
            token=epoch_token,
        )
        state_table.merge_batch(
            spark,
            seen_state,
            novel.select("doc_id"),
            lambda df: df.dropDuplicates(["doc_id"]),
            ["doc_id"],
            [],
            F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("int"),
            _SEEN_DDL,
            token=epoch_token,
        )
    finally:
        novel.unpersist()


def per_hash(spark: SparkSession, root: str) -> DataFrame:
    """Current (chunk_hash, n_copies, chunk_len) relation."""
    return state_table.read_state(
        spark, os.path.join(root, _CHUNKS), _CHUNKS_DDL
    ).select("chunk_hash", "n_copies", "chunk_len")


def ledger(spark: SparkSession, root: str) -> DataFrame:
    """Current storage ledger — the batch ``cdc_chunk_dedup`` output
    derived from maintained state (same aggregate function)."""
    return storage_ledger(per_hash(spark, root))


def stream_cdc_ledger(
    spark: SparkSession,
    feed_dir: str,
    root: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` maintain the chunk ledger per micro-batch; read the
    current savings any time via ``ledger``."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        root,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(spark, batch_df, root, epoch_token=token),
        schema=schema,
        select_cols=["doc_id", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
