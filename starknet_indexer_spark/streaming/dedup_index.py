"""Continuously-maintained MinHash+LSH dedup index.

Operationalizes the incremental dedup query
(queries/pipeline_dedup.minhash_dedup_incremental) as a long-running
stream: every micro-batch of documents is

1. compared WITHIN itself (the batch's own LSH band self-join),
2. probed AGAINST the band index of everything previously ingested
   (batch side broadcast — the corpus index is never shuffled), and
3. appended to the index (bands) and the shingle store (verify side),

so each near-duplicate pair is discovered exactly once: both docs in
one batch -> found by (1); docs in different batches -> found by (2)
when the later one arrives. The union over all batches equals the
full-corpus ``minhash_lsh_dedup`` recompute — the same
incremental-vs-recompute equivalence the reference maintains for its
trigger-fed ledger (src/dao.ts:510-515), tested in
tests/test_dedup_index.py.

Scale layout: at 100 TB the band index is parquet bucketed on
``xxhash64(band_key)`` and the shingle store on ``doc_id`` (the same
bucket-pruned rewrite strategy as streaming/incremental.py); a
micro-batch probe then touches only the band buckets it hashes into.
The test-scale implementation appends flat parquet — the join shapes
(broadcast probe, candidate-pruned verify) are identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    lsh_candidate_pairs,
    md5_hash60_expr,
    minhash_bands,
    minhash_signature_exprs,
    tokens_expr,
    word_shingles_expr,
)
from ..queries.pipeline_dedup import JACCARD_MIN
_BANDS = "bands"
_SHINGLES = "shingles"


def _relations(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) for one batch of (doc_id, text) rows."""
    toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
    sh = toks.filter(F.size("tokens") >= 3).select(
        "doc_id", word_shingles_expr(F.col("tokens")).alias("shingles")
    )
    hs = sh.select("doc_id", F.transform("shingles", md5_hash60_expr).alias("h"))
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


def apply_batch(
    spark: SparkSession, docs: DataFrame, index_dir: str, pairs_dir: str
) -> None:
    """Process one micro-batch: emit new near-dup pairs, then fold the
    batch into the index. Probe-before-append keeps pair discovery
    exactly-once (a batch never probes its own bands in the index)."""
    sh, bands = _relations(docs)
    sh = sh.cache()
    bands = bands.cache()
    bands_path = os.path.join(index_dir, _BANDS)
    sh_path = os.path.join(index_dir, _SHINGLES)

    # (1) within-batch pairs (a_id < b_id by construction)
    out = _verified(lsh_candidate_pairs(bands), sh, sh)

    # (2) batch-vs-index pairs; normalize to (min, max) id order
    if os.path.isdir(bands_path):
        idx_bands = spark.read.parquet(bands_path)
        idx_sh = spark.read.parquet(sh_path)
        probe = bands.select(
            F.col("doc_id").alias("new_id"), "band", "band_key"
        )
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
        cross_pairs = old_as_a.unionByName(old_as_b).distinct()
        out = out.unionByName(cross_pairs)

    out.write.mode("append").parquet(pairs_dir)

    # (3) fold the batch into the index. Shingles BEFORE bands: a
    # crash between the two appends must leave the index conservative
    # — orphan shingles are harmless (nothing probes them), while
    # orphan bands would make _verified's shingle join silently drop
    # those candidates on every future batch (missed near-dups).
    sh.write.mode("append").parquet(sh_path)
    bands.write.mode("append").parquet(bands_path)
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
    near-dup pairs land in ``pairs_dir``. ``max_files_per_trigger``
    bounds batch size (and forces genuine multi-batch behavior under
    test)."""
    # at-least-once redelivery guard (epoch markers under index_dir)
    # so pairs stay exactly-once discovered and the index holds one
    # row set per doc — shared stream_maintain_with scaffolding
    from . import state_table

    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        index_dir,
        checkpoint_dir,
        lambda batch_df, _token: apply_batch(spark, batch_df, index_dir, pairs_dir),
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )
