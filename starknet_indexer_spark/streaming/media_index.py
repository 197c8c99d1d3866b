"""Continuously-maintained perceptual-hash (pHash) media near-dup
index, and the derived online cross-modal audit.

The text side of the dedup stack already streams (the MinHash LSH
index in streaming/dedup_index.py); this module is the MEDIA twin, so
the cross-modal consistency audit (queries/pipeline_multimodal.
cross_modal_dedup_audit — "text says duplicate, media says distinct")
is derivable at any moment from maintained state instead of a corpus
recompute.

Per micro-batch (``apply_batch``), the dedup_index protocol applied to
the pHash geometry:

1. fingerprint the batch's media payloads (phash_fingerprints — one
   Arrow-batched mapInPandas pass, map-only);
2. within-batch pairs via the pigeonhole band self-join, batch-vs-
   index pairs via a broadcast probe of the maintained band relation;
3. verify = bit_count(fp_a XOR fp_b) <= PHASH_MAX_HAMMING on the
   fingerprint relation (exact for <= n_bands - 1 flips);
4. fold fingerprints and bands into ``state_table`` generations
   (bands BEFORE the fingerprint commit point would lose candidates;
   fingerprints land LAST — they key the batch-novelty anti-join,
   the materialize_silver discipline).

Pairs land under ``pairs_dir/epoch=<token>/`` with overwrite, so an
at-least-once replay REWRITES its own pairs. Each qualifying pair is
discovered exactly once: at the batch where the later doc arrives
(probe-before-fold; novelty anti-join absorbs redelivery).

``cross_modal_audit`` reads the text pair store (dedup_index) and
this module's media pair store and classifies through the SAME
cross_modal_classify the batch query uses — stream == batch pinned in
tests/test_media_index.py. Duplicate pair rows across epochs collapse
in a distinct (pair metrics are pure functions of the texts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import simhash_bands
from ..queries.pipeline_multimodal import (
    PHASH_MAX_HAMMING,
    _PHASH_BAND_BITS,
    _PHASH_N_BANDS,
    cross_modal_classify,
    phash_fingerprints,
)
from . import dedup_index, state_table

N_BUCKETS = 8

_FPS = "fingerprints"
_BANDS = "bands"
_FPS_DDL = "doc_id bigint, fingerprint bigint"
_BANDS_DDL = "doc_id bigint, band int, band_val bigint"


def _bands_of(fps: DataFrame) -> DataFrame:
    return simhash_bands(
        fps, "doc_id", n_bands=_PHASH_N_BANDS, band_bits=_PHASH_BAND_BITS
    ).select("doc_id", "band", "band_val")


def _verified(cand: DataFrame, fps_a: DataFrame, fps_b: DataFrame) -> DataFrame:
    """(a_id, b_id, hamming) for candidate pairs within the Hamming
    cut; fps_a/fps_b are (doc_id, fingerprint) relations per side."""
    a = fps_a.select(
        F.col("doc_id").alias("a_id"), F.col("fingerprint").alias("a_fp")
    )
    b = fps_b.select(
        F.col("doc_id").alias("b_id"), F.col("fingerprint").alias("b_fp")
    )
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
    )


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame(
            [], "a_id bigint, b_id bigint, hamming int"
        )
    return spark.read.parquet(pairs_dir).select("a_id", "b_id", "hamming")


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    epoch_token: str | None = None,
) -> None:
    """Process one (doc_id, text) micro-batch: emit new media near-dup
    pairs, then fold fingerprints + bands into the index."""
    paths = {s: os.path.join(index_dir, s) for s in (_FPS, _BANDS)}
    if epoch_token is not None and all(
        state_table.applied_token(paths[s]) == epoch_token
        for s in (_FPS, _BANDS)
    ):
        return

    state_fps = state_table.read_state(spark, paths[_FPS], _FPS_DDL).select(
        "doc_id", "fingerprint"
    )
    state_bands = state_table.read_state(
        spark, paths[_BANDS], _BANDS_DDL
    ).select("doc_id", "band", "band_val")

    # novelty anti-join (fingerprints are a pure function of the text).
    # cache + unpersist in finally (the dedup_index discipline): a
    # long-running stream calls apply_batch forever, and leaked
    # checkpoint/cache blocks would accumulate between context GCs.
    fps = phash_fingerprints(docs.select("doc_id", "text")).join(
        state_fps.select("doc_id"), "doc_id", "left_anti"
    ).cache()  # feeds bands, two verifies, fold
    bands = _bands_of(fps).cache()
    try:
        # (1) within-batch pairs; (2) batch-vs-index pairs,
        # (min, max)-normalized. ONE distinct over the union — it
        # subsumes per-branch dedup including replay overlap.
        ba = bands.select(F.col("doc_id").alias("a_id"), "band", "band_val")
        bb = bands.select(F.col("doc_id").alias("b_id"), "band", "band_val")
        within = (
            ba.join(bb, ["band", "band_val"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
        )
        probe = bands.select(
            F.col("doc_id").alias("new_id"), "band", "band_val"
        )
        cross = (
            state_bands.select(
                F.col("doc_id").alias("old_id"), "band", "band_val"
            )
            .join(F.broadcast(probe), ["band", "band_val"])
            .filter(F.col("old_id") != F.col("new_id"))
            .select(
                F.least("old_id", "new_id").alias("a_id"),
                F.greatest("old_id", "new_id").alias("b_id"),
            )
        )
        all_fps = state_fps.unionByName(fps).dropDuplicates(["doc_id"])
        out = _verified(within.unionByName(cross).distinct(), all_fps, all_fps)

        state_table.write_epoch_pairs(out, pairs_dir, epoch_token)

        # fold: bands BEFORE fingerprints (fingerprints are the novelty
        # commit point; orphan bands self-heal via the pair DISTINCT)
        state_table.merge_batch(
            spark,
            paths[_BANDS],
            bands,
            lambda df: df.dropDuplicates(["doc_id", "band"]),
            ["doc_id", "band"],
            ["band_val"],
            F.pmod(F.xxhash64("band_val"), F.lit(N_BUCKETS)).cast("int"),
            _BANDS_DDL,
            token=epoch_token,
        )
        state_table.merge_batch(
            spark,
            paths[_FPS],
            fps,
            lambda df: df.dropDuplicates(["doc_id"]),
            ["doc_id"],
            ["fingerprint"],
            F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("int"),
            _FPS_DDL,
            token=epoch_token,
        )
    finally:
        fps.unpersist()
        bands.unpersist()


def cross_modal_audit(
    spark: SparkSession, text_pairs_dir: str, media_pairs_dir: str
) -> DataFrame:
    """Current cross-modal consistency relation from the two
    maintained pair stores — the ONLINE twin of the batch
    cross_modal_dedup_audit (same cross_modal_classify, same columns).
    Epoch-duplicate pair rows collapse in the distinct (metrics are
    pure functions of the texts)."""
    text_pairs = (
        dedup_index.read_pairs(spark, text_pairs_dir)
        .select("a_id", "b_id", "jaccard")
        .distinct()
    )
    media_pairs = (
        read_pairs(spark, media_pairs_dir)
        .select("a_id", "b_id", F.col("hamming").cast("bigint").alias("hamming"))
        .distinct()
    )
    return cross_modal_classify(text_pairs, media_pairs)


def stream_media_index(
    spark: SparkSession,
    feed_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` maintain the media near-dup index per micro-batch."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        index_dir,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark, batch_df, index_dir, pairs_dir, epoch_token=token
        ),
        schema=schema,
        select_cols=["doc_id", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
