"""Streaming media (pHash) near-dup index: maintained pairs == the
batch multimodal_phash_near_dup recompute under any batch split, the
derived online cross-modal audit == the batch cross_modal_dedup_audit,
and stream restart is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_multimodal import (
    cross_modal_dedup_audit,
    multimodal_phash_near_dup,
)
from starknet_indexer_spark.streaming import dedup_index, media_index as mi

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text")


class TestIncrementalEqualsBatch:
    def test_sequential_batches_equal_batch_query(self, spark, tmp_path):
        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        for i in range(3):
            mi.apply_batch(
                spark, docs.filter(F.col("doc_id") % 3 == i), index, pairs
            )
        got = _rows(mi.read_pairs(spark, pairs))
        want = _rows(
            multimodal_phash_near_dup(spark, SF).select(
                "a_id", "b_id", "hamming"
            )
        )
        assert got == want
        assert want, "fixture has no pHash near-dup pairs"

    def test_redelivery_absorbed(self, spark, tmp_path):
        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        mi.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), index, pairs)
        mi.apply_batch(spark, docs, index, pairs)  # evens redelivered
        got = _rows(mi.read_pairs(spark, pairs).distinct())
        want = _rows(
            multimodal_phash_near_dup(spark, SF).select(
                "a_id", "b_id", "hamming"
            )
        )
        assert got == want


class TestOnlineCrossModalAudit:
    def test_audit_equals_batch_query(self, spark, tmp_path):
        """Both pair indexes maintained over the same two-batch split;
        the derived audit must equal the batch cross_modal_dedup_audit
        (same classifier, same columns)."""
        docs = _docs(spark)
        t_idx = str(tmp_path / "tidx")
        t_pairs = str(tmp_path / "tpairs")
        m_idx = str(tmp_path / "midx")
        m_pairs = str(tmp_path / "mpairs")
        for i in range(2):
            batch = docs.filter(F.col("doc_id") % 2 == i)
            dedup_index.apply_batch(spark, batch, t_idx, t_pairs)
            mi.apply_batch(spark, batch, m_idx, m_pairs)
        got = _rows(mi.cross_modal_audit(spark, t_pairs, m_pairs))
        want = _rows(cross_modal_dedup_audit(spark, SF))
        assert got == want
        assert want


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = mi.stream_media_index(
            spark, feed, index, pairs, ck, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(
            multimodal_phash_near_dup(spark, SF).select(
                "a_id", "b_id", "hamming"
            )
        )
        assert _rows(mi.read_pairs(spark, pairs)) == want
        q2 = mi.stream_media_index(
            spark, feed, index, pairs, ck, max_files_per_trigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(mi.read_pairs(spark, pairs)) == want
