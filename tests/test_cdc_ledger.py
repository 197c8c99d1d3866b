"""Streaming CDC chunk-hash ledger (VERDICT r10 mandate #5): the
maintained savings ledger == the batch cdc_chunk_dedup query under any
batch split; redelivery (same-epoch replay, cross-epoch resend, and a
crash between the two state folds) never double-counts; stream restart
over the same checkpoint is a no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_cdc import cdc_chunk_dedup
from starknet_indexer_spark.streaming import cdc_ledger as cl
from starknet_indexer_spark.streaming import state_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text")


def _want(spark):
    return _rows(cdc_chunk_dedup(spark, SF))


class TestLedgerEqualsBatch:
    def test_sequential_batches_equal_batch_query(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            cl.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        assert _rows(cl.ledger(spark, root)) == _want(spark)
        # sanity: the fixture actually has duplicate chunks
        row = cl.ledger(spark, root).collect()[0]
        assert row["dup_bytes"] > 0 and row["savings_ppm"] > 0

    def test_cross_epoch_redelivery_absorbed(self, spark, tmp_path):
        """Chunk counts are additive — the seen_docs novelty guard must
        absorb documents redelivered in a LATER epoch."""
        docs = _docs(spark)
        root = str(tmp_path / "root")
        cl.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
        cl.apply_batch(spark, docs, root)  # evens redelivered
        assert _rows(cl.ledger(spark, root)) == _want(spark)

    def test_same_epoch_replay_short_circuits(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        cl.apply_batch(spark, docs, root, epoch_token="ns:0")
        gens = {
            s: state_table.current_gen(f"{root}/{s}")
            for s in (cl._CHUNKS, cl._SEEN)
        }
        cl.apply_batch(spark, docs, root, epoch_token="ns:0")
        assert _rows(cl.ledger(spark, root)) == _want(spark)
        for s in (cl._CHUNKS, cl._SEEN):
            assert state_table.current_gen(f"{root}/{s}") == gens[s]

    def test_crash_between_folds_replay_is_exact(
        self, spark, tmp_path, monkeypatch
    ):
        """A crash AFTER the chunks fold but BEFORE the seen_docs fold
        is the dangerous window (fold order is what makes it safe):
        the replayed epoch must short-circuit the chunks merge on its
        token and complete only the seen_docs fold — no double-count."""
        docs = _docs(spark)
        root = str(tmp_path / "root")
        cl.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root,
                       epoch_token="ns:0")

        real = state_table.merge_batch
        calls = {"n": 0}

        def crashing(spark_, state_dir, *a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:  # the seen_docs fold of this batch
                raise RuntimeError("injected crash before seen_docs fold")
            return real(spark_, state_dir, *a, **kw)

        monkeypatch.setattr(state_table, "merge_batch", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            cl.apply_batch(spark, docs, root, epoch_token="ns:1")
        monkeypatch.setattr(state_table, "merge_batch", real)

        # replay of the same epoch (at-least-once): chunks fold must
        # short-circuit on its token; seen_docs fold completes
        cl.apply_batch(spark, docs, root, epoch_token="ns:1")
        assert _rows(cl.ledger(spark, root)) == _want(spark)
        # ... and a later full resend is absorbed by the now-complete
        # novelty guard
        cl.apply_batch(spark, docs, root, epoch_token="ns:2")
        assert _rows(cl.ledger(spark, root)) == _want(spark)


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        root = str(tmp_path / "root")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = cl.stream_cdc_ledger(spark, feed, root, ck, max_files_per_trigger=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _want(spark)
        assert _rows(cl.ledger(spark, root)) == want
        # restart over the same checkpoint: no new files, no change
        q2 = cl.stream_cdc_ledger(spark, feed, root, ck, max_files_per_trigger=1)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(cl.ledger(spark, root)) == want
