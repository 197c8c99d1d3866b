"""Streaming weighted-sample maintenance: after any batch split the
k-row state equals the batch weighted_sample_topk over the union, and
replay is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_corpus import weighted_sample_topk
from starknet_indexer_spark.streaming import es_sample

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "source", "n_chars")


class TestMergeableTopK:
    def test_sequential_batches_equal_batch_query(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "sample")
        for i in range(3):
            es_sample.apply_batch(
                spark, docs.filter(F.col("doc_id") % 3 == i), state
            )
        got = _rows(es_sample.read_sample(spark, state))
        want = _rows(weighted_sample_topk(spark, SF))
        assert got == want
        assert len(got) > 0

    def test_adversarial_order_high_keys_first(self, spark, tmp_path):
        """Feed the WINNING half first, then losers: the state must not
        churn — merging a batch of all-losing candidates leaves the
        sample unchanged."""
        docs = _docs(spark)
        state = str(tmp_path / "sample")
        winners = {
            r["doc_id"] for r in weighted_sample_topk(spark, SF).collect()
        }
        win_df = docs.filter(F.col("doc_id").isin(list(winners)))
        es_sample.apply_batch(spark, win_df, state)
        mid = _rows(es_sample.read_sample(spark, state))
        es_sample.apply_batch(
            spark, docs.filter(~F.col("doc_id").isin(list(winners))), state
        )
        assert _rows(es_sample.read_sample(spark, state)) == mid
        assert mid == _rows(weighted_sample_topk(spark, SF))

    def test_empty_batch_is_noop(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "sample")
        es_sample.apply_batch(spark, docs, state)
        want = _rows(es_sample.read_sample(spark, state))
        es_sample.apply_batch(spark, docs.filter(F.lit(False)), state)
        assert _rows(es_sample.read_sample(spark, state)) == want


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "sample")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = es_sample.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(weighted_sample_topk(spark, SF))
        assert _rows(es_sample.read_sample(spark, state)) == want
        q2 = es_sample.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(es_sample.read_sample(spark, state)) == want
