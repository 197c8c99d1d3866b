"""Streaming mixing-allocation maintenance: stream-folded token counts
== batch counts under any batch split, replay is a no-op, and the
read-time allocation equals the registered batch query.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries import REGISTRY
from starknet_indexer_spark.streaming import mixing

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "source", "text")


class TestIncrementalEqualsBatch:
    def test_sequential_batches_equal_batch_counts(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "mix")
        for i in range(3):
            mixing.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), state)
        want = _rows(mixing._token_partials(docs))
        assert _rows(mixing.read_token_counts(spark, state)) == want

    def test_allocation_equals_registered_query(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "mix")
        mixing.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), state)
        mixing.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), state)
        got = _rows(mixing.read_allocation(spark, state))
        want = _rows(REGISTRY["temperature_mix_allocation"].fn(spark, SF))
        assert got == want

    def test_prefix_allocation_sums_to_budget(self, spark, tmp_path):
        from starknet_indexer_spark.queries.pipeline_quality import MIX_BUDGET

        docs = _docs(spark)
        state = str(tmp_path / "mix")
        mixing.apply_batch(spark, docs.filter(F.col("doc_id") % 4 == 0), state)
        rows = mixing.read_allocation(spark, state).collect()
        assert rows
        assert sum(r["budget_tokens"] for r in rows) == MIX_BUDGET


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "mix")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = mixing.stream_maintain(spark, feed, state, ck, max_files_per_trigger=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(mixing._token_partials(docs))
        assert _rows(mixing.read_token_counts(spark, state)) == want
        q2 = mixing.stream_maintain(spark, feed, state, ck, max_files_per_trigger=1)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(mixing.read_token_counts(spark, state)) == want
        assert os.path.isdir(state)
