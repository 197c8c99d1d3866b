"""Streaming decontamination-index maintenance: stream-folded gram
counts == batch counts under any batch split, replay is a no-op, and
BOTH downstream probes (exact containment, Bloom screen) equal their
registered batch queries once the full train split has folded.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries import REGISTRY
from starknet_indexer_spark.streaming import decontam_index

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "source", "text")


class TestIncrementalEqualsBatch:
    def test_sequential_batches_equal_batch_counts(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "idx")
        for i in range(3):
            decontam_index.apply_batch(
                spark, docs.filter(F.col("doc_id") % 3 == i), state
            )
        want = _rows(decontam_index._train_partials(docs))
        got = _rows(
            decontam_index.read_train_grams(spark, state)
            .join(
                decontam_index.state_table.read_state(
                    spark, state, decontam_index._EMPTY_DDL
                ),
                "gh",
            )
            .select("gh", "cnt")
        )
        assert got == want

    def test_probes_equal_registered_queries(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "idx")
        decontam_index.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), state)
        decontam_index.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), state)
        got_exact = _rows(decontam_index.exact_containment(spark, state, docs))
        want_exact = _rows(REGISTRY["decontamination_ngram"].fn(spark, SF))
        assert got_exact == want_exact
        got_bloom = _rows(decontam_index.bloom_screen(spark, state, docs))
        want_bloom = _rows(REGISTRY["bloom_decontamination"].fn(spark, SF))
        assert got_bloom == want_bloom

    def test_eval_rows_never_enter_the_index(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "idx")
        decontam_index.apply_batch(spark, docs, state)
        before = _rows(decontam_index.read_train_grams(spark, state))
        from starknet_indexer_spark.queries.pipeline_dedup import EVAL_SOURCE

        decontam_index.apply_batch(
            spark, docs.filter(F.col("source") == EVAL_SOURCE), state
        )
        assert _rows(decontam_index.read_train_grams(spark, state)) == before


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "idx")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = decontam_index.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(decontam_index._train_partials(docs))
        got = _rows(
            decontam_index.state_table.read_state(
                spark, state, decontam_index._EMPTY_DDL
            ).select("gh", "cnt")
        )
        assert got == want
        q2 = decontam_index.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        got2 = _rows(
            decontam_index.state_table.read_state(
                spark, state, decontam_index._EMPTY_DDL
            ).select("gh", "cnt")
        )
        assert got2 == want
        assert os.path.isdir(state)
