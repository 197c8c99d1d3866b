"""Streaming NB model maintenance: stream-trained counts == batch
counts under any batch split, replay is a no-op, and the downstream
confusion matrix equals the registered batch query."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_classifier import (
    nb_count_partials,
    nb_features,
    nb_lang_classifier,
)
from starknet_indexer_spark.streaming import nb_model

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "lang", "text")


class TestIncrementalEqualsBatch:
    def test_sequential_batches(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "model")
        for i in range(3):
            nb_model.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), state)
        want = _rows(nb_count_partials(nb_features(docs)))
        assert _rows(nb_model.read_model(spark, state)) == want

    def test_confusion_from_streamed_model_equals_batch_query(
        self, spark, tmp_path
    ):
        docs = _docs(spark)
        state = str(tmp_path / "model")
        nb_model.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), state)
        nb_model.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), state)
        got = _rows(nb_model.confusion(spark, state, docs))
        want = _rows(nb_lang_classifier(spark, SF))
        assert got == want

    def test_empty_batch_is_noop(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "model")
        nb_model.apply_batch(spark, docs, state)
        want = _rows(nb_model.read_model(spark, state))
        nb_model.apply_batch(spark, docs.filter(F.lit(False)), state)
        assert _rows(nb_model.read_model(spark, state)) == want


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "model")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = nb_model.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(nb_count_partials(nb_features(docs)))
        assert _rows(nb_model.read_model(spark, state)) == want
        # restart over the same checkpoint: no new files, state unchanged
        q2 = nb_model.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(nb_model.read_model(spark, state)) == want
        assert os.path.isdir(state)
