"""Streaming calibration maintenance: stream-folded score counts ==
batch counts under any batch split, replay is a no-op, and the
read-time PAV fit equals the registered batch query.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries import REGISTRY
from starknet_indexer_spark.queries.pipeline_calibration import (
    doc_scores,
    score_counts,
)
from starknet_indexer_spark.streaming import calibration

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "lang", "text")


class TestIncrementalEqualsBatch:
    def test_sequential_batches_equal_batch_counts(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "cal")
        for i in range(3):
            calibration.apply_batch(
                spark, docs.filter(F.col("doc_id") % 3 == i), state
            )
        want = _rows(score_counts(doc_scores(docs)))
        assert _rows(calibration.read_score_counts(spark, state)) == want

    def test_fit_equals_registered_query(self, spark, tmp_path):
        docs = _docs(spark)
        state = str(tmp_path / "cal")
        calibration.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), state)
        calibration.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), state)
        got = _rows(calibration.read_calibration(spark, state))
        want = _rows(REGISTRY["isotonic_calibration"].fn(spark, SF))
        assert got == want

    def test_prefix_fit_is_valid_calibration(self, spark, tmp_path):
        """After only a prefix of the stream, the fit is still a
        monotone probability table over the rows seen so far."""
        docs = _docs(spark)
        state = str(tmp_path / "cal")
        calibration.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == 0), state)
        rows = sorted(
            calibration.read_calibration(spark, state).collect(),
            key=lambda r: r["bin"],
        )
        assert rows
        isos = [r["iso_ppm"] for r in rows]
        assert all(a <= b for a, b in zip(isos, isos[1:]))
        assert all(0 <= v <= 1_000_000 for v in isos)


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "cal")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = calibration.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(score_counts(doc_scores(docs)))
        assert _rows(calibration.read_score_counts(spark, state)) == want
        q2 = calibration.stream_maintain(
            spark, feed, state, ck, max_files_per_trigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(calibration.read_score_counts(spark, state)) == want
        assert os.path.isdir(state)
