"""Streaming drop list: the decision relation derived from the three
maintained indexes == the batch dedup_drop_list query under any batch
split; stream restart is a no-op; the full-containment role
configuration of the containment index matches setjoin_containment."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_curation import dedup_drop_list
from starknet_indexer_spark.streaming import containment_index as ci
from starknet_indexer_spark.streaming import drop_list as dl

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text")


class TestFullContainmentRoles:
    def test_both_roles_equal_batch_containment(self, spark, tmp_path):
        """With probe_pred == container_pred == TRUE, the maintained
        pair set equals the registered full setjoin_containment query
        (ordered pairs over the whole corpus), fed in two batches so
        both discovery orientations fire."""
        from starknet_indexer_spark.queries.pipeline_setjoin import (
            setjoin_containment,
        )

        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        both = lambda d: F.lit(True)  # noqa: E731
        for i in range(2):
            ci.apply_batch(
                spark,
                docs.filter(F.col("doc_id") % 2 == i),
                index,
                pairs,
                probe_pred=both,
                container_pred=both,
            )
        got = _rows(ci.read_pairs(spark, pairs))
        want = _rows(setjoin_containment(spark, SF))
        assert got == want
        assert want


class TestDropListEqualsBatch:
    def test_sequential_batches_equal_batch_query(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            dl.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        got = _rows(dl.drop_list(spark, root))
        want = _rows(dedup_drop_list(spark, SF))
        assert got == want
        # sanity: the fixture exercises at least two reasons
        reasons = {r["reason"] for r in dl.drop_list(spark, root).collect()}
        assert "kept" in reasons and len(reasons) >= 2

    def test_redelivery_absorbed(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        dl.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
        dl.apply_batch(spark, docs, root)  # evens redelivered
        assert _rows(dl.drop_list(spark, root)) == _rows(
            dedup_drop_list(spark, SF)
        )


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
        q = dl.stream_drop_list(spark, feed, root, ck, max_files_per_trigger=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(dedup_drop_list(spark, SF))
        assert _rows(dl.drop_list(spark, root)) == want
        # restart over the same checkpoint: no new files, no change
        q2 = dl.stream_drop_list(spark, feed, root, ck, max_files_per_trigger=1)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(dl.drop_list(spark, root)) == want
        assert os.path.isdir(root)
