"""Streaming IVF index == batch recompute, and searches over the
maintained index == the self-contained batch IVF query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.operators.similarity import ivf_assign
from starknet_indexer_spark.queries.pipeline_similarity import (
    N_CENTROIDS,
    N_PROBE,
    N_QUERIES,
    TOP_K,
)
from starknet_indexer_spark.queries.registry import REGISTRY
from starknet_indexer_spark.streaming import ivf_index

SF_DIR = "/root/testdata/sf0.001"


def _centroids(spark):
    emb = load(spark, SF_DIR, "embeddings")
    return ivf_index._normed(emb.filter(F.col("vec_id") < N_CENTROIDS)).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("ev").alias("cv"),
        F.col("en").alias("cn"),
    )


def _rows(df):
    return sorted(map(str, df.collect()))


class TestIvfIndexMaintenance:
    def test_incremental_assign_equals_recompute(self, spark, tmp_path):
        emb = load(spark, SF_DIR, "embeddings")
        cent = _centroids(spark)
        idx = str(tmp_path / "ivf")
        for i in range(3):
            ivf_index.apply_batch(
                emb.filter(F.col("vec_id") % 3 == i), idx, cent
            )
        got = _rows(ivf_index.read_postings(spark, idx))
        want = _rows(
            ivf_assign(ivf_index._normed(emb), cent, 1).select(
                "vec_id", "centroid_id"
            )
        )
        assert got == want

    def test_search_equals_batch_ivf_query(self, spark, tmp_path):
        emb = load(spark, SF_DIR, "embeddings")
        cent = _centroids(spark)
        idx = str(tmp_path / "ivf")
        for i in range(2):
            ivf_index.apply_batch(
                emb.filter(F.col("vec_id") % 2 == i), idx, cent
            )
        got = _rows(
            ivf_index.search(
                spark,
                idx,
                emb.filter(F.col("vec_id") < N_QUERIES),
                cent,
                emb,
                N_PROBE,
                TOP_K,
            )
        )
        want = _rows(REGISTRY["ann_topk_ivf"].fn(spark, SF_DIR))
        assert got == want

    @pytest.mark.slow
    def test_stream_equals_recompute_and_replay_is_noop(self, spark, tmp_path):
        emb = load(spark, SF_DIR, "embeddings")
        cent = _centroids(spark)
        feed = str(tmp_path / "feed")
        emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
        emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
        idx = str(tmp_path / "ivf")
        ck = str(tmp_path / "ck")
        q = ivf_index.stream_ivf_index(spark, feed, idx, ck, cent)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(
            ivf_assign(ivf_index._normed(emb), cent, 1).select(
                "vec_id", "centroid_id"
            )
        )
        assert _rows(ivf_index.read_postings(spark, idx)) == want
        # redelivery of already-applied epochs must not double-post
        from starknet_indexer_spark.streaming.epochs import epoch_idempotent

        replay = epoch_idempotent(
            idx, ck, lambda b, _e: ivf_index.apply_batch(b, idx, cent)
        )
        replay(emb.filter(F.col("vec_id") % 2 == 0), 0)
        assert _rows(ivf_index.read_postings(spark, idx)) == want
