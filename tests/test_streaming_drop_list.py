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


class TestFixtureContract:
    def test_n_chars_equals_text_length(self, spark):
        """The stream's length(text) fallback for the survivor
        tie-break is equivalent to the batch side's documents.n_chars
        ONLY under this corpus contract — pin it so generator drift is
        caught here rather than as a silent stream/batch divergence."""
        bad = (
            load(spark, SF, "documents")
            .filter(F.col("n_chars") != F.length("text"))
            .count()
        )
        assert bad == 0


class TestAllFourReasons:
    def _synth_corpus(self, spark, tmp_path) -> str:
        """Temp corpus forcing every decision branch: doc 2 is an
        exact copy of doc 1 (exact_dup -> kept_by 1); doc 3 a near-dup
        of doc 1 (shorter, so doc 1 survives); doc 4's shingles are a
        strict subset of doc 1's but far below the Jaccard threshold
        (contained); doc 5 unrelated (kept)."""
        base_words = [f"alpha{i} beta{i % 7}" for i in range(60)]
        t1 = " ".join(w for pair in base_words for w in pair.split())
        t3 = t1.rsplit(" ", 8)[0]  # drop the last 8 words: near-dup
        t4 = " ".join(t1.split()[:12])  # strict prefix: contained
        t5 = " ".join(f"zulu{i} omega{i * 3 % 11}" for i in range(50))
        rows = [(1, t1), (2, t1), (3, t3), (4, t4), (5, t5)]
        sf_dir = str(tmp_path / "synth_sf")
        spark.createDataFrame(
            [
                (i, t, "en", "synth", len(t))
                for i, t in rows
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
        return sf_dir

    def test_batch_and_stream_cover_every_branch(self, spark, tmp_path):
        sf_dir = self._synth_corpus(spark, tmp_path)
        batch = {
            r["doc_id"]: (r["reason"], r["kept_by"])
            for r in dedup_drop_list(spark, sf_dir).collect()
        }
        assert batch[1] == ("kept", 1)
        assert batch[2] == ("exact_dup", 1)
        assert batch[3] == ("near_dup", 1)
        assert batch[4] == ("contained", 1)
        assert batch[5] == ("kept", 5)

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"
        )
        root = str(tmp_path / "root")
        for i in range(2):
            dl.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == i), root)
        stream = {
            r["doc_id"]: (r["reason"], r["kept_by"])
            for r in dl.drop_list(spark, root).collect()
        }
        assert stream == batch


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
