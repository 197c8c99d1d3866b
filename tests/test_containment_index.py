"""Streaming containment index: maintained-state pair discovery ==
the batch containment_incremental recompute under any batch split,
replay is a no-op, and redelivery is absorbed (VERDICT r9 mandate #4,
the test_streaming_semdedup pattern)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_setjoin import (
    containment_incremental,
)
from starknet_indexer_spark.streaming import containment_index as ci

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text")


def _want(spark):
    return _rows(containment_incremental(spark, SF))


class TestIncrementalEqualsBatch:
    def test_sequential_batches_union_equals_batch_query(self, spark, tmp_path):
        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        for i in range(3):
            ci.apply_batch(
                spark, docs.filter(F.col("doc_id") % 3 == i), index, pairs
            )
        got = _rows(ci.read_pairs(spark, pairs))
        want = _want(spark)
        assert got == want
        assert want, "fixture has no containment pairs"

    def test_reverse_split_covers_late_containers(self, spark, tmp_path):
        """Containers arriving AFTER their probers must still be found
        (the frozen-prefix-vs-new-postings path): feed probe docs
        (doc_id % 5 == 0) first, containers second."""
        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        ci.apply_batch(spark, docs.filter(F.col("doc_id") % 5 == 0), index, pairs)
        assert _rows(ci.read_pairs(spark, pairs)) == []  # no containers yet
        ci.apply_batch(spark, docs.filter(F.col("doc_id") % 5 != 0), index, pairs)
        assert _rows(ci.read_pairs(spark, pairs)) == _want(spark)

    def test_redelivered_docs_absorbed(self, spark, tmp_path):
        """At-least-once delivery in a NEW epoch (so the token guard
        does not absorb it): redelivered docs must not duplicate pairs
        or state rows."""
        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        ci.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), index, pairs)
        ci.apply_batch(spark, docs, index, pairs)  # evens redelivered
        assert _rows(ci.read_pairs(spark, pairs)) == _want(spark)

    def test_same_epoch_replay_short_circuits(self, spark, tmp_path):
        """A replay carrying the SAME epoch token after a full fold is
        absorbed by the all-states token guard — no extra pairs dir,
        state generations unchanged."""
        from starknet_indexer_spark.streaming import state_table

        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        ci.apply_batch(spark, docs, index, pairs, epoch_token="ns:0")
        gens = {
            s: state_table.current_gen(os.path.join(index, s))
            for s in ci._ALL_STATES
        }
        before = _rows(ci.read_pairs(spark, pairs))
        ci.apply_batch(spark, docs, index, pairs, epoch_token="ns:0")
        assert _rows(ci.read_pairs(spark, pairs)) == before == _want(spark)
        for s in ci._ALL_STATES:
            assert state_table.current_gen(os.path.join(index, s)) == gens[s]


class TestLegacySchemaMigration:
    def test_pre_roles_sets_state_migrates(self, spark, tmp_path):
        """Generations written before the independent-roles schema
        (sets without is_container, under the container == NOT probe
        convention) must migrate on the next fold instead of crashing
        read_state/merge_batch (code-review r10). Simulated by
        rewriting the live generation without the column."""
        from starknet_indexer_spark.streaming import state_table

        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        ci.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), index, pairs)

        sets_dir = os.path.join(index, "sets")
        gen = state_table.current_gen_dir(sets_dir)
        legacy = spark.read.parquet(gen).drop("is_container")
        affected = [
            r["bucket"] for r in legacy.select("bucket").distinct().collect()
        ]
        state_table.commit_generation(
            sets_dir,
            legacy,
            affected=affected,
            token=state_table.applied_token(sets_dir),
        )
        assert "is_container" not in spark.read.parquet(
            state_table.current_gen_dir(sets_dir)
        ).columns

        ci.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), index, pairs)
        assert _rows(ci.read_pairs(spark, pairs)) == _want(spark)
        assert "is_container" in spark.read.parquet(
            state_table.current_gen_dir(sets_dir)
        ).columns

    def test_legacy_restore_at_checked_path_reprobes(self, spark, tmp_path):
        """ADVICE r10: the migration memo must key on the live
        GENERATION, not the bare path — a legacy-schema generation
        restored at an already-confirmed state dir (backup restore, or
        a temp path reused for a different state) must re-probe and
        migrate instead of failing on the missing is_container
        column."""
        from starknet_indexer_spark.streaming import state_table

        docs = _docs(spark)
        index = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        # two folds: the second one's migration probe confirms the
        # (then-live) generation and memoizes the path
        ci.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), index, pairs)
        ci.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), index, pairs)
        assert _rows(ci.read_pairs(spark, pairs)) == _want(spark)

        # "restore" a legacy-schema generation at the SAME path
        sets_dir = os.path.join(index, "sets")
        gen = state_table.current_gen_dir(sets_dir)
        legacy = spark.read.parquet(gen).drop("is_container")
        affected = [
            r["bucket"] for r in legacy.select("bucket").distinct().collect()
        ]
        state_table.commit_generation(
            sets_dir,
            legacy,
            affected=affected,
            token=state_table.applied_token(sets_dir),
        )
        assert "is_container" not in spark.read.parquet(
            state_table.current_gen_dir(sets_dir)
        ).columns

        # the next fold must re-probe (new generation != memoized one)
        # and widen the restored state instead of crashing read/merge
        ci.apply_batch(spark, docs.limit(0), index, pairs)
        assert "is_container" in spark.read.parquet(
            state_table.current_gen_dir(sets_dir)
        ).columns
        assert _rows(ci.read_pairs(spark, pairs)) == _want(spark)


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
        q = ci.stream_containment_index(
            spark, feed, index, pairs, ck, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _want(spark)
        assert _rows(ci.read_pairs(spark, pairs)) == want
        # restart over the same checkpoint: no new files, no change
        q2 = ci.stream_containment_index(
            spark, feed, index, pairs, ck, max_files_per_trigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(ci.read_pairs(spark, pairs)) == want
