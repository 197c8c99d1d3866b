"""Streaming dedup index == full-corpus recompute.

The union of pairs emitted across micro-batches (within-batch +
batch-vs-index) must equal the batch ``minhash_lsh_dedup`` query on
the whole corpus — the incremental-vs-recompute equivalence oracle
(reference pattern src/dao.ts:510-515) applied to the LSH index.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.registry import REGISTRY
from starknet_indexer_spark.streaming.dedup_index import stream_dedup_index

SF_DIR = "/root/testdata/sf0.001"


class TestDedupIndexEquivalence:
    @pytest.mark.slow
    def test_stream_equals_full_recompute(self, spark, tmp_path):
        docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
        feed = str(tmp_path / "feed")
        # two interleaved halves -> cross-batch duplicates exist in
        # both id directions (old>new and old<new)
        # one file per half -> with maxFilesPerTrigger=1 exactly two
        # micro-batches, one parity each
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(feed)
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(feed)

        q = stream_dedup_index(
            spark,
            feed,
            index_dir=str(tmp_path / "index"),
            pairs_dir=str(tmp_path / "pairs"),
            checkpoint_dir=str(tmp_path / "ck"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = {
            (r["a_id"], r["b_id"], r["inter"], r["jaccard"])
            for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
        }
        want = {
            (r["a_id"], r["b_id"], r["inter"], r["jaccard"])
            for r in REGISTRY["minhash_lsh_dedup"].fn(spark, SF_DIR).collect()
        }
        assert got == want
        assert len(got) > 0
        # maxFilesPerTrigger=1 puts each parity half in its own
        # micro-batch (each feed file holds one parity), so any
        # even-odd pair can only have come from the batch-vs-index
        # probe — prove that path actually ran
        assert any((a % 2) != (b % 2) for a, b, _, _ in got)
        # and the within-batch path too
        assert any((a % 2) == (b % 2) for a, b, _, _ in got)


class TestReplayIdempotence:
    def test_replayed_epoch_rewrites_not_appends_pairs(self, spark, tmp_path):
        """r9 migration onto state_table: pairs are epoch-keyed
        overwrite and both index states carry the epoch token, so an
        at-least-once replay of a crashed epoch neither duplicates
        pairs nor refolds the index."""
        from starknet_indexer_spark.streaming import dedup_index, state_table

        docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
        index = str(tmp_path / "index")
        pairs = str(tmp_path / "pairs")
        first = docs.filter(F.col("doc_id") % 2 == 0)
        second = docs.filter(F.col("doc_id") % 2 == 1)
        dedup_index.apply_batch(spark, first, index, pairs, epoch_token="ns:0")
        dedup_index.apply_batch(spark, second, index, pairs, epoch_token="ns:1")
        want_pairs = sorted(
            map(str, dedup_index.read_pairs(spark, pairs).collect())
        )
        sh_rows = state_table.read_state(
            spark, f"{index}/shingles", "doc_id bigint, shingles array<string>"
        ).count()
        # replay epoch 1 verbatim (crash landed before the marker)
        dedup_index.apply_batch(spark, second, index, pairs, epoch_token="ns:1")
        assert (
            sorted(map(str, dedup_index.read_pairs(spark, pairs).collect()))
            == want_pairs
        )
        assert (
            state_table.read_state(
                spark, f"{index}/shingles", "doc_id bigint, shingles array<string>"
            ).count()
            == sh_rows
        )
        # the union still equals the full recompute
        got = {
            (r["a_id"], r["b_id"], r["inter"], r["jaccard"])
            for r in dedup_index.read_pairs(spark, pairs).collect()
        }
        want = {
            (r["a_id"], r["b_id"], r["inter"], r["jaccard"])
            for r in REGISTRY["minhash_lsh_dedup"].fn(spark, SF_DIR).collect()
        }
        assert got == want and len(got) > 0
