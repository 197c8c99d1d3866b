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
