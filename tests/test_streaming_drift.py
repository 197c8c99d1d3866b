"""Streaming drift monitor (streaming/drift.py): the maintained count
state must make drift_table value-identical to the batch
tvd_drift_by_source computation over the union of all batches, and the
generation-pointer state commit must ignore/sweep half-built
generations from a crashed commit.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_drift import tvd_from_counts
from starknet_indexer_spark.streaming import drift

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load(spark, SF_DIR, "documents").select("doc_id", "source", "lang")


def _want(spark):
    cnt = _docs(spark).groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    return tvd_from_counts(cnt)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDriftMonitor:
    def test_incremental_equals_recompute(self, spark, tmp_path):
        state = str(tmp_path / "drift")
        docs = _docs(spark)
        for lo, hi in ((0, 15), (15, 30), (30, 10**9)):
            drift.apply_batch(
                spark,
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
                state,
            )
        assert _rows(drift.drift_table(spark, state)) == _rows(_want(spark))

    def test_streaming_equals_recompute(self, spark, tmp_path):
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "sdrift")
        ckpt = str(tmp_path / "ckpt")
        docs = _docs(spark)
        chunks = [
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            for lo, hi in ((0, 20), (20, 40), (40, 10**9))
        ]
        chunks[0].write.mode("append").parquet(feed)
        q = drift.stream_monitor(spark, feed, state, ckpt)
        try:
            q.processAllAvailable()
            for c in chunks[1:]:
                c.write.mode("append").parquet(feed)
                q.processAllAvailable()
        finally:
            q.stop()
        assert _rows(drift.drift_table(spark, state)) == _rows(_want(spark))

    def test_alert_threshold(self, spark, tmp_path):
        state = str(tmp_path / "adrift")
        drift.apply_batch(spark, _docs(spark), state)
        d = drift.drift_table(spark, state).collect()
        thr = sorted(r["tvd_ppm"] for r in d)[len(d) // 2]  # median cut
        got = drift.alerts(spark, state, threshold_ppm=thr)
        assert _rows(got) == _rows(
            drift.drift_table(spark, state).filter(F.col("tvd_ppm") >= thr)
        )

    def test_crash_recovery_half_built_generation(self, spark, tmp_path):
        """A crash mid-commit leaves a half-built higher generation the
        CURRENT pointer never referenced; reads stay on the complete
        live generation, and writer-entry recovery sweeps the orphan
        (state_table semantics — drift state rides the shared
        generation table since r9)."""
        from starknet_indexer_spark.streaming import state_table

        state = str(tmp_path / "rdrift")
        docs = _docs(spark)
        drift.apply_batch(spark, docs, state)
        want = _rows(drift.drift_table(spark, state))
        gen = state_table.current_gen(state)
        orphan = os.path.join(state, f"gen-{gen + 1}")
        os.makedirs(os.path.join(orphan, "bucket=0"))
        with open(os.path.join(orphan, "junk"), "w") as f:
            f.write("half-built")
        # reads resolve the pointer — the orphan is invisible
        assert _rows(drift.drift_table(spark, state)) == want
        drift.recover(state)
        assert not os.path.isdir(orphan)
        assert _rows(drift.drift_table(spark, state)) == want
        # the next fold commits a fresh generation on top cleanly
        drift.apply_batch(spark, docs.limit(0), state)
        assert _rows(drift.drift_table(spark, state)) == want

    def test_epoch_token_closes_post_swap_replay_window(self, spark, tmp_path):
        """Crash after the counts swap but before the outer epoch marker
        write: foreachBatch replays the epoch. Because the epoch token is
        committed atomically WITH the counts (written into staging before
        os.replace), the replay short-circuits instead of double-counting."""
        state = str(tmp_path / "edrift")
        docs = _docs(spark)
        drift.apply_batch(spark, docs, state, epoch_token="ns1:7")
        # compare raw COUNTS: a uniform double-apply would leave the
        # drift table unchanged (proportions survive scaling) but
        # corrupt the counts — the sufficient statistic is the bar
        want = _rows(drift.read_counts(spark, state))
        # marker was never written -> epoch 7 redelivered verbatim
        drift.apply_batch(spark, docs, state, epoch_token="ns1:7")
        assert _rows(drift.read_counts(spark, state)) == want
        # a genuinely new epoch still applies
        drift.apply_batch(spark, docs, state, epoch_token="ns1:8")
        assert _rows(drift.read_counts(spark, state)) != want


def test_psi_from_streamed_counts_equals_batch_query(spark, tmp_path):
    """The PSI read-time functional over the maintained count state
    equals the registered batch query once the full corpus folded."""
    from starknet_indexer_spark.catalog import load
    from starknet_indexer_spark.queries import REGISTRY
    from starknet_indexer_spark.streaming import drift

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").select("source", "lang")
    state = str(tmp_path / "drift")
    for i in range(2):
        drift.apply_batch(spark, docs.filter(F.col("source").isNotNull())
                          .filter((F.crc32(F.col("source")) % 2) == i), state)
    got = sorted(map(str, drift.psi_table(spark, state).collect()))
    want = sorted(map(str, REGISTRY["psi_drift_by_source"].fn(spark, sf).collect()))
    assert got == want
