"""Delta-join materialized view maintenance (streaming/join_view.py):
the emitted view must equal the full recompute JOIN regardless of how
appends interleave across sides — including a fact arriving BEFORE its
dimension row — and every matched pair must be emitted exactly once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.streaming.join_view import (
    JoinViewMaintainer,
    stream_maintain,
)

SF_DIR = "/root/testdata/sf0.001"


def _facts(spark):
    return (
        load(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type")
        .filter(F.col("user_id") < 40)
    )


def _dims(spark):
    # a user dimension derived from the same corpus (first event time)
    return (
        load(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 40)
        .groupBy("user_id")
        .agg(F.min("event_id").alias("first_event_id"))
    )


def _pairs(df):
    return sorted(
        (r["user_id"], r["event_id"], r["event_type"], r["first_event_id"])
        for r in df.collect()
    )


def _slices(df, col, bounds):
    lo = None
    out = []
    for b in list(bounds) + [None]:
        c = df
        if lo is not None:
            c = c.filter(F.col(col) >= lo)
        if b is not None:
            c = c.filter(F.col(col) < b)
        out.append(c)
        lo = b
    return out


class TestJoinViewDelta:
    def test_out_of_order_interleaving_equals_recompute(self, spark, tmp_path):
        facts, dims = _facts(spark), _dims(spark)
        f1, f2, f3 = _slices(facts, "event_id", [300, 700])
        d1, d2 = _slices(dims, "user_id", [20])
        m = JoinViewMaintainer(str(tmp_path / "jv"), key="user_id")
        # facts for users >= 20 arrive BEFORE their dim rows (batch 1-2
        # facts join d2 only when d2 lands in batch 4), and batch 3
        # carries both sides at once (the dL JOIN dR term).
        m.apply_batch(spark, left_delta=f1)
        m.apply_batch(spark, right_delta=d1)
        m.apply_batch(spark, left_delta=f2, right_delta=d2)
        m.apply_batch(spark, left_delta=f3)
        got = m.read_view(spark)
        want = facts.join(dims, "user_id")
        assert _pairs(got) == _pairs(want)  # sorted => also exactly-once

    def test_empty_probe_sides(self, spark, tmp_path):
        m = JoinViewMaintainer(str(tmp_path / "jv0"), key="user_id")
        m.apply_batch(spark, left_delta=_facts(spark))  # no right state yet
        assert m.read_view(spark) is None
        m.apply_batch(spark, right_delta=_dims(spark))
        want = _facts(spark).join(_dims(spark), "user_id")
        assert _pairs(m.read_view(spark)) == _pairs(want)

    def test_overlapping_payload_columns_rejected(self, spark, tmp_path):
        m = JoinViewMaintainer(str(tmp_path / "jvb"), key="user_id")
        df = _dims(spark).withColumn("event_type", F.lit("x"))
        with pytest.raises(ValueError, match="disjoint"):
            m.apply_batch(spark, left_delta=_facts(spark), right_delta=df)

    def test_nondeterministic_delta_stays_consistent(self, spark, tmp_path):
        """Deltas are pinned (localCheckpoint) before their three
        consumers, so even a sampled (re-evaluation-unstable) delta
        yields a view equal to the join of the persisted side states."""
        m = JoinViewMaintainer(str(tmp_path / "jvnd"), key="user_id")
        m.apply_batch(spark, right_delta=_dims(spark))
        m.apply_batch(spark, left_delta=_facts(spark).sample(0.5, seed=None))
        left_state = spark.read.parquet(m.left_dir).drop("bucket")
        right_state = spark.read.parquet(m.right_dir).drop("bucket")
        want = left_state.join(right_state, "user_id")
        got = m.read_view(spark)
        assert _pairs(got) == _pairs(want)


class TestJoinViewStreaming:
    def test_tagged_changefeed_equals_recompute(self, spark, tmp_path):
        facts, dims = _facts(spark), _dims(spark)
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        as_left = facts.select(
            F.lit("left").alias("side"),
            "user_id",
            "event_id",
            "event_type",
            F.lit(None).cast("long").alias("first_event_id"),
        )
        as_right = dims.select(
            F.lit("right").alias("side"),
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
            "first_event_id",
        )
        f1, f2 = _slices(as_left, "event_id", [500])
        d1, d2 = _slices(as_right, "user_id", [20])
        # dims for users >= 20 arrive only in the last feed file
        f1.write.mode("append").parquet(feed)
        q = stream_maintain(
            spark,
            feed,
            state,
            ckpt,
            key="user_id",
            left_cols=["event_id", "event_type"],
            right_cols=["first_event_id"],
        )
        try:
            q.processAllAvailable()
            for batch in (d1, f2, d2):
                batch.write.mode("append").parquet(feed)
                q.processAllAvailable()
        finally:
            q.stop()
        m = JoinViewMaintainer(state, key="user_id")
        want = facts.join(dims, "user_id")
        assert _pairs(m.read_view(spark)) == _pairs(want)

    def test_side_column_validation(self, spark, tmp_path):
        with pytest.raises(ValueError, match=r"columns in both sides.*'a'"):
            stream_maintain(
                spark,
                str(tmp_path / "nofeed"),
                str(tmp_path / "s"),
                str(tmp_path / "c"),
                key="user_id",
                left_cols=["a"],
                right_cols=["a"],
            )
        # the key-in-payload case must be named, not reported as an
        # empty overlap
        with pytest.raises(ValueError, match="key 'user_id' listed"):
            stream_maintain(
                spark,
                str(tmp_path / "nofeed"),
                str(tmp_path / "s"),
                str(tmp_path / "c"),
                key="user_id",
                left_cols=["user_id", "b"],
                right_cols=["x"],
            )
