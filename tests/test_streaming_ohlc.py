"""Streaming OHLC view: incremental merge == batch recompute, under
any batch split, out-of-order late rows, and at-least-once replay."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.operators.timeseries import ohlc_candles
from starknet_indexer_spark.streaming import ohlc

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _events(spark):
    return load(spark, SF, "events")


class TestIncrementalEqualsRecompute:
    def test_sequential_batches(self, spark, tmp_path):
        ev = _events(spark)
        state = str(tmp_path / "candles")
        for i in range(3):
            ohlc.apply_batch(spark, ev.filter(F.col("event_id") % 3 == i), state)
        assert _rows(ohlc.read_state(spark, state)) == _rows(ohlc_candles(ev))

    def test_late_out_of_order_rows_merge_exactly(self, spark, tmp_path):
        """Rows for an old hour arriving AFTER newer hours were folded
        must land in the historical candle with correct open/close —
        the ordering keys make the merge order-independent."""
        ev = _events(spark)
        state = str(tmp_path / "late")
        # newest half first, oldest half second (reverse time order)
        mid = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
        ohlc.apply_batch(spark, ev.filter(F.col("ts") > mid), state)
        ohlc.apply_batch(spark, ev.filter(F.col("ts") <= mid), state)
        assert _rows(ohlc.read_state(spark, state)) == _rows(ohlc_candles(ev))

    def test_empty_batch_is_noop(self, spark, tmp_path):
        ev = _events(spark)
        state = str(tmp_path / "noop")
        ohlc.apply_batch(spark, ev, state)
        want = _rows(ohlc.read_state(spark, state))
        ohlc.apply_batch(spark, ev.filter(F.lit(False)), state)
        assert _rows(ohlc.read_state(spark, state)) == want


class TestStreaming:
    def test_stream_equals_batch(self, spark, tmp_path):
        ev = _events(spark)
        feed = str(tmp_path / "feed")
        state = str(tmp_path / "candles")
        chunks = [ev.filter(F.col("event_id") % 2 == i) for i in range(2)]
        chunks[0].write.mode("append").parquet(feed)
        q = ohlc.stream_maintain(
            spark, feed, state, str(tmp_path / "ck")
        )
        try:
            q.processAllAvailable()
            chunks[1].write.mode("append").parquet(feed)
            q.processAllAvailable()
        finally:
            q.stop()
        assert _rows(ohlc.read_state(spark, state)) == _rows(ohlc_candles(ev))

    def test_replayed_epoch_is_noop(self, spark, tmp_path):
        """Double-applying the same batch through the epoch guard must
        not perturb the candles (volume/n would double)."""
        from starknet_indexer_spark.streaming.epochs import epoch_idempotent

        ev = _events(spark)
        state = str(tmp_path / "replay")
        ck = str(tmp_path / "ck")
        os.makedirs(ck, exist_ok=True)
        process = epoch_idempotent(
            state, ck, lambda df, _e: ohlc.apply_batch(spark, df, state)
        )
        process(ev, 0)
        want = _rows(ohlc.read_state(spark, state))
        process(ev, 0)  # at-least-once redelivery
        assert _rows(ohlc.read_state(spark, state)) == want


def test_ordering_key_exact_beyond_fold_bound(spark):
    """ADVICE r6: the production kernel must order (ts, event_id)
    exactly for event_ids far beyond the 1e6 bound of the BIGINT fold
    the DuckDB oracle uses. Rows share one timestamp so event_id alone
    decides open/close; ids straddle 1e12 in an order the old fold
    (offset_us * 1e6 + event_id) would scramble."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 12, 30, 0)
    rows = [
        # (event_id, value) — open must be the SMALLEST id's value,
        # close the largest, regardless of magnitude
        (3_000_000_000_017, 50.0),
        (999_999, 10.0),
        (1_000_001, 20.0),
        (3_000_000_000_018, 60.0),
    ]
    events = spark.createDataFrame(
        [(i, "swap", ts, v) for i, v in rows],
        "event_id bigint, event_type string, ts timestamp, value double",
    )
    got = ohlc_candles(events).collect()
    assert len(got) == 1
    c = got[0]
    assert c["open"] == 10.0 and c["close"] == 60.0
    assert c["high"] == 60.0 and c["low"] == 10.0 and c["n_events"] == 4

    # and the algebra still merges exactly when the partials split the
    # id range across batches (the streaming state path)
    from starknet_indexer_spark.operators.timeseries import (
        OHLC_KEY,
        OHLC_PUBLIC_COLS,
        ohlc_merge,
        unit_candles,
    )

    lo = events.filter(F.col("event_id") < 2_000_000_000_000)
    hi = events.filter(F.col("event_id") >= 2_000_000_000_000)
    merged = (
        ohlc_merge(
            ohlc_merge(unit_candles(lo)).unionByName(
                ohlc_merge(unit_candles(hi))
            )
        )
        .select(*OHLC_KEY, *OHLC_PUBLIC_COLS)
        .collect()
    )
    assert [r.asDict() for r in merged] == [
        r.asDict() for r in ohlc_candles(events).collect()
    ]


def test_legacy_bigint_ordk_state_migrates_in_place(spark, tmp_path):
    """Round-7 review finding: a state_dir written by the pre-struct
    kernel (BIGINT folded ordering keys) must not crash-loop the
    stream on a type mismatch — the fold is invertible below 1e6, so
    the first post-upgrade batch converts it and merging continues
    exactly."""
    from starknet_indexer_spark.streaming import state_table

    ev = _events(spark)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    state = str(tmp_path / "candles")

    # build the LEGACY generation: the current kernel's candles with
    # both ordering keys folded back to the old BIGINT form
    from starknet_indexer_spark.operators.timeseries import (
        OHLC_KEY,
        ohlc_merge,
        unit_candles,
    )

    def fold(col):
        return (
            F.col(col)["off"] * F.lit(1_000_000).cast("long") + F.col(col)["eid"]
        ).cast("bigint")

    legacy = ohlc_merge(unit_candles(first)).select(
        *OHLC_KEY,
        fold("open_ordk").alias("open_ordk"),
        "open",
        "high",
        "low",
        fold("close_ordk").alias("close_ordk"),
        "close",
        "volume_cents",
        "n_events",
    ).withColumn("bucket", ohlc._bucket(*OHLC_KEY))
    affected = [r["bucket"] for r in legacy.select("bucket").distinct().collect()]
    state_table.commit_generation(state, legacy, affected=affected, token="e0")

    # the next batch under the NEW kernel migrates then merges
    ohlc.apply_batch(spark, second, state, epoch_token="e1")
    got = _rows(ohlc.read_state(spark, state))
    want = _rows(ohlc_candles(ev))
    assert got == want
    # replay of the same epoch is still a no-op after migration
    ohlc.apply_batch(spark, second, state, epoch_token="e1")
    assert _rows(ohlc.read_state(spark, state)) == want
