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
