"""Daemon integration: streaming feed -> ingest -> both refresh tiers,
continuously — the reference main-loop behavior end-to-end."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from starknet_indexer_spark.daemon import run_indexer

from .test_ingest import POOL, RAW_SCHEMA, init_data, raw_row, swapped_data


def _batch1(spark):
    rows = [
        raw_row(1, 0, 0, "pool_initialized", init_data(**POOL, tick=0, sqrt_ratio=1 << 40)),
        raw_row(2, 0, 0, "swapped",
                swapped_data(0xCAFE, **POOL, amount=10, is_token1=False, limit=5, skip=0,
                             d0=10, d1=-9, sqrt_after=1 << 41, tick_after=-5, liq=1111)),
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def _batch2(spark):
    rows = [
        raw_row(3, 0, 0, "swapped",
                swapped_data(0xCAFE, **POOL, amount=20, is_token1=False, limit=5, skip=0,
                             d0=30, d1=-27, sqrt_after=1 << 42, tick_after=-8, liq=2222)),
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)


@pytest.mark.slow
def test_daemon_end_to_end(spark, tmp_path):
    feed = str(tmp_path / "feed")
    tdir = str(tmp_path / "tables")
    vdir = str(tmp_path / "views")
    ckpt = str(tmp_path / "ckpt")

    _batch1(spark).write.mode("append").parquet(feed)
    q = run_indexer(spark, feed, tdir, vdir, ckpt, analytical_every_s=0)
    try:
        q.processAllAvailable()
        ps1 = spark.read.parquet(os.path.join(vdir, "pool_states")).collect()
        assert len(ps1) == 1 and ps1[0]["tick"] == -5

        _batch2(spark).write.mode("append").parquet(feed)
        q.processAllAvailable()
    finally:
        q.stop()

    # operational tier reflects the newest swap
    ps2 = spark.read.parquet(os.path.join(vdir, "pool_states")).collect()
    assert len(ps2) == 1 and ps2[0]["tick"] == -8
    assert str(ps2[0]["liquidity"]) == "2222"

    # analytical tier materialized hourly volume across both batches
    hv = spark.read.parquet(os.path.join(vdir, "hourly_volume_by_token"))
    total = hv.agg(F.sum("volume")).collect()[0][0]
    assert total is not None and int(total) == 40  # |d0|: 10 + 30

    # cursor advanced to the head block
    from starknet_indexer_spark.ingest import read_cursor

    assert read_cursor(tdir) == 3


@pytest.mark.slow
def test_daemon_in_band_invalidate_refreshes_views(spark, tmp_path):
    """An invalidate marker flowing through the DAEMON (not just the
    bare stream) must truncate the tables AND refresh the operational
    views off the truncated state — the empty-counts (not-None) return
    contract of ingest_micro_batch, end-to-end."""
    from .test_ingest import invalidate_row

    feed = str(tmp_path / "feed")
    tdir = str(tmp_path / "tables")
    vdir = str(tmp_path / "views")
    ckpt = str(tmp_path / "ckpt")

    _batch1(spark).coalesce(1).write.mode("append").parquet(feed)
    _batch2(spark).coalesce(1).write.mode("append").parquet(feed)
    q = run_indexer(
        spark, feed, tdir, vdir, ckpt,
        analytical_every_s=0, max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
        ps = spark.read.parquet(os.path.join(vdir, "pool_states")).collect()
        assert len(ps) == 1 and ps[0]["tick"] == -8  # block-3 swap applied

        # reorg: invalidate block 3 (last valid = 2)
        spark.createDataFrame(
            [invalidate_row(2)], RAW_SCHEMA
        ).coalesce(1).write.mode("append").parquet(feed)
        q.processAllAvailable()
    finally:
        q.stop()

    sw = spark.read.parquet(os.path.join(tdir, "swaps"))
    assert sorted(r["block_number"] for r in sw.collect()) == [2]
    # the view refreshed off the truncated tables: back to block-2 state
    ps = spark.read.parquet(os.path.join(vdir, "pool_states")).collect()
    assert len(ps) == 1 and ps[0]["tick"] == -5
    assert str(ps[0]["liquidity"]) == "1111"


@pytest.mark.slow
def test_daemon_maintenance_compacts_and_zorders_cold_buckets(spark, tmp_path):
    """The maintenance cadence must compact + z-order buckets BELOW
    the live head while the stream runs, without changing any query
    result. Head bucket (still receiving appends) is untouched."""
    from starknet_indexer_spark.ingest import read_cursor
    from .test_ingest import make_raw

    feed = str(tmp_path / "feed")
    tdir = str(tmp_path / "tables")
    vdir = str(tmp_path / "views")
    ckpt = str(tmp_path / "ckpt")

    # bucket 0 gets three separate file sets; head lands in bucket 2
    make_raw(spark, [1, 2]).coalesce(1).write.mode("append").parquet(feed)
    make_raw(spark, [3]).coalesce(1).write.mode("append").parquet(feed)
    make_raw(spark, [4]).coalesce(1).write.mode("append").parquet(feed)
    q = run_indexer(
        spark, feed, tdir, vdir, ckpt,
        analytical_every_s=0,
        maintenance_every_s=None,  # first pass: no maintenance
        max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    swaps_b0 = os.path.join(tdir, "swaps", "block_bucket=0")
    files_before = len([f for f in os.listdir(swaps_b0) if f.endswith(".parquet")])
    assert files_before >= 3
    rows_before = sorted(map(str, spark.read.parquet(os.path.join(tdir, "swaps")).collect()))

    # restart the daemon with maintenance on; a head append in bucket 2
    # makes bucket 0 cold and triggers the pass
    make_raw(spark, [2500]).coalesce(1).write.mode("append").parquet(feed)
    extra_calls = []
    q = run_indexer(
        spark, feed, tdir, vdir, ckpt,
        analytical_every_s=0,
        maintenance_every_s=0,
        zorder_dims={"swaps": [("block_number", "int"), ("pool_key_hash", "hex")]},
        max_files_per_trigger=1,
        # auxiliary maintained-state hook (VERDICT r11 mandate #4): the
        # seam a daemon-owned retrieval-index segment log would use to
        # ride the same tick as compact_all/zorder_table
        extra_maintenance=[lambda s: extra_calls.append(s is spark)],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert read_cursor(tdir) == 2500
    assert extra_calls and all(extra_calls)  # hook rode the tick
    files_after = len([f for f in os.listdir(swaps_b0) if f.endswith(".parquet")])
    assert files_after < files_before
    rows_after = sorted(map(str, spark.read.parquet(os.path.join(tdir, "swaps")).collect()))
    assert len(rows_after) == len(rows_before) + 1  # one swap row per block
    assert set(rows_before) <= set(rows_after)


@pytest.mark.slow
def test_daemon_no_progress_watchdog_stops_stalled_query(spark, tmp_path):
    """Reference src/index.ts:26-46 parity: with NO_BLOCKS_TIMEOUT set,
    a feed that stops producing rows must terminate the indexer (so the
    orchestrator restarts it) instead of idling forever."""
    import time as _time

    feed = str(tmp_path / "feed")
    # schema inference needs one file; it holds ZERO rows, so the
    # watchdog never sees progress
    spark.createDataFrame([], RAW_SCHEMA).coalesce(1).write.parquet(feed)
    fired = []
    q = run_indexer(
        spark,
        feed,
        str(tmp_path / "tables"),
        str(tmp_path / "views"),
        str(tmp_path / "ckpt"),
        trigger={"processingTime": "1 seconds"},
        no_progress_timeout_s=4,
        on_stall=lambda: fired.append(True),
    )
    deadline = _time.monotonic() + 60
    try:
        while q.isActive and _time.monotonic() < deadline:
            _time.sleep(0.5)
        assert not q.isActive, "watchdog did not stop a stalled query"
        assert q.stalled and fired == [True]
    finally:
        if q.isActive:
            q.stop()


@pytest.mark.slow
def test_daemon_watchdog_does_not_stop_live_feed(spark, tmp_path):
    """A feed that keeps delivering rows resets the timer: the query
    must still be alive well past the timeout after steady progress."""
    import time as _time

    feed = str(tmp_path / "feed")
    _batch1(spark).write.mode("append").parquet(feed)
    q = run_indexer(
        spark,
        feed,
        str(tmp_path / "tables"),
        str(tmp_path / "views"),
        str(tmp_path / "ckpt"),
        analytical_every_s=0,
        trigger={"processingTime": "1 seconds"},
        no_progress_timeout_s=30,
    )
    try:
        t0 = _time.monotonic()
        block = 3
        # keep feeding one block every ~2s for ~12s
        while _time.monotonic() - t0 < 12:
            _batch2(spark).withColumn(
                "block_number", F.lit(block).cast("long")
            ).write.mode("append").parquet(feed)
            block += 1
            _time.sleep(2)
        assert q.isActive and not q.stalled
    finally:
        q.stop()


@pytest.mark.slow
def test_daemon_watchdog_ignores_slow_batch_processing(spark, tmp_path, monkeypatch):
    """The watchdog measures feed liveness, not batch duration: a batch
    whose processing (boot refresh / maintenance) exceeds the timeout
    must NOT be read as a stall while the feed is healthy."""
    import time as _time

    from starknet_indexer_spark import daemon as daemon_mod
    from starknet_indexer_spark import runtime as runtime_mod

    real_refresh = runtime_mod.refresh_operational
    slept = []

    def slow_refresh(tables, views_dir):
        if not slept:
            slept.append(True)
            _time.sleep(8)  # > timeout, inside one batch
        return real_refresh(tables, views_dir)

    monkeypatch.setattr(runtime_mod, "refresh_operational", slow_refresh)
    feed = str(tmp_path / "feed")
    _batch1(spark).write.mode("append").parquet(feed)
    q = daemon_mod.run_indexer(
        spark,
        feed,
        str(tmp_path / "tables"),
        str(tmp_path / "views"),
        str(tmp_path / "ckpt"),
        analytical_every_s=0,
        trigger={"processingTime": "1 seconds"},
        no_progress_timeout_s=4,
    )
    try:
        deadline = _time.monotonic() + 30
        while not slept and _time.monotonic() < deadline:
            _time.sleep(0.5)
        _time.sleep(9)  # let the slow batch finish under the watchdog
        assert q.isActive and not q.stalled, "slow batch misread as stall"
    finally:
        q.stop()


@pytest.mark.slow
def test_daemon_watchdog_stops_query_even_if_on_stall_raises(spark, tmp_path):
    import time as _time

    feed = str(tmp_path / "feed")
    spark.createDataFrame([], RAW_SCHEMA).coalesce(1).write.parquet(feed)

    def bad_callback():
        raise RuntimeError("metrics push failed")

    q = run_indexer(
        spark,
        feed,
        str(tmp_path / "tables"),
        str(tmp_path / "views"),
        str(tmp_path / "ckpt"),
        trigger={"processingTime": "1 seconds"},
        no_progress_timeout_s=4,
        on_stall=bad_callback,
    )
    deadline = _time.monotonic() + 60
    try:
        while q.isActive and _time.monotonic() < deadline:
            _time.sleep(0.5)
        assert not q.isActive and q.stalled
    finally:
        if q.isActive:
            q.stop()


def test_watchdog_decision_suspends_cold_boot_and_batches():
    """ADVICE r6: a cold boot whose first trigger (listing a large
    backlog) outlasts the timeout must not read as a stall; neither
    must an in-flight batch; a booted, idle, stale state must."""
    from starknet_indexer_spark.daemon import _watchdog_should_stop

    stale = {"booted": False, "in_batch": False, "last_progress": 0.0}
    # pre-boot: arbitrarily old last_progress never stops the query
    assert not _watchdog_should_stop(stale, timeout_s=1.0, now=1e9)
    # booted but mid-batch: suspended regardless of staleness
    assert not _watchdog_should_stop(
        {"booted": True, "in_batch": True, "last_progress": 0.0},
        timeout_s=1.0,
        now=1e9,
    )
    # booted, idle, fresh: alive
    assert not _watchdog_should_stop(
        {"booted": True, "in_batch": False, "last_progress": 99.5},
        timeout_s=1.0,
        now=100.0,
    )
    # booted, idle, stale: stop
    assert _watchdog_should_stop(
        {"booted": True, "in_batch": False, "last_progress": 0.0},
        timeout_s=1.0,
        now=100.0,
    )


@pytest.mark.slow
def test_daemon_watchdog_stalls_feed_with_no_batches_at_all(spark, tmp_path):
    """Round-7 review finding: a file source that finds NO new files
    never plans a micro-batch, so foreachBatch alone never arms the
    watchdog. Restarting against a caught-up checkpoint with a dead
    feed must still stall out (boot signal = QueryIdleEvent)."""
    import time as _time

    feed = str(tmp_path / "feed")
    tables = str(tmp_path / "tables")
    views = str(tmp_path / "views")
    ckpt = str(tmp_path / "ckpt")
    _batch1(spark).write.mode("append").parquet(feed)
    # first run catches the checkpoint up past every feed file
    q1 = run_indexer(
        spark, feed, tables, views, ckpt,
        trigger={"availableNow": True},
    )
    q1.awaitTermination(120)
    assert not q1.isActive
    # quicker idle events for the test (default throttle is 10s)
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "1000ms")
    fired = []
    q2 = run_indexer(
        spark, feed, tables, views, ckpt,
        trigger={"processingTime": "1 seconds"},
        no_progress_timeout_s=4,
        on_stall=lambda: fired.append(True),
    )
    deadline = _time.monotonic() + 90
    try:
        while q2.isActive and _time.monotonic() < deadline:
            _time.sleep(0.5)
        assert not q2.isActive, (
            "watchdog never armed: no micro-batch ran and the idle "
            "boot signal did not fire"
        )
        assert q2.stalled and fired == [True]
    finally:
        spark.conf.unset("spark.sql.streaming.noDataProgressEventInterval")
        if q2.isActive:
            q2.stop()
