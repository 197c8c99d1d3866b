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
