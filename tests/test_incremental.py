"""Incremental-maintenance equivalence tests — the reference's own
oracle (incremental table == defining view, src/dao.ts:510-515) plus
the runtime refresh tiers.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark import runtime
from starknet_indexer_spark.streaming.incremental import (
    apply_batch,
    read_state,
    stream_maintain,
)
from starknet_indexer_spark.views import VIEWS, load_ekubo_tables

from .fixtures_b import generate


@pytest.fixture(scope="module")
def bdir():
    return generate()


@pytest.fixture(scope="module")
def btables(spark, bdir):
    return load_ekubo_tables(spark, bdir)


def _rows(df):
    return {
        (
            str(r["pool_key_hash"]),
            r["tick"],
            str(r["net_liquidity_delta_diff"]),
            str(r["total_liquidity_on_tick"]),
        )
        for r in df.collect()
    }


def _chunks(pu, n=3):
    ids = sorted(r["event_id"] for r in pu.select("event_id").collect())
    bounds = [ids[len(ids) * i // n] for i in range(1, n)]
    lo = None
    out = []
    for b in bounds + [None]:
        c = pu
        if lo is not None:
            c = c.filter(F.col("event_id") >= lo)
        if b is not None:
            c = c.filter(F.col("event_id") < b)
        out.append(c)
        lo = b
    return out


class TestIncrementalTickLiquidity:
    def test_batch_merge_equals_recompute(self, spark, btables, tmp_path):
        state_dir = str(tmp_path / "state")
        pu = btables["position_updates"]
        for chunk in _chunks(pu):
            apply_batch(spark, chunk, state_dir)
        want = VIEWS["per_pool_per_tick_liquidity"](btables)
        assert _rows(read_state(spark, state_dir)) == _rows(want)

    def test_streaming_merge_equals_recompute(self, spark, btables, tmp_path):
        feed = str(tmp_path / "feed")
        state_dir = str(tmp_path / "sstate")
        ckpt = str(tmp_path / "ckpt")
        chunks = _chunks(btables["position_updates"])
        chunks[0].write.mode("append").parquet(feed)
        q = stream_maintain(spark, feed, state_dir, ckpt)
        try:
            q.processAllAvailable()
            for c in chunks[1:]:
                c.write.mode("append").parquet(feed)
                q.processAllAvailable()
        finally:
            q.stop()
        want = VIEWS["per_pool_per_tick_liquidity"](btables)
        assert _rows(read_state(spark, state_dir)) == _rows(want)

    def test_delete_on_zero(self, spark, tmp_path):
        """A burn that exactly cancels a mint removes the row (the
        reference trigger's DELETE branch, src/dao.ts:535-540)."""
        state_dir = str(tmp_path / "zstate")
        mk = lambda delta: spark.createDataFrame(
            [(1, -10, 10, delta)],
            "pool_key_hash long, lower_bound int, upper_bound int, liquidity_delta long",
        )
        apply_batch(spark, mk(500), state_dir)
        assert read_state(spark, state_dir).count() == 2
        apply_batch(spark, mk(-500), state_dir)
        assert read_state(spark, state_dir).count() == 0


class TestRuntimeTiers:
    def test_operational_refresh(self, spark, btables, tmp_path):
        out = str(tmp_path / "op")
        done = runtime.refresh_operational(btables, out)
        assert set(done) == set(runtime.OPERATIONAL)
        ps = VIEWS["pool_states"](btables)
        counts = {
            "pool_states": ps.count(),
            "per_pool_per_tick_liquidity": VIEWS["per_pool_per_tick_liquidity"](btables).count(),
            "oracle_pool_states": VIEWS["oracle_pool_states"](btables).count(),
            "spline_pools": VIEWS["spline_pools"](btables).count(),
        }
        for name, want in counts.items():
            df = spark.read.parquet(os.path.join(out, name))
            assert df.count() == want, name

    @pytest.mark.slow
    def test_analytical_incremental_equals_full(self, spark, btables, tmp_path):
        """Overlap-window upsert == full-history rebuild (the A9
        idempotence the reference relies on)."""
        full_root = str(tmp_path / "full")
        inc_root = str(tmp_path / "inc")
        blocks = btables["blocks"]
        t_max = blocks.agg(F.max("time")).collect()[0][0]
        as_of = t_max

        runtime.refresh_analytical(spark, btables, full_root, as_of, since=None)

        # incremental: full build from truncated history, then upsert
        # the suffix with an overlap window
        cut = t_max.replace(minute=0, second=0, microsecond=0)
        since = cut - __import__("datetime").timedelta(hours=2)
        cut_blocks = blocks.filter(F.col("time") < F.lit(since).cast("timestamp"))
        old_tables = dict(btables)
        old_tables["blocks"] = cut_blocks
        runtime.refresh_analytical(spark, old_tables, inc_root, as_of, since=None)
        runtime.refresh_analytical(spark, btables, inc_root, as_of, since=since)

        for name in runtime.HOURLY:
            want = spark.read.parquet(os.path.join(full_root, name))
            got = spark.read.parquet(os.path.join(inc_root, name))
            w = {tuple(map(str, r)) for r in want.collect()}
            g = {tuple(map(str, r)) for r in got.collect()}
            assert g == w, f"{name}: inc != full"


class TestZeroNetReactivation:
    def test_total_survives_net_zero_crossing(self, spark, tmp_path):
        """Two positions sharing tick 0 as lower and upper bound give
        net 0 there while total stays live; a later position at that
        tick must resume from the accumulated total — exactly what a
        full recompute of the V2 view produces (the state retains the
        hidden net-0 row; read_state hides it while net is 0)."""
        state_dir = str(tmp_path / "rstate")
        schema = (
            "pool_key_hash long, lower_bound int, upper_bound int, "
            "liquidity_delta long"
        )
        # position A [0, 10] +100 (tick 0 is lower: net +100, tot +100)
        # position B [-10, 0] +100 (tick 0 is upper: net -100, tot +100)
        batch1 = spark.createDataFrame([(1, 0, 10, 100), (1, -10, 0, 100)], schema)
        apply_batch(spark, batch1, state_dir)
        served = {
            (r["tick"], int(r["net_liquidity_delta_diff"]),
             int(r["total_liquidity_on_tick"]))
            for r in read_state(spark, state_dir).collect()
        }
        assert (0, 100, 100) not in served  # net-0 tick hidden
        assert {t for t, _, _ in served} == {-10, 10}
        # position C [0, 5] +50 reactivates tick 0
        batch2 = spark.createDataFrame([(1, 0, 5, 50)], schema)
        apply_batch(spark, batch2, state_dir)
        got = {
            (r["tick"], int(r["net_liquidity_delta_diff"]),
             int(r["total_liquidity_on_tick"]))
            for r in read_state(spark, state_dir).collect()
        }
        # recompute over ALL updates: tick 0 net 50, total 250
        assert (0, 50, 250) in got, got
