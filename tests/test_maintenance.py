"""Compaction and reorg-to-views consistency: maintenance operations
must never change query results."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from starknet_indexer_spark import runtime
from starknet_indexer_spark.daemon import load_tables
from starknet_indexer_spark.ingest import ingest_batch, invalidate_from_block
from starknet_indexer_spark.maintenance import compact_all, compact_table

from .test_ingest import make_raw


def _rows(df):
    return sorted(map(str, df.collect()))


class TestCompaction:
    @pytest.mark.slow
    def test_compact_preserves_rows(self, spark, tmp_path):
        tdir = str(tmp_path / "t")
        # three separate appends -> >= 3 file sets per bucket
        for blocks in ([1, 2], [3], [4]):
            ingest_batch(spark, make_raw(spark, blocks), tdir)
        swaps_dir = os.path.join(tdir, "swaps")
        before = _rows(spark.read.parquet(swaps_dir))

        stats = compact_table(spark, swaps_dir)
        assert stats, "bucket had multiple files; compaction must act"
        (files_before, files_after), = stats.values()
        assert files_after < files_before

        assert _rows(spark.read.parquet(swaps_dir)) == before

    @pytest.mark.slow
    def test_compact_all_and_head_guard(self, spark, tmp_path):
        tdir = str(tmp_path / "t2")
        ingest_batch(spark, make_raw(spark, [1, 2]), tdir)
        ingest_batch(spark, make_raw(spark, [1500]), tdir)  # bucket 1
        before = _rows(spark.read.parquet(os.path.join(tdir, "swaps")))
        # head bucket (1) excluded
        compact_all(spark, tdir, max_bucket=0)
        assert _rows(spark.read.parquet(os.path.join(tdir, "swaps"))) == before


class TestReorgViewConsistency:
    @pytest.mark.slow
    def test_views_after_reorg_replay_match_fresh_build(self, spark, tmp_path):
        """§3.3 end-to-end: invalidate + re-ingest + refresh must equal
        a from-scratch build at the view level, not just the tables."""
        reorg_dir = str(tmp_path / "reorg")
        fresh_dir = str(tmp_path / "fresh")

        ingest_batch(spark, make_raw(spark, [1, 2, 3, 4]), reorg_dir)
        invalidate_from_block(spark, reorg_dir, 3)
        # reorged chain: block 3 has different content (block 5's payload
        # re-stamped is overkill; simply re-ingest canonical 3,4)
        ingest_batch(spark, make_raw(spark, [3, 4]), reorg_dir)

        ingest_batch(spark, make_raw(spark, [1, 2, 3, 4]), fresh_dir)

        out_a = str(tmp_path / "va")
        out_b = str(tmp_path / "vb")
        runtime.refresh_operational(load_tables(spark, reorg_dir), out_a)
        runtime.refresh_operational(load_tables(spark, fresh_dir), out_b)
        for name in ("pool_states", "per_pool_per_tick_liquidity"):
            a = _rows(spark.read.parquet(os.path.join(out_a, name)))
            b = _rows(spark.read.parquet(os.path.join(out_b, name)))
            assert a == b, name


class TestSortLayout:
    """sort_layout is a pure reorder that must (a) keep contents
    byte-identical and (b) make row-group min/max stats on the sort
    key disjoint enough that point predicates prune most groups."""

    def _scattered_events(self, spark, tmp_path) -> str:
        from starknet_indexer_spark.catalog import load

        tdir = str(tmp_path / "events_scattered")
        # arrival-order layout: hash-scatter user_id across 8 files so
        # every file's [min,max] spans the whole key domain
        (
            load(spark, "/root/testdata/sf0.001", "events")
            .repartition(8, F.md5(F.col("event_id").cast("string")))
            .write.mode("overwrite")
            .parquet(tdir)
        )
        return tdir

    def test_reorder_preserves_rows_and_prunes(self, spark, tmp_path):
        from starknet_indexer_spark.maintenance import (
            layout_overlap_fraction,
            sort_layout,
        )

        tdir = self._scattered_events(spark, tmp_path)
        before_rows = _rows(spark.read.parquet(tdir))
        before = layout_overlap_fraction(tdir, "user_id")
        assert before > 0.8  # scattered: every group overlaps ~everything

        sort_layout(spark, tdir, ["user_id"], n_files=8)
        after = layout_overlap_fraction(tdir, "user_id")
        assert _rows(spark.read.parquet(tdir)) == before_rows
        # 8 range-disjoint files -> a point predicate overlaps ~1/8
        # of row groups (allow slack for range-partitioner sampling)
        assert after < 0.3, (before, after)

    def test_recovers_from_completed_swap_leftover(self, spark, tmp_path):
        """Crash AFTER os.replace(staging, table) but BEFORE the final
        rmtree leaves BOTH the table and ._old on disk. The next
        sort_layout must clear the stale ._old instead of failing
        ENOTEMPTY at its own os.replace(table, trash)."""
        import os

        from starknet_indexer_spark.maintenance import sort_layout

        tdir = self._scattered_events(spark, tmp_path)
        before_rows = _rows(spark.read.parquet(tdir))
        # simulate the post-swap crash: a stale non-empty ._old next
        # to a live table dir
        trash = tdir + "._old"
        os.makedirs(trash)
        with open(os.path.join(trash, "stale.parquet"), "w") as f:
            f.write("stale")
        sort_layout(spark, tdir, ["user_id"], n_files=4)  # must not raise
        assert _rows(spark.read.parquet(tdir)) == before_rows
        assert not os.path.exists(trash)


class TestSwapInCrashHygiene:
    def test_stale_trash_does_not_poison_refresh(self, spark, tmp_path):
        """A leftover non-empty .trash from an interrupted swap must
        not make the next refresh raise (os.replace onto a non-empty
        dir fails) — the daemon would otherwise crash-loop until
        manual cleanup."""
        import os

        from starknet_indexer_spark.runtime import _swap_in

        out = str(tmp_path / "view_out")
        df1 = spark.range(3).selectExpr("id AS v")
        _swap_in(df1, out)
        # simulate the interrupted prior swap: non-empty trash leftover
        trash = out + ".trash"
        os.makedirs(trash, exist_ok=True)
        with open(os.path.join(trash, "orphan.parquet"), "w") as f:
            f.write("stale")
        df2 = spark.range(5).selectExpr("id AS v")
        _swap_in(df2, out)  # must not raise
        assert spark.read.parquet(out).count() == 5
        assert not os.path.isdir(trash)


def make_raw_pools(spark, blocks, n_pools=8):
    """Multi-pool swap feed: each block carries one swap per pool, so
    arrival-order files span every pool (the layout z-order fixes)."""
    from .test_ingest import POOL, RAW_SCHEMA, raw_row, swapped_data

    rows = []
    for b in blocks:
        for p in range(n_pools):
            pool = dict(POOL, token0=0xAAA0 + p, token1=0xBBB0 + p)
            rows.append(
                raw_row(
                    b, p, 0, "swapped",
                    swapped_data(
                        0xCAFE, **pool, amount=100 + b, is_token1=False,
                        limit=5, skip=0, d0=10 * b, d1=-9 * b,
                        sqrt_after=1 << 40, tick_after=-b, liq=b * 1000,
                    ),
                )
            )
    return spark.createDataFrame(rows, RAW_SCHEMA)


class TestZorderCompaction:
    def _build(self, spark, tmp_path, n_appends=10):
        tdir = str(tmp_path / "zt")
        for i in range(n_appends):
            ingest_batch(
                spark, make_raw_pools(spark, [10 * i + j for j in range(10)]), tdir
            )
        return tdir, os.path.join(tdir, "swaps")

    def test_zorder_preserves_rows_and_prunes_both_dims(self, spark, tmp_path):
        """After z-order compaction a point predicate on pool_key_hash
        AND one on block_number must both prune row groups; arrival
        order prunes only block_number. Contents unchanged."""
        from starknet_indexer_spark.maintenance import (
            row_groups_matching,
            zorder_table,
        )

        tdir, swaps_dir = self._build(spark, tmp_path)
        before = _rows(spark.read.parquet(swaps_dir))
        pool = spark.read.parquet(swaps_dir).select("pool_key_hash").first()[0]

        m_pool_before, total_before = row_groups_matching(
            swaps_dir, "pool_key_hash", pool
        )
        assert total_before >= 8
        # arrival order: every file spans every pool -> no pruning
        assert m_pool_before == total_before

        stats = zorder_table(
            spark,
            swaps_dir,
            dims=[("block_number", "int"), ("pool_key_hash", "hex")],
            target_file_bytes=3 * 1024,
        )
        assert stats

        from starknet_indexer_spark.maintenance import row_groups_matching_all

        assert _rows(spark.read.parquet(swaps_dir)) == before
        m_pool, total = row_groups_matching(swaps_dir, "pool_key_hash", pool)
        m_blk, _ = row_groups_matching(swaps_dir, "block_number", 42)
        m_both, _ = row_groups_matching_all(
            swaps_dir, [("pool_key_hash", pool), ("block_number", 42)]
        )
        assert total >= 8
        # z-order: BOTH single-dim predicates prune (arrival order
        # prunes only block); the V13-shaped conjunction prunes best
        assert m_pool * 2 <= total, (m_pool, total)
        assert m_blk * 2 <= total, (m_blk, total)
        assert m_both <= m_pool and m_both <= m_blk, (m_both, m_pool, m_blk)

    def test_zorder_marker_skips_unchanged_buckets(self, spark, tmp_path):
        """Steady-state maintenance must be incremental: a second
        z-order pass over untouched buckets rewrites NOTHING (the
        _zordered marker), and a bucket rewritten since (reorg
        invalidation deletes the marker with the dir) is re-clustered
        while the others stay skipped."""
        from starknet_indexer_spark.maintenance import zorder_table

        dims = [("block_number", "int"), ("pool_key_hash", "hex")]
        tdir = str(tmp_path / "zt")
        # two block buckets: 0..19 -> bucket 0, 1000..1019 -> bucket 1
        for base in (0, 10, 1000, 1010):
            ingest_batch(
                spark, make_raw_pools(spark, [base + j for j in range(10)]), tdir
            )
        swaps_dir = os.path.join(tdir, "swaps")
        first = zorder_table(spark, swaps_dir, dims, target_file_bytes=12 * 1024)
        assert sorted(first) == ["block_bucket=0", "block_bucket=1"]
        second = zorder_table(spark, swaps_dir, dims, target_file_bytes=12 * 1024)
        assert second == {}  # nothing changed -> nothing rewritten

        # a reorg truncating into bucket 1 rewrites it (marker gone);
        # only that bucket is re-clustered on the next pass
        invalidate_from_block(spark, tdir, 1015)
        third = zorder_table(spark, swaps_dir, dims, target_file_bytes=12 * 1024)
        assert list(third) == ["block_bucket=1"], third
        # done_marker=None forces the full re-cluster escape hatch
        forced = zorder_table(
            spark, swaps_dir, dims, target_file_bytes=12 * 1024, done_marker=None
        )
        assert sorted(forced) == ["block_bucket=0", "block_bucket=1"]

    def test_reorg_after_zorder(self, spark, tmp_path):
        """Invalidation must still truncate correctly on a z-ordered
        table (partition scheme and contents are unchanged by the
        rewrite)."""
        from starknet_indexer_spark.maintenance import zorder_table

        tdir, swaps_dir = self._build(spark, tmp_path, n_appends=4)
        zorder_table(
            spark,
            swaps_dir,
            dims=[("block_number", "int"), ("pool_key_hash", "hex")],
            target_file_bytes=12 * 1024,
        )
        invalidate_from_block(spark, tdir, 25)
        got = spark.read.parquet(swaps_dir)
        assert got.agg(F.max("block_number")).collect()[0][0] == 24
        assert got.count() == 25 * 8  # blocks 0..24 x 8 pools


class TestBucketSwapCrashRecovery:
    def test_mid_swap_crash_restores_bucket(self, spark, tmp_path):
        """A crash between the two os.replace calls leaves the
        bucket's only copy in {table}._old_b<N>; the next maintenance
        pass must restore it before doing anything else."""
        from starknet_indexer_spark.maintenance import (
            compact_table,
            recover_bucket_swaps,
        )

        tdir = str(tmp_path / "t")
        for blocks in ([1, 2], [3]):
            ingest_batch(spark, make_raw(spark, blocks), tdir)
        swaps_dir = os.path.join(tdir, "swaps")
        before = _rows(spark.read.parquet(swaps_dir))
        bdir = os.path.join(swaps_dir, "block_bucket=0")

        # simulate the mid-swap crash: bucket moved to trash, staging
        # incomplete
        os.replace(bdir, f"{swaps_dir}._old_b0")
        os.makedirs(f"{swaps_dir}._compact_b0")
        assert not os.path.isdir(bdir)

        recover_bucket_swaps(swaps_dir)
        assert os.path.isdir(bdir)
        assert not os.path.exists(f"{swaps_dir}._old_b0")
        assert not os.path.exists(f"{swaps_dir}._compact_b0")
        assert _rows(spark.read.parquet(swaps_dir)) == before

        # completed-swap leftovers (bucket present) are just removed
        os.makedirs(f"{swaps_dir}._old_b0/x")
        recover_bucket_swaps(swaps_dir)
        assert os.path.isdir(bdir)
        assert not os.path.exists(f"{swaps_dir}._old_b0")

        # and compact_table self-heals on entry
        os.replace(bdir, f"{swaps_dir}._old_b0")
        compact_table(spark, swaps_dir)
        assert _rows(spark.read.parquet(swaps_dir)) == before
