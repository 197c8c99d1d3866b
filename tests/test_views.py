"""View-level golden tests: each V-view vs a DuckDB SQL twin written
directly from the reference's Postgres semantics (src/dao.ts cites in
each view module), over the deterministic Family B fixtures.

DuckDB dialect notes:
- arg_max replaces the reference's LATERAL ... ORDER BY ... LIMIT 1;
- GREATEST in Postgres (and Spark) ignores NULLs, DuckDB's does not —
  goldens use GREATEST(COALESCE(a,b), COALESCE(b,a));
- integer sums are CAST to DECIMAL(38,0) so pandas dtypes line up;
- the Q128 fee math uses HUGEINT floor-division, mirroring
  functions.core.q128_fee_amount.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from starknet_indexer_spark.views import VIEWS, load_ekubo_tables

from .fixtures_b import generate

TWO64 = "18446744073709551616"


@pytest.fixture(scope="module")
def bdir():
    return generate()


@pytest.fixture(scope="module")
def btables(spark, bdir):
    return load_ekubo_tables(spark, bdir)


@pytest.fixture(scope="module")
def bduck(bdir):
    con = duckdb.connect()
    import os

    for f in os.listdir(bdir):
        if f.endswith(".parquet"):
            name = f[: -len(".parquet")]
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{bdir}/{f}')")
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # Spark decimals arrive as Decimal objects, DuckDB's may
            # arrive as float64 — coerce both numeric so sort + compare
            # agree (rtol covers the float rounding)
            try:
                df[c] = pd.to_numeric(df[c], errors="raise").astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def check(spark_df, con, sql):
    got = _norm(spark_df.toPandas())
    want = _norm(con.execute(sql).df())
    assert len(got) == len(want), f"rows: spark={len(got)} duckdb={len(want)}"
    assert list(got.columns) == list(want.columns), f"{list(got.columns)} vs {list(want.columns)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9, atol=1e-9)


GOLDEN_V1 = """
WITH last_swap AS (
  SELECT pool_key_hash, MAX(event_id) e, arg_max(sqrt_ratio_after, event_id) sr,
         arg_max(tick_after, event_id) t, arg_max(liquidity_after, event_id) lq
  FROM swaps GROUP BY 1),
li AS (
  SELECT pool_key_hash, MAX(event_id) e, arg_max(sqrt_ratio, event_id) sr,
         arg_max(tick, event_id) t
  FROM pool_initializations GROUP BY 1),
lss AS (
  SELECT pk.key_hash,
         COALESCE(ls.e, li.e) AS last_swap_event_id,
         COALESCE(ls.sr, li.sr) AS sqrt_ratio,
         COALESCE(ls.t, li.t) AS tick,
         COALESCE(ls.lq, 0) AS liquidity_last
  FROM pool_keys pk
  LEFT JOIN last_swap ls ON pk.key_hash = ls.pool_key_hash
  LEFT JOIN li ON pk.key_hash = li.pool_key_hash),
pl AS (
  SELECT key_hash,
         (SELECT MAX(event_id) FROM position_updates pu
          WHERE pu.pool_key_hash = lss.key_hash) AS last_update_event_id,
         liquidity_last + COALESCE(
           (SELECT SUM(liquidity_delta) FROM position_updates pu
            WHERE pu.event_id > lss.last_swap_event_id
              AND pu.pool_key_hash = lss.key_hash
              AND lss.tick BETWEEN pu.lower_bound AND pu.upper_bound - 1), 0) AS liquidity
  FROM lss)
SELECT lss.key_hash AS pool_key_hash,
       CAST(sqrt_ratio AS DECIMAL(38,0)) AS sqrt_ratio,
       tick,
       CAST(liquidity AS DECIMAL(38,0)) AS liquidity,
       GREATEST(COALESCE(lss.last_swap_event_id, pl.last_update_event_id),
                COALESCE(pl.last_update_event_id, lss.last_swap_event_id)) AS last_event_id,
       pl.last_update_event_id AS last_liquidity_update_event_id
FROM lss JOIN pl ON lss.key_hash = pl.key_hash
"""


def test_v1_pool_states(btables, bduck):
    import pyspark.sql.functions as F

    df = VIEWS["pool_states"](btables)
    # fixture columns are int64; align output widths with the golden
    df = df.withColumn("sqrt_ratio", F.col("sqrt_ratio").cast("decimal(38,0)"))
    check(df, bduck, GOLDEN_V1)


GOLDEN_V2 = """
WITH atd AS (
  SELECT pool_key_hash, lower_bound AS tick,
         SUM(liquidity_delta) AS net, SUM(liquidity_delta) AS tot
  FROM position_updates GROUP BY 1, 2
  UNION ALL
  SELECT pool_key_hash, upper_bound, SUM(-liquidity_delta), SUM(liquidity_delta)
  FROM position_updates GROUP BY 1, 2)
SELECT pool_key_hash, tick,
       CAST(SUM(net) AS DECIMAL(38,0)) AS net_liquidity_delta_diff,
       CAST(SUM(tot) AS DECIMAL(38,0)) AS total_liquidity_on_tick
FROM atd GROUP BY 1, 2 HAVING SUM(net) <> 0
"""


def test_v2_tick_liquidity(btables, bduck):
    check(VIEWS["per_pool_per_tick_liquidity"](btables), bduck, GOLDEN_V2)


def test_v2_has_cancellations(btables):
    """Fixture sanity: some (pool, tick) sums cancel to zero, so the
    delete-on-zero filter is actually exercised (src/dao.ts:535-540)."""
    from pyspark.sql import functions as F

    pu = btables["position_updates"]
    lower = pu.groupBy("pool_key_hash", "lower_bound").agg(
        F.sum("liquidity_delta").alias("s")
    )
    assert lower.filter(F.col("s") == 0).count() > 0


GOLDEN_V13 = f"""
WITH swap_data AS (
  SELECT s.pool_key_hash AS key_hash, date_trunc('hour', b.time) AS hour,
         CASE WHEN s.delta0 >= 0 THEN pk.token0 ELSE pk.token1 END AS token,
         SUM(CASE WHEN s.delta0 >= 0 THEN s.delta0 ELSE s.delta1 END) AS volume,
         SUM((CAST(CASE WHEN s.delta0 >= 0 THEN s.delta0 ELSE s.delta1 END AS HUGEINT)
              * (CAST(pk.fee AS HUGEINT) // {TWO64})) // {TWO64}) AS fees,
         COUNT(1) AS swap_count
  FROM swaps s
  JOIN pool_keys pk ON s.pool_key_hash = pk.key_hash
  JOIN blocks b ON s.block_number = b.number
  GROUP BY 1, 2, 3),
fees0 AS (
  SELECT fa.pool_key_hash, date_trunc('hour', b.time), pk.token0,
         0, SUM(fa.amount0), 0
  FROM fees_accumulated fa
  JOIN pool_keys pk ON fa.pool_key_hash = pk.key_hash
  JOIN blocks b ON fa.block_number = b.number
  WHERE fa.amount0 > 0 GROUP BY 1, 2, 3),
fees1 AS (
  SELECT fa.pool_key_hash, date_trunc('hour', b.time), pk.token1,
         0, SUM(fa.amount1), 0
  FROM fees_accumulated fa
  JOIN pool_keys pk ON fa.pool_key_hash = pk.key_hash
  JOIN blocks b ON fa.block_number = b.number
  WHERE fa.amount1 > 0 GROUP BY 1, 2, 3),
combined AS (
  SELECT * FROM swap_data UNION ALL SELECT * FROM fees0 UNION ALL SELECT * FROM fees1)
SELECT key_hash, hour, token,
       CAST(SUM(volume) AS DECIMAL(38,0)) AS volume,
       CAST(SUM(fees) AS DECIMAL(38,0)) AS fees,
       CAST(SUM(swap_count) AS DECIMAL(38,0)) AS swap_count
FROM combined GROUP BY 1, 2, 3
"""


def test_v13_hourly_volume(btables, bduck):
    check(VIEWS["hourly_volume_by_token"](btables), bduck, GOLDEN_V13)


def test_v13_fees_nonzero(btables):
    from pyspark.sql import functions as F

    hv = VIEWS["hourly_volume_by_token"](btables)
    assert hv.filter(F.col("fees") > 0).count() > 0


GOLDEN_V14 = """
WITH rev0 AS (
  SELECT pfp.pool_key_hash AS key_hash, date_trunc('hour', b.time) AS hour,
         pk.token0 AS token, -SUM(pfp.delta0) AS revenue
  FROM protocol_fees_paid pfp
  JOIN pool_keys pk ON pfp.pool_key_hash = pk.key_hash
  JOIN blocks b ON pfp.block_number = b.number
  WHERE pfp.delta0 <> 0 GROUP BY 1, 2, 3),
rev1 AS (
  SELECT pfp.pool_key_hash, date_trunc('hour', b.time), pk.token1, -SUM(pfp.delta1)
  FROM protocol_fees_paid pfp
  JOIN pool_keys pk ON pfp.pool_key_hash = pk.key_hash
  JOIN blocks b ON pfp.block_number = b.number
  WHERE pfp.delta1 <> 0 GROUP BY 1, 2, 3),
total AS (SELECT * FROM rev0 UNION ALL SELECT * FROM rev1)
SELECT key_hash, hour, token, CAST(SUM(revenue) AS DECIMAL(38,0)) AS revenue
FROM total GROUP BY 1, 2, 3
"""


def test_v14_hourly_revenue(btables, bduck):
    check(VIEWS["hourly_revenue_by_token"](btables), bduck, GOLDEN_V14)


GOLDEN_V15 = """
WITH per_block AS (
  SELECT s.block_number, pk.token0, pk.token1,
         SUM(s.delta0) AS d0, SUM(s.delta1) AS d1, COUNT(1) AS n
  FROM swaps s JOIN pool_keys pk ON s.pool_key_hash = pk.key_hash
  GROUP BY 1, 2, 3)
SELECT token0, token1, date_trunc('hour', b.time) AS hour,
       CAST(SUM(ABS(CAST(d0 AS HUGEINT) * d1)) AS DECIMAL(38,0)) AS k_volume,
       CAST(SUM(CAST(d1 AS HUGEINT) * d1) AS DECIMAL(38,0)) AS total,
       CAST(SUM(n) AS DECIMAL(38,0)) AS swap_count
FROM per_block JOIN blocks b ON per_block.block_number = b.number
WHERE d0 <> 0 AND d1 <> 0
GROUP BY 1, 2, 3
"""


def test_v15_hourly_price(btables, bduck):
    check(VIEWS["hourly_price_data"](btables), bduck, GOLDEN_V15)


GOLDEN_V16 = """
WITH gp AS (
  SELECT pool_key_hash, date_trunc('hour', b.time) AS hour,
         SUM(delta0) AS delta0, SUM(delta1) AS delta1
  FROM swaps JOIN blocks b ON swaps.block_number = b.number GROUP BY 1, 2
  UNION ALL
  SELECT pool_key_hash, date_trunc('hour', b.time), SUM(delta0), SUM(delta1)
  FROM position_updates JOIN blocks b ON position_updates.block_number = b.number GROUP BY 1, 2
  UNION ALL
  SELECT pool_key_hash, date_trunc('hour', b.time), SUM(delta0), SUM(delta1)
  FROM position_fees_collected JOIN blocks b ON position_fees_collected.block_number = b.number
  GROUP BY 1, 2
  UNION ALL
  SELECT pool_key_hash, date_trunc('hour', b.time), SUM(delta0), SUM(delta1)
  FROM protocol_fees_paid JOIN blocks b ON protocol_fees_paid.block_number = b.number GROUP BY 1, 2
  UNION ALL
  SELECT pool_key_hash, date_trunc('hour', b.time), SUM(amount0), SUM(amount1)
  FROM fees_accumulated JOIN blocks b ON fees_accumulated.block_number = b.number GROUP BY 1, 2),
td AS (
  SELECT gp.pool_key_hash, gp.hour, pk.token0 AS token, SUM(delta0) AS delta
  FROM gp JOIN pool_keys pk ON pk.key_hash = gp.pool_key_hash GROUP BY 1, 2, 3
  UNION ALL
  SELECT gp.pool_key_hash, gp.hour, pk.token1, SUM(delta1)
  FROM gp JOIN pool_keys pk ON pk.key_hash = gp.pool_key_hash GROUP BY 1, 2, 3)
SELECT pool_key_hash AS key_hash, hour, token, CAST(SUM(delta) AS DECIMAL(38,0)) AS delta
FROM td GROUP BY 1, 2, 3
"""


def test_v16_hourly_tvl_delta(btables, bduck):
    check(VIEWS["hourly_tvl_delta_by_token"](btables), bduck, GOLDEN_V16)


GOLDEN_V3 = """
WITH lvoe AS (
  SELECT v.key_hash, MAX(v.event_id) AS e,
         arg_max(v.token0_sale_rate, v.event_id) AS r0,
         arg_max(v.token1_sale_rate, v.event_id) AS r1,
         arg_max(v.block_number, v.event_id) AS bn
  FROM twamm_virtual_order_executions v
  JOIN pool_keys pk ON pk.key_hash = v.key_hash
  GROUP BY 1),
lv AS (
  SELECT lvoe.*, b.time AS lvet FROM lvoe JOIN blocks b ON lvoe.bn = b.number),
active AS (
  SELECT lv.key_hash,
         SUM(t.sale_rate_delta0) AS d0, SUM(t.sale_rate_delta1) AS d1,
         MAX(t.event_id) AS last_ou
  FROM lv JOIN twamm_order_updates t
    ON t.key_hash = lv.key_hash AND t.event_id > lv.e
   AND t.start_time <= lv.lvet AND t.end_time > lv.lvet
  GROUP BY 1)
SELECT lv.key_hash AS pool_key_hash,
       CAST(lv.r0 + COALESCE(a.d0, 0) AS DECIMAL(38,0)) AS token0_sale_rate,
       CAST(lv.r1 + COALESCE(a.d1, 0) AS DECIMAL(38,0)) AS token1_sale_rate,
       lv.lvet AS last_virtual_execution_time,
       COALESCE(a.last_ou, lv.e) AS last_event_id
FROM lv LEFT JOIN active a ON lv.key_hash = a.key_hash
"""


def test_v3_twamm_pool_states(btables, bduck):
    check(VIEWS["twamm_pool_states"](btables), bduck, GOLDEN_V3)


GOLDEN_V4 = """
WITH aod AS (
  SELECT key_hash, start_time AS time,
         SUM(sale_rate_delta0) AS d0, SUM(sale_rate_delta1) AS d1
  FROM twamm_order_updates GROUP BY 1, 2
  UNION ALL
  SELECT key_hash, end_time, -SUM(sale_rate_delta0), -SUM(sale_rate_delta1)
  FROM twamm_order_updates GROUP BY 1, 2)
SELECT key_hash AS pool_key_hash, time,
       CAST(SUM(d0) AS DECIMAL(38,0)) AS net_sale_rate_delta0,
       CAST(SUM(d1) AS DECIMAL(38,0)) AS net_sale_rate_delta1
FROM aod GROUP BY 1, 2
HAVING SUM(d0) <> 0 OR SUM(d1) <> 0
"""


def test_v4_sale_rate_deltas(btables, bduck):
    check(VIEWS["twamm_sale_rate_deltas"](btables), bduck, GOLDEN_V4)


GOLDEN_V5 = """
WITH p AS (SELECT key_hash, MAX(event_id) AS pe FROM limit_order_placed GROUP BY 1),
c AS (SELECT key_hash, MAX(event_id) AS ce FROM limit_order_closed GROUP BY 1)
SELECT p.key_hash AS pool_key_hash,
       GREATEST(p.pe, COALESCE(c.ce, 0)) AS last_event_id
FROM p LEFT JOIN c ON p.key_hash = c.key_hash
"""


def test_v5_limit_order_states(btables, bduck):
    check(VIEWS["limit_order_pool_states"](btables), bduck, GOLDEN_V5)


def test_v6_spline_pools(btables, bduck):
    check(
        VIEWS["spline_pools"](btables),
        bduck,
        "SELECT DISTINCT pool_key_hash FROM liquidity_updated",
    )


def test_v9_oracle_states(btables, bduck):
    check(
        VIEWS["oracle_pool_states"](btables),
        bduck,
        """SELECT key_hash AS pool_key_hash,
                  MAX(snapshot_block_timestamp) AS last_snapshot_block_timestamp
           FROM oracle_snapshots GROUP BY 1""",
    )


GOLDEN_V7 = f"""
WITH as_of AS (SELECT MAX(time) AS t FROM blocks),
hv AS ({GOLDEN_V13}),
ht AS ({GOLDEN_V16}),
volume AS (
  SELECT hv.key_hash,
         SUM(CASE WHEN hv.token = pk.token0 THEN hv.volume ELSE 0 END) AS volume0,
         SUM(CASE WHEN hv.token = pk.token1 THEN hv.volume ELSE 0 END) AS volume1,
         SUM(CASE WHEN hv.token = pk.token0 THEN hv.fees ELSE 0 END) AS fees0,
         SUM(CASE WHEN hv.token = pk.token1 THEN hv.fees ELSE 0 END) AS fees1
  FROM hv JOIN pool_keys pk ON hv.key_hash = pk.key_hash, as_of
  WHERE hv.hour >= as_of.t - INTERVAL 24 HOURS
  GROUP BY 1),
tvl_total AS (
  SELECT ht.key_hash,
         SUM(CASE WHEN ht.token = pk.token0 THEN ht.delta ELSE 0 END) AS tvl0,
         SUM(CASE WHEN ht.token = pk.token1 THEN ht.delta ELSE 0 END) AS tvl1
  FROM ht JOIN pool_keys pk ON ht.key_hash = pk.key_hash GROUP BY 1),
tvl_24h AS (
  SELECT ht.key_hash,
         SUM(CASE WHEN ht.token = pk.token0 THEN ht.delta ELSE 0 END) AS tvl0,
         SUM(CASE WHEN ht.token = pk.token1 THEN ht.delta ELSE 0 END) AS tvl1
  FROM ht JOIN pool_keys pk ON ht.key_hash = pk.key_hash, as_of
  WHERE ht.hour >= as_of.t - INTERVAL 24 HOURS
  GROUP BY 1)
SELECT pk.key_hash,
       CAST(COALESCE(v.volume0, 0) AS DECIMAL(38,0)) AS volume0_24h,
       CAST(COALESCE(v.volume1, 0) AS DECIMAL(38,0)) AS volume1_24h,
       CAST(COALESCE(v.fees0, 0) AS DECIMAL(38,0)) AS fees0_24h,
       CAST(COALESCE(v.fees1, 0) AS DECIMAL(38,0)) AS fees1_24h,
       CAST(COALESCE(t.tvl0, 0) AS DECIMAL(38,0)) AS tvl0_total,
       CAST(COALESCE(t.tvl1, 0) AS DECIMAL(38,0)) AS tvl1_total,
       CAST(COALESCE(d.tvl0, 0) AS DECIMAL(38,0)) AS tvl0_delta_24h,
       CAST(COALESCE(d.tvl1, 0) AS DECIMAL(38,0)) AS tvl1_delta_24h
FROM pool_keys pk
LEFT JOIN volume v ON v.key_hash = pk.key_hash
LEFT JOIN tvl_total t ON t.key_hash = pk.key_hash
LEFT JOIN tvl_24h d ON d.key_hash = pk.key_hash
"""


def test_v7_last_24h_stats(btables, bduck):
    from pyspark.sql import functions as F

    as_of = btables["blocks"].agg(F.max("time")).collect()[0][0]
    hv = VIEWS["hourly_volume_by_token"](btables)
    ht = VIEWS["hourly_tvl_delta_by_token"](btables)
    df = VIEWS["last_24h_pool_stats"](btables, hv, ht, as_of)
    check(df, bduck, GOLDEN_V7)
