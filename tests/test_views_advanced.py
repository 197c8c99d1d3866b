"""Golden tests for the advanced views: V8 (token registry dedup),
V10 (realized volatility), V11 (market depth), V12 (voting weights),
V17 (staker rewards) — DuckDB twins of the reference semantics over
the Family B fixtures."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.views import VIEWS, load_ekubo_tables
from starknet_indexer_spark.views.staker_rewards import calculate_staker_rewards

from .fixtures_b import generate
from .test_views import GOLDEN_V2, GOLDEN_V15, _norm, check

TWO64 = "18446744073709551616"


@pytest.fixture(scope="module")
def bdir():
    return generate()


@pytest.fixture(scope="module")
def btables(spark, bdir):
    return load_ekubo_tables(spark, bdir)


@pytest.fixture(scope="module")
def bduck(bdir):
    import os

    con = duckdb.connect()
    for f in os.listdir(bdir):
        if f.endswith(".parquet"):
            con.execute(
                f"CREATE VIEW {f[:-8]} AS SELECT * FROM read_parquet('{bdir}/{f}')"
            )
    yield con
    con.close()


def _short_string_sql(col: str) -> str:
    """parse_short_string twin: HUGEINT byte extraction, leading zero
    bytes skipped (src/dao.ts:938-968)."""
    parts = []
    for i in range(15, -1, -1):
        p = 256**i
        b = f"CAST((CAST({col} AS HUGEINT) // {p}) % 256 AS INT)"
        parts.append(f"CASE WHEN {b} > 0 THEN chr({b}) ELSE '' END")
    return "concat(" + ", ".join(parts) + ")"


def golden_v8() -> str:
    return f"""
WITH all_regs AS (
  SELECT address, event_id,
         {_short_string_sql("name")} AS name,
         {_short_string_sql("symbol")} AS symbol,
         decimals, total_supply
  FROM token_registrations
  UNION ALL
  SELECT address, event_id, name, symbol, decimals, total_supply
  FROM token_registrations_v3),
validated AS (
  SELECT * FROM all_regs
  WHERE LENGTH(symbol) > 1 AND LENGTH(symbol) < 10
    AND regexp_matches(symbol, '^[\\x00-\\x7F]*$')
    AND LENGTH(name) < 128 AND regexp_matches(name, '^[\\x00-\\x7F]*$')),
per_address AS (
  SELECT address, MIN(event_id) AS first_id, MAX(event_id) AS last_id
  FROM validated GROUP BY 1),
first_sym AS (
  SELECT LOWER(symbol) AS lower_symbol, MIN(event_id) AS first_id
  FROM validated GROUP BY 1)
SELECT pa.address, vr.name, vr.symbol, vr.decimals, vr.total_supply
FROM per_address pa
JOIN validated vr ON pa.address = vr.address AND pa.last_id = vr.event_id
JOIN first_sym fs ON fs.lower_symbol = LOWER(vr.symbol) AND pa.first_id = fs.first_id
"""


def test_v8_token_registrations(btables, bduck):
    df = VIEWS["latest_token_registrations"](btables)
    check(df, bduck, golden_v8())


def test_v8_semantics(btables):
    """Squatting and re-registration fixtures behave per reference:
    TK0's latest metadata wins; the TK1 squatter is excluded."""
    rows = {r["symbol"]: r for r in VIEWS["latest_token_registrations"](btables).collect()}
    assert rows["TK0"]["name"] == "TokenZero"  # re-registration: latest wins
    assert rows["TK0"]["decimals"] == 6
    # squatter (address 99999) registered TK1 later; original holder's
    # latest reg is still TK1 -> holder keeps it, squatter absent
    assert int(rows["TK1"]["address"]) != 99999


GOLDEN_V10 = f"""
WITH hpd AS ({GOLDEN_V15}),
times AS (SELECT MAX(time) - INTERVAL 7 DAYS AS start_time, MAX(time) AS end_time FROM blocks),
prices AS (
  SELECT token0, token1, hour, LN(CAST(total AS DOUBLE) / CAST(k_volume AS DOUBLE)) AS log_price
  FROM hpd, times t
  WHERE hpd.hour BETWEEN t.start_time AND t.end_time AND hpd.k_volume <> 0),
changes AS (
  SELECT token0, token1,
         log_price - LAG(log_price) OVER (PARTITION BY token0, token1 ORDER BY hour) AS pc
  FROM prices),
rv AS (
  SELECT token0, token1, COUNT(1) AS observation_count,
         SQRT(SUM(pc * pc)) AS realized_volatility
  FROM changes WHERE pc IS NOT NULL GROUP BY 1, 2)
SELECT token0, token1, realized_volatility, observation_count,
       CAST(FLOOR(realized_volatility / LN(1.000001)) AS INT) AS volatility_in_ticks
FROM rv WHERE realized_volatility IS NOT NULL
"""


def test_v10_volatility(btables, bduck):
    hpd = VIEWS["hourly_price_data"](btables)
    df = VIEWS["token_pair_realized_volatility"](btables, hpd)
    check(df, bduck, GOLDEN_V10)


GOLDEN_V11 = f"""
WITH ppptliv AS ({GOLDEN_V2}),
depth_percentages AS (
  SELECT (POWER(1.21, k) * 0.00005) AS depth_percent FROM (SELECT UNNEST(range(41)) AS k)),
sp AS (
  SELECT s.*, pk.token0, pk.token1 FROM swaps s
  JOIN pool_keys pk ON s.pool_key_hash = pk.key_hash
  WHERE s.liquidity_after <> 0),
last_swap AS (
  SELECT token0, token1, arg_max(block_number, event_id) AS bn
  FROM sp GROUP BY 1, 2),
last_time AS (
  SELECT token0, token1, b.time AS last_time
  FROM last_swap JOIN blocks b ON last_swap.bn = b.number),
median_ticks AS (
  SELECT sp.token0, sp.token1, quantile_cont(sp.tick_after, 0.5) AS median_tick
  FROM sp
  JOIN blocks b ON sp.block_number = b.number
  JOIN last_time lt ON sp.token0 = lt.token0 AND sp.token1 = lt.token1
  WHERE b.time >= lt.last_time - INTERVAL 1 HOUR
  GROUP BY 1, 2),
pool_states AS (
  SELECT pk.key_hash, dp.depth_percent,
         CAST(FLOOR(LN(1 + dp.depth_percent) / LN(1.000001)) AS INT) AS depth_in_ticks,
         CAST(CEIL(LOG10(1 + CAST(pk.fee AS DOUBLE) / 340282366920938463463374607431768211456.0)
                   / LOG10(1.000001)) AS INT) AS fee_in_ticks,
         CAST(ROUND(mt.median_tick) AS INT) AS last_tick
  FROM pool_keys pk
  CROSS JOIN depth_percentages dp
  LEFT JOIN median_ticks mt ON pk.token0 = mt.token0 AND pk.token1 = mt.token1),
pool_ticks AS (
  SELECT pool_key_hash,
         SUM(net_liquidity_delta_diff) OVER (PARTITION BY pool_key_hash ORDER BY tick
                                             ROWS UNBOUNDED PRECEDING) AS liquidity,
         tick AS tick_start,
         LEAD(tick) OVER (PARTITION BY pool_key_hash ORDER BY tick) AS tick_end
  FROM ppptliv),
ranges AS (
  SELECT pt.pool_key_hash, CAST(pt.liquidity AS DOUBLE) AS liquidity, ps.depth_percent,
         GREATEST(ps.last_tick - ps.depth_in_ticks, pt.tick_start) AS below_lo,
         LEAST(ps.last_tick - ps.fee_in_ticks, COALESCE(pt.tick_end, 2147483647)) AS below_hi,
         GREATEST(ps.last_tick + ps.fee_in_ticks, pt.tick_start) AS above_lo,
         LEAST(ps.last_tick + ps.depth_in_ticks, COALESCE(pt.tick_end, 2147483647)) AS above_hi
  FROM pool_ticks pt
  JOIN pool_states ps ON pt.pool_key_hash = ps.key_hash
  WHERE pt.liquidity <> 0 AND ps.fee_in_ticks < ps.depth_in_ticks),
nonempty AS (
  SELECT * FROM ranges WHERE below_hi > below_lo OR above_hi > above_lo)
SELECT pool_key_hash, depth_percent,
       FLOOR(SUM(CASE WHEN above_hi > above_lo
                      THEN liquidity * (1.0 / POWER(1.0000005, above_lo)
                                        - 1.0 / POWER(1.0000005, above_hi))
                      ELSE 0 END)) AS depth0,
       FLOOR(SUM(CASE WHEN below_hi > below_lo
                      THEN liquidity * (POWER(1.0000005, below_hi)
                                        - POWER(1.0000005, below_lo))
                      ELSE 0 END)) AS depth1
FROM nonempty
GROUP BY 1, 2
"""


def test_v11_market_depth(btables, bduck):
    tl = VIEWS["per_pool_per_tick_liquidity"](btables)
    df = VIEWS["pool_market_depth"](btables, tl)
    check(df, bduck, GOLDEN_V11)


GOLDEN_V12 = """
WITH pt AS (
  SELECT gp.id AS proposal_id, b.time AS proposal_time,
         b.time + gr.voting_start_delay * INTERVAL 1 SECOND AS vote_start,
         gr.voting_start_delay AS window_secs
  FROM governor_proposed gp
  JOIN blocks b ON gp.block_number = b.number
  JOIN governor_reconfigured gr ON gp.config_version = gr.version),
deltas AS (
  SELECT s.delegate, b.time, CAST(s.amount AS HUGEINT) AS delta
  FROM staker_staked s JOIN blocks b ON s.block_number = b.number
  UNION ALL
  SELECT w.delegate, b.time, -CAST(w.amount AS HUGEINT)
  FROM staker_withdrawn w JOIN blocks b ON w.block_number = b.number),
events AS (
  SELECT pt.proposal_id, d.delegate, d.time, d.delta
  FROM deltas d JOIN pt ON d.time BETWEEN pt.proposal_time AND pt.vote_start
  UNION ALL
  SELECT pt.proposal_id, d.delegate, pt.proposal_time, SUM(d.delta)
  FROM deltas d JOIN pt ON d.time < pt.proposal_time
  GROUP BY 1, 2, 3
  UNION ALL
  SELECT pt.proposal_id, dd.delegate, pt.vote_start, 0
  FROM (SELECT DISTINCT delegate FROM deltas) dd CROSS JOIN pt),
running AS (
  SELECT proposal_id, delegate, time,
         SUM(delta) OVER (PARTITION BY proposal_id, delegate ORDER BY time
                          ROWS UNBOUNDED PRECEDING) AS stake,
         LEAD(time) OVER (PARTITION BY proposal_id, delegate ORDER BY time) AS end_time
  FROM events),
integral AS (
  SELECT proposal_id, delegate,
         SUM(CAST(stake AS DECIMAL(38,0))
             * ((epoch_us(end_time) - epoch_us(time)) // 1000000))
           AS weighted_time_sum
  FROM running WHERE end_time IS NOT NULL
  GROUP BY 1, 2)
SELECT i.proposal_id, i.delegate,
       -- exact HUGEINT floor division (see views/governance.py:
       -- decimal_floordiv) — double division could mis-floor sums
       -- beyond 2^53; // truncates, so correct to floor when negative
       CAST(CAST(i.weighted_time_sum AS HUGEINT) // pt.window_secs
            - CASE WHEN CAST(i.weighted_time_sum AS HUGEINT) % pt.window_secs <> 0
                        AND (i.weighted_time_sum < 0) <> (pt.window_secs < 0)
                   THEN 1 ELSE 0 END
            AS DECIMAL(38,0)) AS voting_weight
FROM integral i JOIN pt ON i.proposal_id = pt.proposal_id
"""


def test_v12_voting_weights(btables, bduck):
    df = VIEWS["proposal_delegate_voting_weights"](btables)
    df = df.withColumn("voting_weight", F.col("voting_weight").cast("decimal(38,0)"))
    check(df, bduck, GOLDEN_V12)


def test_v12_floor_exact_beyond_double_mantissa(spark):
    """The final stake-integral division must be exact decimal floor
    division, not a double round-trip: pick a weighted sum just above
    a multiple of the window where float64 rounds UP across the
    boundary, shifting floor(double(a)/b) by 1 vs the reference's
    NUMERIC floor(a/b)."""
    from starknet_indexer_spark.functions.core import decimal_floordiv

    a = 2**60 - 1          # float64 rounds this UP to 2^60
    b = 2**30              # exact floor = 2^30 - 1; double path says 2^30
    row = spark.createDataFrame(
        [(str(a), b)], "a string, b long"
    ).select(
        decimal_floordiv(
            F.col("a").cast("decimal(38,0)"), F.col("b").cast("decimal(38,0)")
        ).alias("exact"),
        F.floor(F.col("a").cast("decimal(38,0)").cast("double") / F.col("b")).alias(
            "via_double"
        ),
    ).collect()[0]
    assert int(row["exact"]) == a // b
    # the double path is genuinely wrong here — proves the fix matters
    assert int(row["via_double"]) != a // b


def golden_v17(start, end, total, s_share, d_share) -> str:
    return f"""
WITH params AS (
  SELECT TIMESTAMP '{start}' AS start_time, TIMESTAMP '{end}' AS end_time,
         {total} AS total_rewards, {s_share} AS s_share, {d_share} AS d_share,
         (epoch_us(TIMESTAMP '{end}') - epoch_us(TIMESTAMP '{start}')) / 1e6 AS total_dur),
deltas AS (
  SELECT s.from_address AS staker, b.time, CAST(s.amount AS HUGEINT) AS delta
  FROM staker_staked s JOIN blocks b ON s.block_number = b.number
  UNION ALL
  SELECT w.from_address, b.time, -CAST(w.amount AS HUGEINT)
  FROM staker_withdrawn w JOIN blocks b ON w.block_number = b.number),
time_points AS (
  SELECT DISTINCT time FROM (
    SELECT time FROM deltas, params WHERE time BETWEEN start_time AND end_time
    UNION ALL SELECT start_time FROM params
    UNION ALL SELECT end_time FROM params)),
intervals AS (
  SELECT time AS i_start, LEAD(time) OVER (ORDER BY time) AS i_end
  FROM time_points, params WHERE time < end_time
  QUALIFY i_end IS NOT NULL),
changes AS (
  SELECT staker, (SELECT start_time FROM params) AS time, SUM(delta) AS delta
  FROM deltas, params WHERE time < start_time GROUP BY 1
  UNION ALL
  SELECT staker, time, delta FROM deltas, params
  WHERE time BETWEEN start_time AND end_time),
stake_events AS (
  SELECT staker, time,
         SUM(delta) OVER (PARTITION BY staker ORDER BY time ROWS UNBOUNDED PRECEDING)
           AS stake_amount,
         LEAD(time) OVER (PARTITION BY staker ORDER BY time) AS next_time
  FROM changes),
staker_intervals AS (
  SELECT i.i_start, i.i_end, se.staker, se.stake_amount
  FROM stake_events se JOIN intervals i
    ON se.time <= i.i_start AND (se.next_time IS NULL OR i.i_start < se.next_time)),
total_per AS (
  SELECT i_start, i_end, SUM(stake_amount) AS total_stake
  FROM staker_intervals GROUP BY 1, 2),
staker_rewards AS (
  SELECT si.staker,
         SUM(p.total_rewards * (p.s_share / (p.s_share + p.d_share))
             * ((epoch_us(si.i_end) - epoch_us(si.i_start)) / 1e6 / p.total_dur)
             * (CAST(si.stake_amount AS DOUBLE) / CAST(t.total_stake AS DOUBLE))) AS reward
  FROM staker_intervals si
  JOIN total_per t ON si.i_start = t.i_start AND si.i_end = t.i_end, params p
  WHERE t.total_stake > 0 AND si.stake_amount > 0
    AND epoch_us(si.i_end) > epoch_us(si.i_start)
  GROUP BY 1),
pip AS (
  SELECT gp.id FROM governor_proposed gp JOIN blocks b ON gp.block_number = b.number, params
  WHERE b.time BETWEEN start_time AND end_time),
dtw AS (
  SELECT gv.voter AS delegate, SUM(CAST(gv.weight AS HUGEINT)) AS total_weight
  FROM governor_voted gv WHERE gv.id IN (SELECT id FROM pip) GROUP BY 1),
tvw AS (SELECT SUM(total_weight) AS total FROM dtw),
delegate_rewards AS (
  SELECT dtw.delegate,
         CAST(dtw.total_weight AS DOUBLE) * p.total_rewards
           * (p.d_share / (p.s_share + p.d_share)) / CAST(tvw.total AS DOUBLE) AS reward
  FROM dtw, tvw, params p),
all_rewards AS (
  SELECT delegate AS claimee, reward AS delegate_reward, 0.0 AS staker_reward
  FROM delegate_rewards
  UNION ALL
  SELECT staker, 0.0, reward FROM staker_rewards),
final AS (
  SELECT claimee, SUM(staker_reward) AS tsr, SUM(delegate_reward) AS tdr,
         SUM(staker_reward) + SUM(delegate_reward) AS total_reward
  FROM all_rewards GROUP BY 1)
SELECT ROW_NUMBER() OVER (ORDER BY total_reward DESC) - 1 AS id,
       '0x' || lower(to_hex(CAST(claimee AS BIGINT))) AS claimee,
       FLOOR(total_reward) AS amount,
       FLOOR(tdr) AS staker_portion,
       FLOOR(tsr) AS delegate_portion
FROM final WHERE total_reward > 0
"""


def test_v17_staker_rewards(btables, bduck):
    start, end = "2024-01-01 06:00:00", "2024-01-02 00:00:00"
    df = calculate_staker_rewards(btables, start, end, 1_000_000.0, 0.7, 0.3)
    got = _norm(df.toPandas())
    want = _norm(bduck.execute(golden_v17(start, end, 1_000_000.0, 0.7, 0.3)).df())
    # ranking by float reward: adjacent rewards can swap order across
    # engines; compare the claim set without the rank id
    import pandas as pd

    got2 = got.drop(columns=["id"]).reset_index(drop=True)
    want2 = want.drop(columns=["id"]).reset_index(drop=True)
    assert len(got2) == len(want2)
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False, rtol=1e-6, atol=1.5)
