"""SQL-addressable catalog: every stored table and derived view by name.

The reference's consumers never call an API — they SELECT from named
Postgres relations (`pool_states_materialized`, `hourly_volume_by_token`,
...; src/dao.ts:384-1540 defines them, src/index.ts keeps them fresh).
This module gives a Spark user the same experience:

    install_sql_catalog(spark, tables)
    spark.sql("SELECT * FROM pool_states WHERE key_hash = ...")

Views are registered as *lazy* temp views over the composed DataFrame
DAG (V7 reads V13/V16, V10 reads V15, V11 reads V2, TWAMM/limit-order
states read V1 — the same matview-reads-matview graph `runtime.py`
materializes on a cadence). Querying a view here recomputes it from
the stored tables — the always-fresh mode; point the same names at
`runtime.refresh_*` output directories for the materialized mode.

V17 (`calculate_staker_rewards`) is the one *parameterized* relation —
a plpgsql table function in the reference (src/dao.ts:1405-1538). It
is exposed the same way here: a Spark SQL table function (`CREATE
TEMPORARY FUNCTION ... RETURNS TABLE`, Spark 4 SQL UDF) registered by
`install_sql_catalog`, callable as
``SELECT * FROM calculate_staker_rewards(TIMESTAMP '...', ...)`` —
byte-identical to the DataFrame implementation in
`views/staker_rewards.py` (equivalence-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .views import VIEWS, load_ekubo_tables


def compose_views(
    tables: dict[str, DataFrame], as_of=None
) -> dict[str, DataFrame]:
    """Build the full view DAG as lazy DataFrames, feeding upstream
    view outputs to their dependents (each shared subtree is built
    once, so Catalyst sees one plan per view with common lineage)."""
    v: dict[str, DataFrame] = {}
    v["pool_states"] = VIEWS["pool_states"](tables)
    v["per_pool_per_tick_liquidity"] = VIEWS["per_pool_per_tick_liquidity"](tables)
    v["twamm_pool_states"] = VIEWS["twamm_pool_states"](tables, v["pool_states"])
    v["twamm_sale_rate_deltas"] = VIEWS["twamm_sale_rate_deltas"](
        tables, v["twamm_pool_states"]
    )
    v["limit_order_pool_states"] = VIEWS["limit_order_pool_states"](
        tables, v["pool_states"]
    )
    v["oracle_pool_states"] = VIEWS["oracle_pool_states"](tables)
    v["spline_pools"] = VIEWS["spline_pools"](tables)
    for name in (
        "hourly_volume_by_token",
        "hourly_revenue_by_token",
        "hourly_price_data",
        "hourly_tvl_delta_by_token",
    ):
        v[name] = VIEWS[name](tables, since=None)
    v["last_24h_pool_stats"] = VIEWS["last_24h_pool_stats"](
        tables, v["hourly_volume_by_token"], v["hourly_tvl_delta_by_token"], as_of
    )
    v["latest_token_registrations"] = VIEWS["latest_token_registrations"](tables)
    v["token_pair_realized_volatility"] = VIEWS["token_pair_realized_volatility"](
        tables, v["hourly_price_data"]
    )
    v["pool_market_depth"] = VIEWS["pool_market_depth"](
        tables, v["per_pool_per_tick_liquidity"]
    )
    v["proposal_delegate_voting_weights"] = VIEWS["proposal_delegate_voting_weights"](
        tables
    )
    return v


# SQL mirror of functions.core.to_hex (reference plpgsql
# numeric_to_hex, src/dao.ts:1209-1229): DECIMAL -> canonical 0x-hex
# via a 64-bit limb pair. Same expression tree as the Column version so
# results match bit-for-bit.
_TWO64 = "CAST(18446744073709551616 AS DECIMAL(38,0))"
_TO_HEX_SQL = f"""
  CONCAT('0x', regexp_replace(
    CASE WHEN CAST((CAST({{col}} AS DECIMAL(38,0))
                    - CAST(CAST({{col}} AS DECIMAL(38,0)) % {_TWO64} AS DECIMAL(20,0)))
                   / {_TWO64} AS DECIMAL(38,0)) = 0
         THEN lower(conv(CAST(CAST(CAST({{col}} AS DECIMAL(38,0)) % {_TWO64}
                               AS DECIMAL(20,0)) AS STRING), 10, 16))
         ELSE CONCAT(
           lower(conv(CAST(CAST((CAST({{col}} AS DECIMAL(38,0))
                    - CAST(CAST({{col}} AS DECIMAL(38,0)) % {_TWO64} AS DECIMAL(20,0)))
                   / {_TWO64} AS DECIMAL(38,0)) AS STRING), 10, 16)),
           lpad(lower(conv(CAST(CAST(CAST({{col}} AS DECIMAL(38,0)) % {_TWO64}
                               AS DECIMAL(20,0)) AS STRING), 10, 16)), 16, '0'))
    END, '^0+(?=.)', ''))
"""


def install_staker_rewards_fn(spark: SparkSession, claimee_is_hex: bool) -> None:
    """Register V17 as a SQL table function over the catalog's temp
    views — the Spark analogue of the reference's plpgsql
    ``calculate_staker_rewards(start, end, total_rewards,
    staking_share, delegate_share) RETURNS TABLE`` (src/dao.ts:
    1354-1540). The body is the same plan as
    `views.calculate_staker_rewards`: interval lattice -> running
    stake -> validity-interval as-of join -> two reward pots.

    ``claimee_is_hex``: whether staker addresses are stored as 0x-hex
    strings (ingest output) or NUMERIC (reference schema) — decides
    whether the final SELECT wraps claimee in the hex codec, the same
    dtype dispatch the DataFrame version does at plan time.
    """
    claimee_expr = (
        "claimee" if claimee_is_hex else _TO_HEX_SQL.format(col="claimee")
    )
    spark.sql(f"""
    CREATE OR REPLACE TEMPORARY FUNCTION calculate_staker_rewards(
        start_time TIMESTAMP, end_time TIMESTAMP, total_rewards DOUBLE,
        staking_share DOUBLE, delegate_share DOUBLE)
    RETURNS TABLE (id INT, claimee STRING, amount BIGINT,
                   staker_portion BIGINT, delegate_portion BIGINT)
    RETURN
    WITH deltas AS (
      SELECT s.from_address AS staker, b.time AS time,
             CAST(s.amount AS DECIMAL(38,0)) AS delta
      FROM staker_staked s JOIN blocks b ON s.block_number = b.number
      UNION ALL
      SELECT w.from_address, b.time, -CAST(w.amount AS DECIMAL(38,0))
      FROM staker_withdrawn w JOIN blocks b ON w.block_number = b.number
    ),
    time_points AS (
      SELECT DISTINCT time FROM (
        SELECT time FROM deltas WHERE time BETWEEN start_time AND end_time
        UNION ALL SELECT start_time UNION ALL SELECT end_time
      )
    ),
    -- reference-parity quirk: the point at end_time is dropped BEFORE
    -- LEAD (src/dao.ts:1400-1404), so the last interior interval earns
    -- nothing on either engine
    intervals AS (
      SELECT i_start, i_end FROM (
        SELECT time AS i_start, LEAD(time) OVER (ORDER BY time) AS i_end
        FROM time_points WHERE time < end_time
      ) WHERE i_end IS NOT NULL
    ),
    changes AS (
      SELECT staker, start_time AS time, SUM(delta) AS delta
      FROM deltas WHERE time < start_time GROUP BY staker
      UNION ALL
      SELECT staker, time, delta FROM deltas
      WHERE time BETWEEN start_time AND end_time
    ),
    stake_events AS (
      SELECT staker, time,
        SUM(delta) OVER (PARTITION BY staker ORDER BY time
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stake_amount,
        LEAD(time) OVER (PARTITION BY staker ORDER BY time) AS next_time
      FROM changes
    ),
    staker_intervals AS (
      SELECT i.i_start, i.i_end, se.staker, se.stake_amount
      FROM stake_events se JOIN intervals i
        ON se.time <= i.i_start
       AND (se.next_time IS NULL OR i.i_start < se.next_time)
    ),
    total_per_interval AS (
      SELECT i_start, i_end, SUM(stake_amount) AS total_stake
      FROM staker_intervals GROUP BY i_start, i_end
    ),
    -- per-row reward in a projection CTE, aggregate over a plain
    -- column after: the UDF body plans as a parameter-correlated
    -- subquery, and Spark rejects aggregates mixing outer (parameter)
    -- and local references; this split also reproduces the DataFrame
    -- version's float summation order exactly
    staker_interval_rewards AS (
      SELECT si.staker,
        (total_rewards * (staking_share / (staking_share + delegate_share)))
        * ((CAST(unix_micros(si.i_end) - unix_micros(si.i_start) AS DOUBLE) / 1e6)
           / (CAST(unix_micros(end_time) - unix_micros(start_time) AS DOUBLE) / 1e6))
        * (CAST(si.stake_amount AS DOUBLE) / CAST(t.total_stake AS DOUBLE))
        AS reward
      FROM staker_intervals si
      JOIN total_per_interval t USING (i_start, i_end)
      WHERE t.total_stake > 0 AND si.stake_amount > 0
        AND (CAST(unix_micros(i_end) - unix_micros(i_start) AS DOUBLE) / 1e6) > 0
    ),
    staker_rewards AS (
      SELECT staker, SUM(reward) AS reward
      FROM staker_interval_rewards GROUP BY staker
    ),
    delegate_weight AS (
      -- SQL-UDF limitation: the body plans as a parameter-correlated
      -- subquery, and outer (parameter) references are rejected both
      -- inside nested subqueries and on the right side of a semi
      -- join; the reference's `id IN (SELECT ...)` therefore becomes
      -- an inner join + DISTINCT on the vote's unique event_id (the
      -- same rows a semi join keeps), with the window filter in a
      -- left-linear position Spark's decorrelation supports
      SELECT delegate, SUM(CAST(weight AS DECIMAL(38,0))) AS total_weight
      FROM (
        SELECT DISTINCT v.event_id, v.voter AS delegate, v.weight
        FROM governor_voted v
        JOIN governor_proposed p ON v.id = p.id
        JOIN blocks b ON p.block_number = b.number
        WHERE b.time BETWEEN start_time AND end_time
      ) GROUP BY delegate
    ),
    delegate_rewards AS (
      SELECT delegate,
             ((CAST(total_weight AS DOUBLE)
               * (total_rewards * (delegate_share / (staking_share + delegate_share))))
              / CAST((SELECT SUM(total_weight) FROM delegate_weight) AS DOUBLE))
             AS reward
      FROM delegate_weight
    ),
    all_rewards AS (
      SELECT delegate AS claimee, reward AS delegate_reward,
             CAST(0.0 AS DOUBLE) AS staker_reward
      FROM delegate_rewards
      UNION ALL
      SELECT staker, CAST(0.0 AS DOUBLE), reward FROM staker_rewards
    ),
    final AS (
      SELECT claimee,
             SUM(staker_reward) AS total_staker_reward,
             SUM(delegate_reward) AS total_delegate_reward,
             SUM(staker_reward) + SUM(delegate_reward) AS total_reward
      FROM all_rewards GROUP BY claimee
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY total_reward DESC) - 1 AS INT) AS id,
           {claimee_expr} AS claimee,
           FLOOR(total_reward) AS amount,
           -- reference swaps these two labels (src/dao.ts:1536-1537)
           FLOOR(total_delegate_reward) AS staker_portion,
           FLOOR(total_staker_reward) AS delegate_portion
    FROM final WHERE total_reward > 0
    """)


def install_sql_catalog(
    spark: SparkSession,
    tables: dict[str, DataFrame] | str,
    as_of=None,
) -> dict[str, DataFrame]:
    """Register every stored table and every non-parameterized view
    (V1-V16) as a temp view. ``tables`` is the loaded table dict or a
    tables directory path. Returns name -> DataFrame for everything
    registered."""
    if isinstance(tables, str):
        tables = load_ekubo_tables(spark, tables)
    out: dict[str, DataFrame] = {}
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
        out[name] = df
    for name, df in compose_views(tables, as_of=as_of).items():
        df.createOrReplaceTempView(name)
        out[name] = df
    if "staker_staked" in tables:
        claimee_is_hex = (
            dict(tables["staker_staked"].dtypes)["from_address"] == "string"
        )
        install_staker_rewards_fn(spark, claimee_is_hex)
    return out
