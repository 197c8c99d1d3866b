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
a plpgsql table function in the reference (src/dao.ts:1405-1538) — so
it stays a Python function (`views.calculate_staker_rewards`), exactly
as Postgres users call it as `SELECT * FROM calculate_staker_rewards(...)`.
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
    return out
