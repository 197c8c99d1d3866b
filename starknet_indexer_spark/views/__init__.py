"""Derived analytics views V1..V17 (SURVEY.md §2.4) as DataFrame
pipelines over the Ekubo-shaped tables.

Each view is a function ``(tables, **params) -> DataFrame`` where
``tables`` maps table name -> DataFrame (see ``load_ekubo_tables``).
Deterministic: anything the reference computes with NOW() takes an
explicit ``as_of`` parameter (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLE_SCHEMAS
from .pool_states import pool_states  # noqa: F401
from .tick_liquidity import per_pool_per_tick_liquidity  # noqa: F401
from .hourly import (  # noqa: F401
    hourly_price_data,
    hourly_revenue_by_token,
    hourly_tvl_delta_by_token,
    hourly_volume_by_token,
)
from .stats_24h import last_24h_pool_stats  # noqa: F401
from .simple_states import (  # noqa: F401
    limit_order_pool_states,
    oracle_pool_states,
    spline_pools,
)
from .twamm import twamm_pool_states, twamm_sale_rate_deltas  # noqa: F401
from .token_registry import latest_token_registrations  # noqa: F401
from .volatility import token_pair_realized_volatility  # noqa: F401
from .market_depth import pool_market_depth  # noqa: F401
from .governance import proposal_delegate_voting_weights  # noqa: F401
from .staker_rewards import calculate_staker_rewards  # noqa: F401

VIEWS = {
    "pool_states": pool_states,  # V1
    "per_pool_per_tick_liquidity": per_pool_per_tick_liquidity,  # V2
    "twamm_pool_states": twamm_pool_states,  # V3
    "twamm_sale_rate_deltas": twamm_sale_rate_deltas,  # V4
    "limit_order_pool_states": limit_order_pool_states,  # V5
    "spline_pools": spline_pools,  # V6
    "last_24h_pool_stats": last_24h_pool_stats,  # V7
    "oracle_pool_states": oracle_pool_states,  # V9
    "hourly_volume_by_token": hourly_volume_by_token,  # V13
    "hourly_revenue_by_token": hourly_revenue_by_token,  # V14
    "hourly_price_data": hourly_price_data,  # V15
    "hourly_tvl_delta_by_token": hourly_tvl_delta_by_token,  # V16
    "latest_token_registrations": latest_token_registrations,  # V8
    "token_pair_realized_volatility": token_pair_realized_volatility,  # V10
    "pool_market_depth": pool_market_depth,  # V11
    "proposal_delegate_voting_weights": proposal_delegate_voting_weights,  # V12
    "calculate_staker_rewards": calculate_staker_rewards,  # V17
}


def load_ekubo_tables(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Load every Ekubo table parquet found under ``path``.

    At scale each table is a partitioned directory; here a single
    parquet file per table. Schemas are fixed (schema-on-write) but we
    accept fixture-narrowed numeric widths — views cast where needed.
    """
    import os

    from pyspark.sql import functions as F

    out: dict[str, DataFrame] = {}
    for name in TABLE_SCHEMAS:
        p = os.path.join(path, f"{name}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            # parquet written without isAdjustedToUTC reads as
            # TIMESTAMP_NTZ; normalize to session-TZ (UTC) TIMESTAMP so
            # epoch functions work uniformly
            for c, t in df.dtypes:
                if t == "timestamp_ntz":
                    df = df.withColumn(c, F.col(c).cast("timestamp"))
            out[name] = df
    return out
