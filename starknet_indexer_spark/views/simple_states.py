"""V5/V6/V9 — small latest-state views.

- V5 limit_order_pool_states (src/dao.ts:853-873): per limit-order
  pool, last placed/closed event id vs pool state.
- V6 spline_pools (src/dao.ts:875-880): distinct pools seen in
  liquidity_updated.
- V9 oracle_pool_states (src/dao.ts:1025-1036): per oracle pool, max
  snapshot timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def limit_order_pool_states(
    tables: dict[str, DataFrame], pool_states_df: DataFrame | None = None
) -> DataFrame:
    """last_event_id = greatest(last placed, last closed, pool state's
    last event). The reference reads pool_states_materialized; pass the
    V1 output (or None to skip that term for isolated testing)."""
    placed = tables["limit_order_placed"].groupBy("key_hash").agg(
        F.max("event_id").alias("placed_event_id")
    )
    closed = tables["limit_order_closed"].groupBy("key_hash").agg(
        F.max("event_id").alias("closed_event_id")
    )
    out = placed.join(closed, "key_hash", "left")
    if pool_states_df is not None:
        psm = pool_states_df.select(
            F.col("pool_key_hash").alias("key_hash"), F.col("last_event_id").alias("ps_event_id")
        )
        out = out.join(psm, "key_hash", "inner")
    else:
        out = out.withColumn("ps_event_id", F.lit(None).cast("long"))
    return out.select(
        F.col("key_hash").alias("pool_key_hash"),
        F.greatest(
            F.greatest(F.col("placed_event_id"), F.coalesce(F.col("closed_event_id"), F.lit(0))),
            F.col("ps_event_id"),
        ).alias("last_event_id"),
    )


def spline_pools(tables: dict[str, DataFrame]) -> DataFrame:
    return tables["liquidity_updated"].select("pool_key_hash").distinct()


def oracle_pool_states(tables: dict[str, DataFrame]) -> DataFrame:
    return tables["oracle_snapshots"].groupBy(
        F.col("key_hash").alias("pool_key_hash")
    ).agg(F.max("snapshot_block_timestamp").alias("last_snapshot_block_timestamp"))
