"""V1 — pool_states: latest per-pool state.

Reference: pool_states_view, src/dao.ts:384-433. Semantics:
- per pool, the latest swap (argmax event_id) supplies
  (sqrt_ratio_after, tick_after, liquidity_after); if the pool has no
  swap yet, fall back to its pool_initialization (sqrt_ratio, tick),
  liquidity 0;
- current in-range liquidity = that liquidity + sum of
  ``liquidity_delta`` of position_updates strictly after the anchor
  event whose [lower_bound, upper_bound) contains the current tick
  (``tick BETWEEN lower AND upper-1``);
- last_event_id = greatest(anchor event, latest position update).

Spark plan: the reference's LEFT JOIN LATERAL ... ORDER BY event_id
DESC LIMIT 1 decorrelates to a max_by aggregation (SURVEY.md §2.3 J3
-> W5 rewrite) — one shuffle per fact table, no per-pool sort. The
per-pool anchor set is tiny (one row per pool) and broadcast into the
position_updates scan, so the big fact table never shuffles for the
theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pool_states(tables: dict[str, DataFrame]) -> DataFrame:
    pool_keys = tables["pool_keys"]
    swaps = tables["swaps"]
    inits = tables["pool_initializations"]
    pu = tables["position_updates"]

    last_swap = swaps.groupBy("pool_key_hash").agg(
        F.max("event_id").alias("s_event_id"),
        F.max_by("sqrt_ratio_after", "event_id").alias("s_sqrt_ratio"),
        F.max_by("tick_after", "event_id").alias("s_tick"),
        F.max_by("liquidity_after", "event_id").alias("s_liquidity"),
    )
    last_init = inits.groupBy("pool_key_hash").agg(
        F.max("event_id").alias("i_event_id"),
        F.max_by("sqrt_ratio", "event_id").alias("i_sqrt_ratio"),
        F.max_by("tick", "event_id").alias("i_tick"),
    )

    lss = (
        pool_keys.select(F.col("key_hash"))
        .join(last_swap, F.col("key_hash") == last_swap.pool_key_hash, "left")
        .drop(last_swap.pool_key_hash)
        .join(last_init, F.col("key_hash") == last_init.pool_key_hash, "left")
        .drop(last_init.pool_key_hash)
        .select(
            "key_hash",
            F.coalesce("s_event_id", "i_event_id").alias("last_swap_event_id"),
            F.coalesce("s_sqrt_ratio", "i_sqrt_ratio").alias("sqrt_ratio"),
            F.coalesce("s_tick", "i_tick").alias("tick"),
            F.coalesce("s_liquidity", F.lit(0)).alias("liquidity_last"),
        )
    )

    # later in-range liquidity deltas: anchor rows are 1/pool -> broadcast
    anchors = lss.select("key_hash", "last_swap_event_id", "tick")
    later_in_range = (
        pu.join(F.broadcast(anchors), pu.pool_key_hash == anchors.key_hash)
        .filter(
            (F.col("event_id") > F.col("last_swap_event_id"))
            & F.col("tick").between(F.col("lower_bound"), F.col("upper_bound") - 1)
        )
        .groupBy("key_hash")
        .agg(F.sum("liquidity_delta").alias("later_liquidity"))
    )

    last_update = pu.groupBy("pool_key_hash").agg(
        F.max("event_id").alias("last_update_event_id")
    )

    return (
        lss.join(later_in_range, "key_hash", "left")
        .join(last_update, lss.key_hash == last_update.pool_key_hash, "left")
        .drop(last_update.pool_key_hash)
        .select(
            F.col("key_hash").alias("pool_key_hash"),
            "sqrt_ratio",
            "tick",
            (
                F.coalesce(F.col("liquidity_last"), F.lit(0)).cast("decimal(38,0)")
                + F.coalesce(F.col("later_liquidity"), F.lit(0)).cast("decimal(38,0)")
            ).alias("liquidity"),
            F.greatest("last_swap_event_id", "last_update_event_id").alias("last_event_id"),
            F.col("last_update_event_id").alias("last_liquidity_update_event_id"),
        )
    )
