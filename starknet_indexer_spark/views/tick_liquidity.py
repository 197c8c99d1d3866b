"""V2 — per-pool per-tick liquidity ledger.

Reference: per_pool_per_tick_liquidity_view, src/dao.ts:475-499, and
the trigger-maintained incremental table (501-647). Semantics: each
position update contributes +liquidity_delta at its lower bound and
-liquidity_delta at its upper bound (net), plus +liquidity_delta to
"total liquidity on tick" at both bounds; rows where the net delta
sums to zero are dropped.

The reference maintains this incrementally with insert/delete/update
triggers; Spark has no triggers, so the engine offers (a) this pure
recompute — the semantics oracle the reference itself initializes the
incremental table from (src/dao.ts:510-515) — and (b) an incremental
MERGE path in the streaming runtime (foreachBatch) whose equivalence
to (a) is a test invariant.

Scale: two map-side projections of the same scan, one shuffle on
(pool, tick). The mirrored union does NOT rescan the fact table twice
in practice — Spark reuses the exchange for both branches under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tick_liquidity_deltas(position_updates: DataFrame) -> DataFrame:
    """Unfiltered per-(pool, tick) delta sums for a slice of
    position_updates. The incremental maintainer
    (streaming.incremental) merges these into its state table; the
    full view below is the same aggregate over all history with the
    zero-net filter applied."""
    pu = position_updates.select(
        "pool_key_hash",
        "lower_bound",
        "upper_bound",
        F.col("liquidity_delta").cast("decimal(38,0)").alias("liquidity_delta"),
    )
    lower = pu.select(
        "pool_key_hash",
        F.col("lower_bound").alias("tick"),
        F.col("liquidity_delta").alias("net_liquidity_delta"),
        F.col("liquidity_delta").alias("total_liquidity_on_tick"),
    )
    upper = pu.select(
        "pool_key_hash",
        F.col("upper_bound").alias("tick"),
        (-F.col("liquidity_delta")).alias("net_liquidity_delta"),
        F.col("liquidity_delta").alias("total_liquidity_on_tick"),
    )
    return (
        lower.unionByName(upper)
        .groupBy("pool_key_hash", "tick")
        .agg(
            F.sum("net_liquidity_delta").alias("net_liquidity_delta_diff"),
            F.sum("total_liquidity_on_tick").alias("total_liquidity_on_tick"),
        )
    )


def per_pool_per_tick_liquidity(tables: dict[str, DataFrame]) -> DataFrame:
    return tick_liquidity_deltas(tables["position_updates"]).filter(
        F.col("net_liquidity_delta_diff") != 0
    )
