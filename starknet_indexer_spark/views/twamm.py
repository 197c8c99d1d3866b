"""V3/V4 — TWAMM pool states and future sale-rate delta schedule.

Reference: twamm_pool_states_view (src/dao.ts:765-815) and
twamm_sale_rate_deltas_view (src/dao.ts:817-851).

V3 semantics: per TWAMM pool, current sale rates = rates at the last
virtual-order execution + the deltas of order updates that arrived
*after* that execution event but whose [start_time, end_time) interval
was already active at the execution's block time; last_event_id folds
in the pool-state view's last event.

V4 semantics: mirrored union of +delta at start_time / -delta at
end_time per pool, summed per (pool, time), zero-zero rows dropped;
the materialized variant keeps only times strictly after the pool's
last virtual execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def twamm_pool_states(
    tables: dict[str, DataFrame], pool_states_df: DataFrame | None = None
) -> DataFrame:
    voe = tables["twamm_virtual_order_executions"]
    tou = tables["twamm_order_updates"]
    blocks = tables["blocks"].select(
        F.col("number").alias("__block"), F.col("time").alias("last_virtual_execution_time")
    )
    pool_keys = tables["pool_keys"].select("key_hash")

    last_voe = (
        voe.groupBy("key_hash")
        .agg(
            F.max("event_id").alias("lvoe_event_id"),
            F.max_by("token0_sale_rate", "event_id").alias("token0_sale_rate"),
            F.max_by("token1_sale_rate", "event_id").alias("token1_sale_rate"),
            F.max_by("block_number", "event_id").alias("block_number"),
        )
        .join(F.broadcast(pool_keys), "key_hash")  # FK semi-filter
        .join(F.broadcast(blocks), F.col("block_number") == F.col("__block"))
        .drop("__block", "block_number")
    )

    # active orders straddling the last execution time, arriving after it
    anchors = last_voe.select("key_hash", "lvoe_event_id", "last_virtual_execution_time")
    active = (
        tou.join(F.broadcast(anchors), "key_hash")
        .filter(
            (F.col("event_id") > F.col("lvoe_event_id"))
            & (F.col("start_time") <= F.col("last_virtual_execution_time"))
            & (F.col("end_time") > F.col("last_virtual_execution_time"))
        )
        .groupBy("key_hash")
        .agg(
            F.sum(F.col("sale_rate_delta0").cast(DEC)).alias("sale_rate_delta0"),
            F.sum(F.col("sale_rate_delta1").cast(DEC)).alias("sale_rate_delta1"),
            F.max("event_id").alias("last_order_update_event_id"),
        )
    )

    out = last_voe.join(active, "key_hash", "left")
    if pool_states_df is not None:
        psm = pool_states_df.select(
            F.col("pool_key_hash").alias("key_hash"), F.col("last_event_id").alias("ps_event_id")
        )
        out = out.join(psm, "key_hash", "inner")
    else:
        out = out.withColumn("ps_event_id", F.lit(None).cast("long"))

    z = F.lit(0).cast(DEC)
    return out.select(
        F.col("key_hash").alias("pool_key_hash"),
        (F.col("token0_sale_rate").cast(DEC) + F.coalesce(F.col("sale_rate_delta0"), z)).alias(
            "token0_sale_rate"
        ),
        (F.col("token1_sale_rate").cast(DEC) + F.coalesce(F.col("sale_rate_delta1"), z)).alias(
            "token1_sale_rate"
        ),
        "last_virtual_execution_time",
        F.greatest(
            F.coalesce(F.col("last_order_update_event_id"), F.col("lvoe_event_id")),
            F.col("ps_event_id"),
        ).alias("last_event_id"),
    )


def twamm_sale_rate_deltas(
    tables: dict[str, DataFrame], twamm_states_df: DataFrame | None = None
) -> DataFrame:
    tou = tables["twamm_order_updates"].select(
        "key_hash",
        "start_time",
        "end_time",
        F.col("sale_rate_delta0").cast(DEC).alias("d0"),
        F.col("sale_rate_delta1").cast(DEC).alias("d1"),
    )
    starts = tou.groupBy("key_hash", F.col("start_time").alias("time")).agg(
        F.sum("d0").alias("net_sale_rate_delta0"), F.sum("d1").alias("net_sale_rate_delta1")
    )
    ends = tou.groupBy("key_hash", F.col("end_time").alias("time")).agg(
        (-F.sum("d0")).alias("net_sale_rate_delta0"), (-F.sum("d1")).alias("net_sale_rate_delta1")
    )
    summed = (
        starts.unionByName(ends)
        .groupBy("key_hash", "time")
        .agg(
            F.sum("net_sale_rate_delta0").alias("net_sale_rate_delta0"),
            F.sum("net_sale_rate_delta1").alias("net_sale_rate_delta1"),
        )
        .filter((F.col("net_sale_rate_delta0") != 0) | (F.col("net_sale_rate_delta1") != 0))
        .select(
            F.col("key_hash").alias("pool_key_hash"),
            "time",
            "net_sale_rate_delta0",
            "net_sale_rate_delta1",
        )
    )
    if twamm_states_df is not None:
        # materialized variant: only future deltas (src/dao.ts:845-851)
        anchor = twamm_states_df.select(
            "pool_key_hash", F.col("last_virtual_execution_time").alias("lvet")
        )
        summed = (
            summed.join(F.broadcast(anchor), "pool_key_hash")
            .filter(F.col("lvet") < F.col("time"))
            .drop("lvet")
        )
    return summed
