"""V7 — last-24h pool stats over the hourly rollups.

Reference: last_24h_pool_stats_view, src/dao.ts:882-936. Per pool:
24h volume/fees routed to token0/token1 sides, lifetime TVL, and 24h
TVL delta. The reference's NOW() is parameterized as ``as_of`` for
determinism (SURVEY.md §4.2).

Inputs are the V13/V16 *outputs* (hourly_volume_by_token,
hourly_tvl_delta_by_token) — at scale these are small hour-partitioned
result tables, so every join here is a broadcast off pool_keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def last_24h_pool_stats(
    tables: dict[str, DataFrame],
    hourly_volume: DataFrame,
    hourly_tvl_delta: DataFrame,
    as_of=None,
) -> DataFrame:
    """``as_of=None`` derives the anchor set-based as max(blocks.time)
    via a broadcast single-row crossJoin — no driver-side collect, so
    the whole view stays one lazy plan (and one fewer pass over the
    inputs when callers would otherwise pre-compute the scalar)."""
    pool_keys = tables["pool_keys"].select("key_hash", "token0", "token1")
    if as_of is None:
        anchor = F.broadcast(
            tables["blocks"].agg(
                (F.max("time") - F.expr("INTERVAL 24 HOURS")).alias("__cutoff")
            )
        )
        cutoff = F.col("__cutoff")
    else:
        anchor = None
        cutoff = F.lit(as_of).cast("timestamp") - F.expr("INTERVAL 24 HOURS")

    def routed(df: DataFrame, value_cols: list[str], time_filtered: bool) -> DataFrame:
        j = df.join(F.broadcast(pool_keys), "key_hash")
        if time_filtered:
            if anchor is not None:
                j = j.crossJoin(anchor)
            j = j.filter(F.col("hour") >= cutoff)
            if anchor is not None:
                j = j.drop("__cutoff")
        aggs = []
        for vc in value_cols:
            aggs.append(
                F.sum(
                    F.when(F.col("token") == F.col("token0"), F.col(vc)).otherwise(F.lit(0))
                ).alias(f"{vc}0")
            )
            aggs.append(
                F.sum(
                    F.when(F.col("token") == F.col("token1"), F.col(vc)).otherwise(F.lit(0))
                ).alias(f"{vc}1")
            )
        return j.groupBy("key_hash").agg(*aggs)

    def routed_dual(df: DataFrame, vc: str) -> DataFrame:
        """Lifetime AND 24h-windowed sums of one pass over ``df`` —
        the window filter moves into conditional aggregation so the
        upstream pipeline (a full rollup over the fact table) executes
        once, not twice. At 100 TB the rollup re-execution, not this
        8-row agg, is the cost being halved."""
        j = df.join(F.broadcast(pool_keys), "key_hash")
        if anchor is not None:
            j = j.crossJoin(anchor)
        in_window = F.col("hour") >= cutoff
        aggs = []
        for side in ("token0", "token1"):
            s = side[-1]
            tok = F.col("token") == F.col(side)
            aggs.append(
                F.sum(F.when(tok, F.col(vc)).otherwise(F.lit(0))).alias(f"{vc}{s}_t")
            )
            aggs.append(
                F.sum(F.when(tok & in_window, F.col(vc)).otherwise(F.lit(0))).alias(
                    f"{vc}{s}_d"
                )
            )
        return j.groupBy("key_hash").agg(*aggs)

    volume = routed(hourly_volume, ["volume", "fees"], time_filtered=True)
    tvl = routed_dual(hourly_tvl_delta, "delta")

    z = F.lit(0).cast(DEC)
    return (
        pool_keys.select("key_hash")
        .join(volume, "key_hash", "left")
        .join(
            tvl.select(
                "key_hash",
                F.col("delta0_t").alias("tvl0_t"),
                F.col("delta1_t").alias("tvl1_t"),
                F.col("delta0_d").alias("tvl0_d"),
                F.col("delta1_d").alias("tvl1_d"),
            ),
            "key_hash",
            "left",
        )
        .select(
            "key_hash",
            F.coalesce("volume0", z).alias("volume0_24h"),
            F.coalesce("volume1", z).alias("volume1_24h"),
            F.coalesce("fees0", z).alias("fees0_24h"),
            F.coalesce("fees1", z).alias("fees1_24h"),
            F.coalesce("tvl0_t", z).alias("tvl0_total"),
            F.coalesce("tvl1_t", z).alias("tvl1_total"),
            F.coalesce("tvl0_d", z).alias("tvl0_delta_24h"),
            F.coalesce("tvl1_d", z).alias("tvl1_delta_24h"),
        )
    )
