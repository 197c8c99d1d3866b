"""V11 — pool market depth curves.

Reference: pool_market_depth_view, src/dao.ts:1085-1207. For 41
geometric depth levels (1.21^k * 0.00005): the token amounts obtainable
within +/-depth% of the pair's 1-hour-median tick, integrating the
cumulative per-tick liquidity ledger over the intersection of the
depth band (minus the fee band) with each constant-liquidity tick
range — concentrated-liquidity math
``liquidity * (1.0000005^t2 - 1.0000005^t1)``.

Composition (SURVEY §2.4 V11): J4 cross join (41-row depth ladder,
broadcast), A5 exact median, W4 cumulative sum + W3 lead over the V2
ledger, J8 range intersection as greatest/least expressions, math
functions. All built-ins; the only shuffles are the per-pair median
aggregation and the per-pool ledger sort (already required by V2).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

LN_TICK = math.log(1.000001)
TICK_BASE = 1.0000005
INT_MAX = 2147483647
INT_MIN = -2147483648
TWO128 = float(2**128)


def pool_market_depth(
    tables: dict[str, DataFrame], tick_liquidity: DataFrame
) -> DataFrame:
    pool_keys = tables["pool_keys"]
    swaps = tables["swaps"]
    blocks = tables["blocks"].select(
        F.col("number").alias("__block"), F.col("time").alias("__time")
    )

    spark = pool_keys.sparkSession
    depth_percentages = spark.range(0, 41).select(
        (F.pow(F.lit(1.21), F.col("id").cast("double")) * 0.00005).alias("depth_percent")
    )

    sp = swaps.join(F.broadcast(pool_keys.select("key_hash", "token0", "token1")),
                    swaps.pool_key_hash == F.col("key_hash")).filter(
        F.col("liquidity_after") != 0
    )
    # One pass over the swaps fact: the pair's last-swap time is a
    # max_by window over the SAME (token0, token1) partitioning the
    # median aggregation shuffles on, so Catalyst reuses one exchange
    # and the upstream swaps pipeline executes once (the two-phase
    # last-swap-then-join formulation ran it twice).
    wp = W.partitionBy("token0", "token1")
    median_ticks = (
        sp.join(F.broadcast(blocks), sp.block_number == F.col("__block"))
        .withColumn("last_time", F.max_by("__time", "event_id").over(wp))
        .filter(F.col("__time") >= F.col("last_time") - F.expr("INTERVAL 1 HOUR"))
        .groupBy("token0", "token1")
        .agg(F.percentile("tick_after", F.lit(0.5)).alias("median_tick"))
    )

    fee_frac = F.col("fee").cast("double") / F.lit(TWO128)
    pool_states = (
        pool_keys.crossJoin(F.broadcast(depth_percentages))
        .join(median_ticks, ["token0", "token1"], "left")
        .select(
            "key_hash",
            "depth_percent",
            F.floor(F.log(F.lit(1.0) + F.col("depth_percent")) / F.lit(LN_TICK))
            .cast("int")
            .alias("depth_in_ticks"),
            F.ceil(F.log10(F.lit(1.0) + fee_frac) / F.lit(math.log10(1.000001)))
            .cast("int")
            .alias("fee_in_ticks"),
            F.round(F.col("median_tick")).cast("int").alias("last_tick"),
        )
    )

    w = W.partitionBy("pool_key_hash").orderBy("tick")
    pool_ticks = tick_liquidity.select(
        "pool_key_hash",
        F.sum("net_liquidity_delta_diff")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("liquidity"),
        F.col("tick").alias("tick_start"),
        F.lead("tick").over(w).alias("tick_end"),
    )

    # int4range(a,b) * int4range(c,d): empty when a >= b (Postgres
    # normalizes); NULL lead -> unbounded upper
    t_end = F.coalesce(F.col("tick_end"), F.lit(INT_MAX))
    below_lo = F.greatest(F.col("last_tick") - F.col("depth_in_ticks"), F.col("tick_start"))
    below_hi = F.least(F.col("last_tick") - F.col("fee_in_ticks"), t_end)
    above_lo = F.greatest(F.col("last_tick") + F.col("fee_in_ticks"), F.col("tick_start"))
    above_hi = F.least(F.col("last_tick") + F.col("depth_in_ticks"), t_end)

    ranges = (
        pool_ticks.join(
            # pools x 41 depth levels — small relative to the tick
            # ledger, but it GROWS with pool cardinality, so no forced
            # broadcast hint: AQE broadcasts it while it fits and falls
            # back to a shuffle join at extreme pool counts
            pool_states,
            pool_ticks.pool_key_hash == pool_states.key_hash,
        )
        .filter(
            (F.col("liquidity") != 0) & (F.col("fee_in_ticks") < F.col("depth_in_ticks"))
        )
        .select(
            "pool_key_hash",
            F.col("liquidity").cast("double").alias("liquidity"),
            "depth_percent",
            below_lo.alias("below_lo"),
            below_hi.alias("below_hi"),
            above_lo.alias("above_lo"),
            above_hi.alias("above_hi"),
        )
        .filter((F.col("below_hi") > F.col("below_lo")) | (F.col("above_hi") > F.col("above_lo")))
    )

    def p(c):
        return F.pow(F.lit(TICK_BASE), c.cast("double"))

    amount1 = F.when(
        F.col("below_hi") > F.col("below_lo"),
        F.col("liquidity") * (p(F.col("below_hi")) - p(F.col("below_lo"))),
    ).otherwise(F.lit(0.0))
    amount0 = F.when(
        F.col("above_hi") > F.col("above_lo"),
        F.col("liquidity") * (1.0 / p(F.col("above_lo")) - 1.0 / p(F.col("above_hi"))),
    ).otherwise(F.lit(0.0))

    return (
        ranges.groupBy("pool_key_hash", "depth_percent")
        .agg(
            F.floor(F.sum(amount0)).alias("depth0"),
            F.floor(F.sum(amount1)).alias("depth1"),
        )
        .select("pool_key_hash", "depth_percent", "depth0", "depth1")
    )
