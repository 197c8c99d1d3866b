"""V13-V16 — the hourly rollup family (the 5-minute analytical pass).

Reference: refreshAnalyticalTables, src/dao.ts:1544-1787. Each job is
an idempotent upsert of hour-bucketed aggregates ``since`` a given
timestamp; passing ``since=None`` recomputes full history (the
reference does exactly that at boot with ``new Date(0)``,
src/index.ts:120).

Spark mapping: each function returns the recomputed hour-partitions as
a DataFrame; the runtime layer persists them with dynamic partition
overwrite on the hour column (equivalent to the reference's ON
CONFLICT (key, hour, token) DO UPDATE — same idempotency, no row-level
upsert needed because the unit of replacement is the hour partition).

Scale notes:
- facts join blocks only to fetch the block timestamp; blocks is
  broadcast (time dimension, src/dao.ts:96-105);
- every rollup groups by (pool, hour[, token]) — one shuffle each,
  partial aggregation map-side;
- the ``since`` filter prunes on block_number/hour before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._shared import with_block_time

from ..functions.core import q128_fee_amount

DEC = "decimal(38,0)"


def _with_hour(df: DataFrame, blocks: DataFrame) -> DataFrame:
    return with_block_time(
        df, blocks, out="hour", expr=F.date_trunc("hour", "time")
    )


def _since_filter(col: Column, since) -> Column:
    if since is None:
        return F.lit(True)
    return col >= F.date_trunc("hour", F.lit(since).cast("timestamp"))


def hourly_volume_by_token(tables: dict[str, DataFrame], since=None) -> DataFrame:
    """V13 (src/dao.ts:1544-1615): hourly swap volume + LP fees per
    (pool, input-token), merged with withdrawal-fee contributions from
    fees_accumulated."""
    pool_keys = tables["pool_keys"].select("key_hash", "token0", "token1", "fee")
    swaps = _with_hour(tables["swaps"], tables["blocks"])
    fa = _with_hour(tables["fees_accumulated"], tables["blocks"])

    volume = F.when(F.col("delta0") >= 0, F.col("delta0")).otherwise(F.col("delta1")).cast(DEC)
    swap_data = (
        swaps.join(F.broadcast(pool_keys), swaps.pool_key_hash == pool_keys.key_hash)
        .filter(_since_filter(F.col("hour"), since))
        .select(
            F.col("pool_key_hash").alias("key_hash"),
            "hour",
            F.when(F.col("delta0") >= 0, F.col("token0")).otherwise(F.col("token1")).alias("token"),
            volume.alias("volume"),
            q128_fee_amount(volume, F.col("fee")).alias("fees"),
        )
        .groupBy("key_hash", "hour", "token")
        .agg(
            F.sum("volume").alias("volume"),
            F.sum("fees").alias("fees"),
            F.count(F.lit(1)).cast(DEC).alias("swap_count"),
        )
    )

    def fa_side(amount_col: str, token_col: str) -> DataFrame:
        return (
            fa.join(F.broadcast(pool_keys), fa.pool_key_hash == pool_keys.key_hash)
            .filter(_since_filter(F.col("hour"), since) & (F.col(amount_col) > 0))
            .groupBy(
                F.col("pool_key_hash").alias("key_hash"),
                "hour",
                F.col(token_col).alias("token"),
            )
            .agg(
                F.lit(0).cast(DEC).alias("volume"),
                F.sum(F.col(amount_col).cast(DEC)).alias("fees"),
                F.lit(0).cast(DEC).alias("swap_count"),
            )
        )

    combined = swap_data.unionByName(fa_side("amount0", "token0")).unionByName(
        fa_side("amount1", "token1")
    )
    return combined.groupBy("key_hash", "hour", "token").agg(
        F.sum("volume").alias("volume"),
        F.sum("fees").alias("fees"),
        F.sum("swap_count").alias("swap_count"),
    )


def hourly_revenue_by_token(tables: dict[str, DataFrame], since=None) -> DataFrame:
    """V14 (src/dao.ts:1617-1654): hourly protocol revenue per (pool,
    token) = -sum(protocol_fees_paid deltas), per token side."""
    pool_keys = tables["pool_keys"].select("key_hash", "token0", "token1")
    pfp = _with_hour(tables["protocol_fees_paid"], tables["blocks"]).join(
        F.broadcast(pool_keys), F.col("pool_key_hash") == pool_keys.key_hash
    )

    def side(delta_col: str, token_col: str) -> DataFrame:
        return (
            pfp.filter(_since_filter(F.col("hour"), since) & (F.col(delta_col) != 0))
            .groupBy(
                F.col("pool_key_hash").alias("key_hash"),
                "hour",
                F.col(token_col).alias("token"),
            )
            .agg((-F.sum(F.col(delta_col).cast(DEC))).alias("revenue"))
        )

    return (
        side("delta0", "token0")
        .unionByName(side("delta1", "token1"))
        .groupBy("key_hash", "hour", "token")
        .agg(F.sum("revenue").alias("revenue"))
    )


def hourly_price_data(tables: dict[str, DataFrame], since=None) -> DataFrame:
    """V15 (src/dao.ts:1656-1688): per (token-pair, hour):
    k_volume = sum(|d0*d1|), total = sum(d1^2) over per-block pair
    sums (two-stage partial aggregation, SURVEY §2.3 A8)."""
    pool_keys = tables["pool_keys"].select("key_hash", "token0", "token1")
    swaps = tables["swaps"].join(
        F.broadcast(pool_keys), F.col("pool_key_hash") == pool_keys.key_hash
    )
    per_block = swaps.groupBy("block_number", "token0", "token1").agg(
        F.sum(F.col("delta0").cast(DEC)).alias("total_delta0"),
        F.sum(F.col("delta1").cast(DEC)).alias("total_delta1"),
        F.count(F.lit(1)).cast(DEC).alias("swap_count"),
    )
    with_hour = _with_hour(per_block, tables["blocks"])
    return (
        with_hour.filter(
            (F.col("total_delta0") != 0)
            & (F.col("total_delta1") != 0)
            & _since_filter(F.col("hour"), since)
        )
        .groupBy("token0", "token1", "hour")
        .agg(
            F.sum(F.abs(F.col("total_delta0") * F.col("total_delta1"))).alias("k_volume"),
            F.sum(F.col("total_delta1") * F.col("total_delta1")).alias("total"),
            F.sum("swap_count").alias("swap_count"),
        )
    )


def hourly_tvl_delta_by_token(tables: dict[str, DataFrame], since=None) -> DataFrame:
    """V16 (src/dao.ts:1690-1787): hourly net token flow per (pool,
    token): 5-way union of swaps, position_updates,
    position_fees_collected, protocol_fees_paid, fees_accumulated
    (amounts as positive deltas), routed to token0/token1.

    The reference filters on ``event_id >= first event id at/after
    since``; passing since=None reproduces the full-history variant.
    """
    blocks = tables["blocks"]
    pool_keys = tables["pool_keys"].select("key_hash", "token0", "token1")

    sources = [
        (tables["swaps"], "delta0", "delta1"),
        (tables["position_updates"], "delta0", "delta1"),
        (tables["position_fees_collected"], "delta0", "delta1"),
        (tables["protocol_fees_paid"], "delta0", "delta1"),
        (tables["fees_accumulated"], "amount0", "amount1"),
    ]

    first_event_id = None
    if since is not None:
        # scalar subquery R4: first event at/after `since` (src/dao.ts:1693-1698)
        first_block = (
            blocks.filter(F.col("time") >= F.date_trunc("hour", F.lit(since).cast("timestamp")))
            .agg(F.min("number"))
            .collect()[0][0]
        )
        first_event_id = None if first_block is None else first_block * 2**32

    parts = []
    for src, c0, c1 in sources:
        s = src
        if since is not None:
            # no block at/after `since` -> the reference's scalar
            # subquery is NULL and `event_id >= NULL` matches nothing:
            # an incremental caller past the head gets an EMPTY delta,
            # not a full-history recompute (coalescing the missing
            # block to 0 did exactly that)
            s = (
                s.filter(F.col("event_id") >= first_event_id)
                if first_event_id is not None
                else s.filter(F.lit(False))
            )
        parts.append(
            _with_hour(s, blocks)
            .groupBy("pool_key_hash", "hour")
            .agg(
                F.sum(F.col(c0).cast(DEC)).alias("delta0"),
                F.sum(F.col(c1).cast(DEC)).alias("delta1"),
            )
        )
    grouped = parts[0]
    for p in parts[1:]:
        grouped = grouped.unionByName(p)

    with_tokens = grouped.join(
        F.broadcast(pool_keys), grouped.pool_key_hash == pool_keys.key_hash
    )
    td0 = with_tokens.groupBy(
        "pool_key_hash", "hour", F.col("token0").alias("token")
    ).agg(F.sum("delta0").alias("delta"))
    td1 = with_tokens.groupBy(
        "pool_key_hash", "hour", F.col("token1").alias("token")
    ).agg(F.sum("delta1").alias("delta"))
    return (
        td0.unionByName(td1)
        .groupBy(F.col("pool_key_hash").alias("key_hash"), "hour", "token")
        .agg(F.sum("delta").alias("delta"))
    )
