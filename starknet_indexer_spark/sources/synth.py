"""Synthetic raw-feed generation for ingest throughput measurement.

Derives a feed of raw Starknet-shaped messages (RAW_SCHEMA envelopes
with felt-array payloads) *distributively* from the driver corpus's
``events`` table — pure column expressions, no driver-side row
construction — so feed synthesis scales with the cluster and the
measured ingest number reflects decode+write work, not Python loop
overhead. Payload layouts mirror the reference's ABI event encodings
(swapped: src/eventProcessors.ts swap parser field order; staked:
3-felt (from, amount, delegate)) exactly as tests/test_ingest.py's
hand-built vectors do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..ingest import EVENT_SELECTORS


def _hx(c: Column) -> Column:
    """Canonical felt hex: 0x + lowercase, leading zeros stripped."""
    return F.concat(
        F.lit("0x"),
        F.regexp_replace(F.lower(F.hex(c.cast("bigint"))), "^0+(?=.)", ""),
    )


def synth_raw_feed(spark: SparkSession, sf_dir: str, copies: int = 1) -> DataFrame:
    """events -> raw feed rows. ``purchase`` events become ``swapped``
    messages (21-felt payload), everything else ``staker_staked``
    (3-felt) — a mixed-family feed so ingest exercises the per-selector
    dispatch the way a real block stream does.

    ``copies`` replicates the corpus with disjoint event-id/block
    ranges (id stride 10M) to size the batch independently of the
    scale factor — throughput measurement needs batches big enough to
    amortize fixed job-scheduling cost, exactly like sizing a
    production micro-batch trigger."""
    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("e"), F.col("user_id").alias("u"), "ts", "event_type"
    )
    if copies > 1:
        ev = ev.crossJoin(
            F.broadcast(spark.range(copies).select(F.col("id").alias("cp")))
        ).select(
            (F.col("e") + F.col("cp") * F.lit(10_000_000)).alias("e"),
            "u",
            "ts",
            "event_type",
        )
    e, u = F.col("e"), F.col("u")

    def i129(mag: Column, sign: Column) -> list[Column]:
        return [_hx(mag), _hx(sign)]

    swapped = F.array(
        _hx(u),  # locker
        _hx(F.lit(1) + u % 3),  # token0
        _hx(F.lit(4) + u % 2),  # token1
        _hx(F.lit(1) + u % 3),  # fee
        _hx(F.lit(60)),  # tick_spacing
        _hx(F.lit(0)),  # extension
        *i129((e * 37) % 1000, F.lit(0)),  # amount
        _hx(e % 2),  # is_token1
        _hx(F.lit(1 << 40)),
        _hx(F.lit(0)),  # sqrt_ratio_limit (u256)
        _hx(F.lit(0)),  # skip_ahead
        *i129((e * 37) % 1000 + 1, e % 2),  # delta.amount0
        *i129((e * 53) % 1000 + 1, (e + 1) % 2),  # delta.amount1
        _hx(F.lit(1 << 40)),
        _hx(F.lit(0)),  # sqrt_ratio_after (u256)
        *i129(e % 100, e % 2),  # tick_after
        _hx(u * 1000 + 1),  # liquidity_after
    )
    staked = F.array(_hx(u), _hx((e * 7) % 100000), _hx(u % 50))

    is_swap = F.col("event_type") == "purchase"
    block = (e / F.lit(20)).cast("int") + 1
    return ev.select(
        block.alias("block_number"),
        _hx(block.cast("bigint") * 7919).alias("block_hash"),
        F.col("ts").alias("block_time"),
        (e % 20).cast("int").alias("transaction_index"),
        F.lit(0).cast("int").alias("event_index"),
        _hx(e * 1000 + 3).alias("transaction_hash"),
        F.lit("0xe0b0").alias("emitter"),
        F.array(
            F.when(is_swap, F.lit(EVENT_SELECTORS["swapped"])).otherwise(
                F.lit(EVENT_SELECTORS["staker_staked"])
            )
        ).alias("keys"),
        F.when(is_swap, swapped).otherwise(staked).alias("data"),
        F.lit("accepted").alias("finality"),
    )
