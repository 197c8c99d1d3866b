"""V17 — parameterized staker reward distribution.

Reference: calculate_staker_rewards(start, end, total_rewards,
staking_share, delegate_share) RETURNS TABLE, src/dao.ts:1354-1540.
The staking pot (staking_share fraction) is distributed by
time-weighted stake share over [start, end]; the delegate pot by vote
weight on proposals in the period; ranked claim table out.

Spark mapping (SURVEY §2.6): a parameterized DataFrame function, not a
Catalyst UDTF — called with (tables, params) and returning the claim
table. The reference's per-interval as-of join (stake_events as of
interval start via NOT EXISTS, src/dao.ts:1454-1459) is rewritten as a
validity-interval range join: each stake_event is valid on
[time, next_time), intervals join on containment of their start.

Faithful quirk: the reference's final SELECT maps total_delegate_reward
to the column named ``staker_portion`` and vice versa
(src/dao.ts:1536-1537) — reproduced so outputs match row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.core import to_hex

DEC = "decimal(38,0)"


from ._shared import with_block_time as _with_time  # noqa: E402


def calculate_staker_rewards(
    tables: dict[str, DataFrame],
    start_time,
    end_time,
    total_rewards: float,
    staking_share: float,
    delegate_share: float,
) -> DataFrame:
    blocks = tables["blocks"]
    start = F.lit(start_time).cast("timestamp")
    end = F.lit(end_time).cast("timestamp")
    total_duration = (
        F.unix_micros(end) - F.unix_micros(start)
    ).cast("double") / 1e6

    staked = _with_time(tables["staker_staked"], blocks).select(
        F.col("from_address").alias("staker"), "time", F.col("amount").cast(DEC).alias("delta")
    )
    withdrawn = _with_time(tables["staker_withdrawn"], blocks).select(
        F.col("from_address").alias("staker"), "time", (-F.col("amount").cast(DEC)).alias("delta")
    )
    deltas = staked.unionByName(withdrawn)

    # Step 1-2: interval lattice from distinct in-window times + endpoints
    time_points = (
        deltas.filter(F.col("time").between(start, end))
        .select("time")
        .union(deltas.sparkSession.range(1).select(start.alias("time")))
        .union(deltas.sparkSession.range(1).select(end.alias("time")))
        .distinct()
    )
    # Reference-parity quirk, kept deliberately: the reference's
    # intervals CTE is `... FROM ordered_time_points WHERE time <
    # end_time` with LEAD computed AFTER the WHERE (Postgres applies
    # WHERE before window functions, src/dao.ts:1400-1404), so the
    # point at end_time is removed before LEAD and the final interval
    # [last interior point, end] earns no reward on EITHER engine.
    # Fixing it here (e.g. coalescing the last lead to `end`) would
    # diverge from the reference's actual payouts.
    wt = W.orderBy("time")
    intervals = (
        time_points.filter(F.col("time") < end)
        .select("time", F.lead("time").over(wt).alias("i_end"))
        .filter(F.col("i_end").isNotNull())
        .select(F.col("time").alias("i_start"), "i_end")
    )

    # Step 3-4: running stake per staker (bootstrap collapsed to start)
    changes = (
        deltas.filter(F.col("time") < start)
        .groupBy("staker")
        .agg(F.sum("delta").alias("delta"))
        .select("staker", start.alias("time"), "delta")
        .unionByName(
            deltas.filter(F.col("time").between(start, end)).select("staker", "time", "delta")
        )
    )
    ws = W.partitionBy("staker").orderBy("time")
    stake_events = changes.select(
        "staker",
        "time",
        F.sum("delta").over(ws.rowsBetween(W.unboundedPreceding, 0)).alias("stake_amount"),
        F.lead("time").over(ws).alias("next_time"),
    )

    # Step 5: as-of join via validity intervals (J5 range join;
    # intervals are few -> broadcast)
    staker_intervals = stake_events.join(
        F.broadcast(intervals),
        (F.col("time") <= F.col("i_start"))
        & (F.col("next_time").isNull() | (F.col("i_start") < F.col("next_time"))),
    ).select("i_start", "i_end", "staker", "stake_amount")

    total_per_interval = staker_intervals.groupBy("i_start", "i_end").agg(
        F.sum("stake_amount").alias("total_stake")
    )

    dur = (F.unix_micros("i_end") - F.unix_micros("i_start")).cast("double") / 1e6
    staking_fraction = staking_share / (staking_share + delegate_share)
    staker_rewards = (
        staker_intervals.join(total_per_interval, ["i_start", "i_end"])
        .filter((F.col("total_stake") > 0) & (F.col("stake_amount") > 0) & (dur > 0))
        .select(
            "staker",
            (
                F.lit(total_rewards * staking_fraction)
                * (dur / total_duration)
                * (F.col("stake_amount").cast("double") / F.col("total_stake").cast("double"))
            ).alias("reward"),
        )
        .groupBy("staker")
        .agg(F.sum("reward").alias("reward"))
    )

    # Delegate pot: vote weight on proposals inside the period
    gp = _with_time(tables["governor_proposed"], blocks).filter(
        F.col("time").between(start, end)
    )
    votes = tables["governor_voted"].join(
        F.broadcast(gp.select(F.col("id").alias("pid"))), F.col("id") == F.col("pid"), "left_semi"
    )
    delegate_weight = votes.groupBy(F.col("voter").alias("delegate")).agg(
        F.sum(F.col("weight").cast(DEC)).alias("total_weight")
    )
    total_weight = delegate_weight.agg(F.sum("total_weight").alias("total"))
    delegate_fraction = delegate_share / (staking_share + delegate_share)
    delegate_rewards = delegate_weight.crossJoin(F.broadcast(total_weight)).select(
        "delegate",
        (
            F.col("total_weight").cast("double")
            * F.lit(total_rewards * delegate_fraction)
            / F.col("total").cast("double")
        ).alias("reward"),
    )

    all_rewards = delegate_rewards.select(
        F.col("delegate").alias("claimee"),
        F.col("reward").alias("delegate_reward"),
        F.lit(0.0).alias("staker_reward"),
    ).unionByName(
        staker_rewards.select(
            F.col("staker").alias("claimee"),
            F.lit(0.0).alias("delegate_reward"),
            F.col("reward").alias("staker_reward"),
        )
    )

    final = all_rewards.groupBy("claimee").agg(
        F.sum("staker_reward").alias("total_staker_reward"),
        F.sum("delegate_reward").alias("total_delegate_reward"),
        (F.sum("staker_reward") + F.sum("delegate_reward")).alias("total_reward"),
    )

    # claimee addresses arrive as NUMERIC (reference schema / fixtures)
    # or as canonical 0x-hex (ingest stores felt252 as hex); to_hex is
    # only needed for the numeric form
    claimee_is_hex = dict(tables["staker_staked"].dtypes)["from_address"] == "string"
    wr = W.orderBy(F.col("total_reward").desc())
    return (
        final.filter(F.col("total_reward") > 0)
        .select(
            (F.row_number().over(wr) - 1).alias("id"),
            (F.col("claimee") if claimee_is_hex else to_hex(F.col("claimee"))).alias("claimee"),
            F.floor("total_reward").alias("amount"),
            # reference swaps these two labels (src/dao.ts:1536-1537)
            F.floor("total_delegate_reward").alias("staker_portion"),
            F.floor("total_staker_reward").alias("delegate_portion"),
        )
    )
