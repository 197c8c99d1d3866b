"""V10 — 7-day realized volatility per token pair.

Reference: token_pair_realized_volatility_view, src/dao.ts:1038-1083.
Per pair, over hourly_price_data rows in the 7 days before the latest
block: log implied price = ln(total/k_volume); realized volatility =
sqrt(sum of squared hourly log-price changes); also expressed in ticks
(/ ln(1.000001)).

Input is the V15 output (small, hour-bucketed) — the lag window and
final aggregation run on pairs x hours, not on raw swaps.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def token_pair_realized_volatility(
    tables: dict[str, DataFrame], hourly_price: DataFrame
) -> DataFrame:
    last_time = tables["blocks"].agg(F.max("time").alias("end_time"))
    prices = (
        hourly_price.crossJoin(F.broadcast(last_time))
        .filter(
            F.col("hour").between(
                F.col("end_time") - F.expr("INTERVAL 7 DAYS"), F.col("end_time")
            )
            & (F.col("k_volume") != 0)
        )
        .select(
            "token0",
            "token1",
            "hour",
            F.log(F.col("total").cast("double") / F.col("k_volume").cast("double")).alias(
                "log_price"
            ),
        )
    )
    w = W.partitionBy("token0", "token1").orderBy("hour")
    changes = prices.select(
        "token0",
        "token1",
        (F.col("log_price") - F.lag("log_price").over(w)).alias("price_change"),
    ).filter(F.col("price_change").isNotNull())
    vol = changes.groupBy("token0", "token1").agg(
        F.count(F.lit(1)).alias("observation_count"),
        F.sqrt(F.sum(F.col("price_change") * F.col("price_change"))).alias(
            "realized_volatility"
        ),
    )
    return vol.filter(F.col("realized_volatility").isNotNull()).select(
        "token0",
        "token1",
        "realized_volatility",
        "observation_count",
        F.floor(F.col("realized_volatility") / F.lit(math.log(1.000001)))
        .cast("int")
        .alias("volatility_in_ticks"),
    )
