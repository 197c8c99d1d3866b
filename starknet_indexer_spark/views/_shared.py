"""Helpers shared across view modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_block_time(
    df: DataFrame,
    blocks: DataFrame,
    out: str = "time",
    expr: Column | None = None,
) -> DataFrame:
    """Join a fact's block_number to the broadcast blocks dimension,
    adding the block time as ``out`` (or a derived column via
    ``expr``, e.g. the hour bucket). The one shared blocks-time join
    every view family needs — previously three private copies."""
    e = F.col("time") if expr is None else expr
    b = blocks.select(F.col("number").alias("__block"), e.alias(out))
    return df.join(F.broadcast(b), df.block_number == F.col("__block")).drop("__block")
