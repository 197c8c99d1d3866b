"""Skew mitigation: salted aggregation and salted joins.

Policy (SURVEY.md §4 / session.py): AQE's skew-join splitting is the
first line of defense and is on by default. These helpers cover the
two cases AQE does not:

1. **Hot-key aggregation** — a groupBy where one key owns a large
   fraction of all rows (the `fees_accumulated`-style power-law pool,
   or a boilerplate LSH band). AQE splits skewed *join* partitions,
   not aggregation partitions; pre-aggregating under a salt spreads
   the hot key over ``n_salts`` reducers, then a second (cheap)
   aggregate merges the partials. Exact for any commutative+
   associative aggregate; wired here for sum/count/min/max.

2. **Hot-key non-broadcast join** — a fact⋈fact join with one
   pathological key where the matching build rows still fit per salt.
   The probe side gets a deterministic salt; the build side is
   replicated once per salt value (cost: build × n_salts — keep the
   build side the smaller one).

Salts are deterministic (hash of the full row's source columns, not
rand()) so retries, replays and the batch==stream equivalence tests
stay stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-stage exact aggregation: ``aggs`` maps output column ->
    (input column, fn) with fn in sum/count/min/max. The salt spreads
    each group over ``n_salts`` partial groups; stage 2 merges
    ``n_salts × |groups|`` rows — negligible next to stage 1."""
    salt_cols = salt_source or [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[fn](F.col(src)).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](F.col(out)).alias(out) for out, (src, fn) in aggs.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the probe side salted and the build side
    replicated per salt. Result equals ``probe.join(build, on, how)``
    for inner/left joins; the extra join key breaks one hot key's rows
    across ``n_salts`` tasks."""
    salt_cols = salt_source or [c for c in probe.columns if c not in on]
    p = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return p.join(b, [*on, "__salt"], how).drop("__salt")
