"""Corpus-profiling sketches and data-layout queries.

Two 100 TB-first operators, each with an exact cross-engine oracle:

- ``approx_distinct_shingles`` — distinct-count estimation via
  hash-threshold sampling (`operators/sketches.py`): the shuffle
  carries ~1/16 of the distinct values instead of all of them, and
  the estimate is integer-exact on both engines, so even the
  *approximate* path is driver-hash-checkable.
- ``zorder_locality`` — Morton-key layout audit
  (`operators/layout.py`): groups events by z-key prefix and shows
  each prefix covers a narrow range of BOTH interleaved dimensions —
  the min/max-tightness property that turns a z-ordered parquet
  layout into multi-dimensional row-group skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.dedup import tokens_expr, word_shingles_expr
from ..operators.layout import zorder_key_expr, zorder_key_sql
from ..operators.sketches import (
    hash_threshold_distinct,
    hash_threshold_distinct_sql,
)
from .registry import register

# 1-in-16 retention: the corpora carry ~1-8k distinct shingles per
# source (20 sources), so each group keeps enough samples for
# ~10-15% relative error while the distinct-shuffle shrinks 16x
# (accuracy pinned in tests/test_operators.py). Production corpora
# with billions of distinct values raise this toward 16-20 bits.
SHINGLE_RATIO_BITS = 4

_SH_SRC_SQL = r"""
    SELECT source, UNNEST(shingles) AS shingle FROM (
      SELECT source,
             list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                            for i in range(1, len(tokens) - 1)]) AS shingles
      FROM (
        SELECT source,
               list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                           ' '), x -> x <> '') AS tokens
        FROM documents
      ) WHERE len(tokens) >= 3
    )
"""

_PRED, _EST = hash_threshold_distinct_sql("shingle", SHINGLE_RATIO_BITS)


@register(
    "approx_distinct_shingles",
    oracle=f"""
    WITH sh AS ({_SH_SRC_SQL})
    SELECT source, {_EST} AS est_distinct
    FROM sh WHERE {_PRED}
    GROUP BY source
    """,
    doc="Per-source distinct trigram-shingle estimate via "
    "hash-threshold sampling: retain a shingle iff its 60-bit md5 "
    "hash < 2^56 (1-in-16 of distinct values, independent of "
    "frequency), then COUNT(DISTINCT retained) << 4. The filter runs "
    "map-side before the distinct, so the shuffle carries ~1/16 of "
    "the distinct values — the cheap profiling path where an exact "
    "COUNT(DISTINCT) would shuffle every distinct shingle of a "
    "100 TB corpus — and the estimate is exact integer math over an "
    "engine-portable hash, so the approximation itself is "
    "hash-verified against DuckDB (Spark's HLL-based "
    "approx_count_distinct cannot be). Accuracy vs exact "
    "COUNT(DISTINCT) is pinned in tests/test_operators.py.",
)
def approx_distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source", tokens_expr(F.col("text")).alias("tokens"))
    sh = (
        toks.filter(F.size("tokens") >= 3)
        .select("source", F.explode(word_shingles_expr(F.col("tokens"))).alias("shingle"))
    )
    return hash_threshold_distinct(
        sh, ["source"], F.col("shingle"), SHINGLE_RATIO_BITS
    )


ZORDER_BITS = 16
# keep the top 20 of 32 interleaved bits: drops the low 6 bits of each
# dimension, so a prefix group = a (user_id//64, hour//64) locality cell
ZORDER_PREFIX_SHIFT = 12


@register(
    "zorder_locality",
    oracle=f"""
    WITH spans AS (
      SELECT MIN(user_id) AS u0, MIN(epoch_us(ts) // 3600000000) AS h0 FROM events
    ),
    keyed AS (
      SELECT {zorder_key_sql(["user_id - u0", "epoch_us(ts) // 3600000000 - h0"], ZORDER_BITS)} AS z,
             user_id - u0 AS user_n,
             epoch_us(ts) // 3600000000 - h0 AS hour_n
      FROM events, spans
    )
    SELECT z >> {ZORDER_PREFIX_SHIFT} AS z_prefix,
           COUNT(*) AS n_events,
           MIN(user_n) AS user_min, MAX(user_n) AS user_max,
           MIN(hour_n) AS hour_min, MAX(hour_n) AS hour_max
    FROM keyed GROUP BY 1
    """,
    doc="Z-order layout audit over events: min-normalize (user_id, "
    "event-hour) to dense non-negative ranges (one broadcast 1-row "
    "aggregate — the same dictionary trick a real layout job uses), "
    "Morton-interleave them into one key (operators/layout.py — pure "
    "shift/mask expressions, engine-portable), then aggregate per "
    "key prefix. Each prefix covering a narrow [min,max] in BOTH "
    "dimensions is exactly the property that makes a z-ordered "
    "parquet layout (write_zordered: repartitionByRange + "
    "sortWithinPartitions on the key) skip row groups for predicates "
    "on EITHER dimension — multi-dim pruning from plain parquet, the "
    "lakehouse OPTIMIZE..ZORDER pattern. Map-only until the single "
    "prefix aggregation; locality itself is asserted in "
    "tests/test_operators.py over real parquet row-group stats.",
)
def zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour_n = F.expr("unix_micros(ts) div 3600000000")
    spans = ev.agg(
        F.min("user_id").alias("u0"), F.min(hour_n).alias("h0")
    )
    keyed = ev.crossJoin(F.broadcast(spans)).select(
        (F.col("user_id") - F.col("u0")).alias("user_n"),
        (hour_n - F.col("h0")).alias("hour_n"),
    )
    z = zorder_key_expr([F.col("user_n"), F.col("hour_n")], ZORDER_BITS)
    return (
        keyed.select(z.alias("z"), "user_n", "hour_n")
        .groupBy(F.shiftright(F.col("z"), ZORDER_PREFIX_SHIFT).alias("z_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_n").alias("user_min"),
            F.max("user_n").alias("user_max"),
            F.min("hour_n").alias("hour_min"),
            F.max("hour_n").alias("hour_max"),
        )
    )

