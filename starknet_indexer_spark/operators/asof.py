"""As-of (backward) join: for each left row, the most recent right row
with ``right.ts <= left.ts`` per key.

The reference's whole "latest state" family is the degenerate form of
this (as-of at now: argmax per key, SURVEY §2.3 J3/W5); the general
time-travel form joins two event streams — e.g. each swap against the
prevailing oracle snapshot.

Implementation is the union+window trick, NOT a range theta join:

    tag right rows 0, left rows 1
    union on (key, ts, tag)
    last_value(right payload, ignore nulls) over
        (partition by key order by ts, tag rows unbounded preceding..current)
    keep tag=1 rows

One shuffle on the key, one sort within partitions — O(n log n) and
skew-bounded, where the naive theta join is O(left × right) per key.
Ties (equal ts) resolve right-before-left, i.e. a right row effective
*at* t matches a left row at t — the same semantics as DuckDB/kdb
ASOF JOIN's ``>=``, which the oracle uses.

The right side must be unique per (key, ts) — pre-aggregate to
``max_by`` per timestamp grain first (ambiguous ties have no defined
winner in any asof engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join. ``left`` keeps all its columns plus
    ``value_cols`` from the latest ``right`` row at or before its
    ``ts_col`` (null if none). Both inputs need ``on + [ts_col]``;
    ``right`` additionally ``value_cols``, unique per (on, ts)."""
    lcols = [c for c in left.columns if c not in on and c != ts_col]
    r = right.select(
        *on,
        ts_col,
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    l = left.select(
        *on,
        ts_col,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
        *lcols,
    )
    w = (
        W.partitionBy(*on)
        .orderBy(ts_col, "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = r.unionByName(l).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return merged.filter(F.col("__side") == 1).select(*on, ts_col, *lcols, *value_cols)
