"""Stream-stream event-time interval joins.

SURVEY §2.5 widening: the reference joins facts to the blocks
dimension (a stream-static join, handled throughout `views/`), but a
general analytics engine also needs the stream-STREAM case — e.g.
"match each purchase to the same user's page-views within the
preceding hour" while both sides are still flowing. Structured
Streaming supports this natively when BOTH sides carry watermarks and
the join condition bounds event time on both sides; the watermark +
interval bound is exactly what lets each side evict buffered rows
once no future match can arrive — state stays proportional to the
interval width x arrival rate, independent of stream length (the
100 TB/day property).

Semantics: inner interval join — rows pair iff keys match AND
``right.ts`` lies in ``[left.ts + lower, left.ts + upper]``. Exactly
the semantics of the batch range join (J5 `range_theta_join`), which
is what the equivalence test compares against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time bounded stream-stream inner join.

    ``left`` / ``right``: streaming (or batch — the operator is
    mode-agnostic, so batch==stream equivalence is testable with the
    same code) DataFrames. ``keys`` equi-join columns (shared names);
    ``left_ts`` / ``right_ts`` MUST be distinct column names so the
    output carries both. ``lower``/``upper`` are interval literals
    (e.g. ``"-1 hour"``, ``"0 seconds"``) bounding
    ``right_ts - left_ts``.

    Both sides get the same watermark; Spark derives each side's
    state-eviction horizon from the watermark plus the interval
    bounds. The join itself shuffles both sides on ``keys`` — the one
    unavoidable exchange; at scale pre-bucketing both streams on the
    key makes it map-side."""
    if left_ts == right_ts:
        raise ValueError(
            f"interval_join: left_ts and right_ts must be distinct column "
            f"names (both are {left_ts!r}) so the output can carry both "
            f"event times; rename one side before joining"
        )
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"interval_join: non-key columns {sorted(overlap)} exist on both "
            f"sides and would be ambiguous in the output; rename or drop "
            f"them on one side (keys={keys})"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        c = lw[k] == rw[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {lower.lstrip('+')}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper.lstrip('+')}"))
    )
    dup = set(keys)
    right_cols = [c for c in right.columns if c not in dup]
    return lw.join(rw, cond, "inner").select(
        *[lw[c] for c in left.columns], *[rw[c] for c in right_cols]
    )
