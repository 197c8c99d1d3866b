"""Streaming heavy hitters: sharded Misra-Gries summaries with
bounded state.

Corpus profiling over an unbounded stream ("which tokens / users /
pool keys dominate the last N events?") cannot keep exact per-key
counts — key cardinality grows with history. The Misra-Gries (MG)
summary keeps at most ``k`` counters and guarantees, for a stream of
``n`` items, an estimate ``f̂`` for every key with
``f - n/(k+1) <= f̂ <= f`` — so every key with frequency above
``n/(k+1)`` is guaranteed present. That deterministic error bound (it
holds for EVERY arrival order) is what makes a sketch testable without
exact replay: the equivalence test asserts the bound against exact
batch counts rather than bit-equality.

Distribution: keys are hash-sharded; each shard maintains its own
MG(k) via ``applyInPandasWithState`` (state = k counters per shard —
O(shards x k), independent of history or cardinality). Because each
key lives in exactly ONE shard, the per-shard bound applies to that
shard's substream (``n_shard``), which is tighter than the global
bound; read-time merging is a concatenation, not a sketch merge. At
100 TB/day this is the profiling pattern: tiny state, update-mode
emission of changed summaries, exact top-N recoverable downstream by
re-counting just the surfaced candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def mg_update(counters: dict[str, int], items, k: int) -> dict[str, int]:
    """Classic Misra-Gries update, pure Python (shared by the
    streaming op and the test's reference implementation). ``k`` is a
    separate parameter, never an in-dict sentinel — items are
    arbitrary user strings, and any sentinel key could collide with a
    real item and silently corrupt its count."""
    for x in items:
        if x in counters:
            counters[x] += 1
        elif len(counters) < k:
            counters[x] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def mg_update_weighted(counters: dict[str, int], items, weights, k: int) -> dict[str, int]:
    """Weighted Misra-Gries update (Berinde et al., "Space-optimal
    heavy hitters with strong error bounds"): insert item ``x`` with
    weight ``w`` in one step instead of ``w`` unit arrivals. When the
    k counters are full and ``x`` is new, ``x`` joins temporarily as a
    (k+1)-th counter and ALL k+1 counters drop by their minimum — at
    least one hits zero, so at most k survive. Each such step removes
    ``(k+1)*m`` total mass while charging any single item at most
    ``m``, which preserves the classic guarantee
    ``f - W/(k+1) <= f̂ <= f`` for total weight ``W``.

    This is the vectorized hot path: callers pre-aggregate each Arrow
    batch with ``value_counts()`` and pass (distinct item, count)
    pairs, so the Python loop runs once per DISTINCT item per batch
    rather than once per row. The resulting counters differ from the
    unit-arrival interleaving of :func:`mg_update`, but the superset
    property that downstream exact recounts rely on is identical."""
    for x, w in zip(items, weights):
        w = int(w)
        if x in counters:
            counters[x] += w
            continue
        counters[x] = w
        if len(counters) <= k:
            continue
        m = min(counters.values())
        dead = []
        for key in counters:
            counters[key] -= m
            if counters[key] == 0:
                dead.append(key)
        for key in dead:
            del counters[key]
    return counters


def heavy_hitters_stream(
    stream: DataFrame,
    item_col: str,
    k: int = 64,
    n_shards: int = 8,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Per-shard MG(k) summaries over a streaming item column. Emits,
    per micro-batch, the summaries of shards that received data:
    (shard, items, counts, n_items) — update-mode rows for a MERGE
    sink or memory inspection. State per shard: <= k (item, count)
    pairs + the item total."""
    shard = (
        shard_expr
        if shard_expr is not None
        else F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_shards))
    )
    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("items", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("n_items", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("items", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("n_items", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        if state.exists:
            items, counts, n = state.get
            counters.update(dict(zip(items, counts)))
        changed = False
        for pdf in pdfs:
            # dropna BEFORE astype: astype(str) would turn nulls into
            # the literal string "None", conflating them with a real
            # "None" item. Null items carry no key — skip them.
            vals = pdf[item_col].dropna().astype(str)
            if vals.empty:
                continue
            # Pre-aggregate the Arrow batch: the weighted update loops
            # once per DISTINCT item, not once per row.
            vc = vals.value_counts()
            counters = mg_update_weighted(
                counters, vc.index.tolist(), vc.to_numpy(), k
            )
            n += int(vc.sum())
            changed = True
        if not changed:
            return
        items = sorted(counters)  # stable output order
        counts = [counters[i] for i in items]
        state.update((items, counts, n))
        yield pd.DataFrame(
            [(key[0], items, counts, n)],
            columns=["shard", "items", "counts", "n_items"],
        )

    return (
        stream.filter(F.col(item_col).isNotNull())
        .withColumn("shard", shard)
        .groupBy("shard")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def collect_heavy_hitters(summaries: list) -> dict[str, int]:
    """Concatenate per-shard summaries (each key lives in one shard)
    into one {item: estimate} map.

    Misuse-proof against update-mode HISTORY: each emission for a
    shard is the shard's cumulative summary, so if a caller passes
    every emission (e.g. a memory-sink query's full output) rather
    than only final rows, summing would double-count. ``n_items`` is
    cumulative and strictly grows across a shard's emissions, so the
    row with the max ``n_items`` per shard IS the final summary — keep
    exactly that one, regardless of input order."""
    final: dict = {}
    for row in summaries:
        prev = final.get(row["shard"])
        if prev is None or row["n_items"] > prev["n_items"]:
            final[row["shard"]] = row
    out: dict[str, int] = {}
    for row in final.values():
        for item, count in zip(row["items"], row["counts"]):
            out[item] = out.get(item, 0) + int(count)
    return out
