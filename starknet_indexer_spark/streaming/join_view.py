"""Incremental maintenance of a materialized JOIN view (delta joins).

The aggregation ledger (streaming/incremental.py) covers the
reference's trigger-maintained AGG view; this module covers the other
classic IVM shape: a materialized inner equi-join ``V = L JOIN R ON
key`` under append-only arrivals on BOTH sides, with rows allowed to
arrive out of order ACROSS sides (a fact before its dimension row, or
vice versa). The standard delta-join identity makes the per-batch
work proportional to the deltas, never the accumulated sides:

    dV  =  dL JOIN R_old  UNION ALL  L_old JOIN dR  UNION ALL  dL JOIN dR

The three terms are disjoint by construction (state is appended only
AFTER the delta view is computed), so every matched pair is emitted
exactly once across the life of the stream — the union of all emitted
batches equals the full recompute ``L JOIN R``, the same
incremental-vs-recompute equivalence the reference seeds its trigger
ledger with (src/dao.ts:510-515).

Scale layout: both side states are parquet partitioned by
``bucket = pmod(xxhash64(key), N_BUCKETS)``. A delta only probes the
opposite side's buckets its OWN keys hash into (partition-pruned
scan), and the delta side of each cross term is broadcast — so at
100 TB the accumulated sides are never shuffled, and per-batch cost is
O(|delta| + matched state buckets). The emitted view is append-only
parquet; sides append new bucket files (no rewrite — append-only
semantics need no merge).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .epochs import epoch_idempotent

N_BUCKETS = 16


def _bucket(col: Column) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


class JoinViewMaintainer:
    """Maintains ``view = left JOIN right ON key`` under appends.

    ``left``/``right`` batches must carry the key column plus
    side-specific payload columns; the two sides' payload column sets
    must be disjoint (validated — the view carries key + both
    payloads)."""

    def __init__(self, state_dir: str, key: str, n_buckets: int = N_BUCKETS):
        self.state_dir = state_dir
        self.key = key
        self.n_buckets = n_buckets
        self.left_dir = os.path.join(state_dir, "left")
        self.right_dir = os.path.join(state_dir, "right")
        self.view_dir = os.path.join(state_dir, "view")

    # -- state I/O ----------------------------------------------------
    def read_view(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.view_dir):
            return None
        return spark.read.parquet(self.view_dir)

    def _append_side(self, delta: DataFrame, side_dir: str) -> None:
        delta.withColumn("bucket", _bucket(F.col(self.key))).write.mode(
            "append"
        ).partitionBy("bucket").parquet(side_dir)

    def _probe(
        self, spark: SparkSession, delta: DataFrame, side_dir: str
    ) -> DataFrame | None:
        """Opposite-side state restricted to the buckets the delta's
        keys hash into — a partition-pruned scan, never a full read."""
        if not os.path.isdir(side_dir):
            return None
        buckets = [
            r[0]
            for r in delta.select(_bucket(F.col(self.key)).alias("b"))
            .distinct()
            .collect()
        ]
        live = [
            b for b in buckets if os.path.isdir(os.path.join(side_dir, f"bucket={b}"))
        ]
        if not live:
            return None
        return (
            spark.read.parquet(side_dir)
            .filter(F.col("bucket").isin(live))
            .drop("bucket")
        )

    # -- the delta-join merge ------------------------------------------
    def apply_batch(
        self,
        spark: SparkSession,
        left_delta: DataFrame | None = None,
        right_delta: DataFrame | None = None,
    ) -> None:
        """Emit dV for one batch of appends and fold the deltas into
        the side states. Either side may be absent/empty."""
        # Pin each delta: its plan is consumed up to three times (bucket
        # probe, view write, state append), and a non-deterministic
        # input (sample/limit/rand) re-evaluated per consumer would
        # break the disjointness that makes pairs exactly-once. Lazy
        # checkpoints still evaluate the plan exactly once (at the
        # first action — the bucket probe) and every later consumer
        # reuses the materialized blocks, without the extra eager job
        # per delta per micro-batch.
        if left_delta is not None:
            left_delta = left_delta.localCheckpoint(eager=False)
        if right_delta is not None:
            right_delta = right_delta.localCheckpoint(eager=False)
        if left_delta is not None and right_delta is not None:
            overlap = (set(left_delta.columns) & set(right_delta.columns)) - {
                self.key
            }
            if overlap:
                raise ValueError(
                    f"left/right payload columns must be disjoint, got {sorted(overlap)}"
                )
        terms: list[DataFrame] = []
        if left_delta is not None:
            right_old = self._probe(spark, left_delta, self.right_dir)
            if right_old is not None:
                terms.append(F.broadcast(left_delta).join(right_old, self.key))
        if right_delta is not None:
            left_old = self._probe(spark, right_delta, self.left_dir)
            if left_old is not None:
                terms.append(left_old.join(F.broadcast(right_delta), self.key))
        if left_delta is not None and right_delta is not None:
            terms.append(left_delta.join(right_delta, self.key))
        for t in terms:
            # one canonical column order so appended files share a schema
            cols = sorted(t.columns)
            t.select(*cols).write.mode("append").parquet(self.view_dir)
        # state updates LAST: the three terms above saw only _old state,
        # which is what makes them disjoint (exactly-once per pair)
        if left_delta is not None:
            self._append_side(left_delta, self.left_dir)
        if right_delta is not None:
            self._append_side(right_delta, self.right_dir)


def stream_maintain(
    spark: SparkSession,
    feed_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    key: str,
    left_cols: list[str],
    right_cols: list[str],
    schema=None,
    side_col: str = "side",
):
    """Streaming driver over a tagged changefeed: each feed row carries
    ``side`` in {'left','right'} plus the key and BOTH sides' payload
    columns (the other side's left null) — the CDC-style co-batched
    shape. ``left_cols``/``right_cols`` name each side's payload
    columns explicitly (deterministic schemas; inferring from observed
    nulls would drift when a batch's column is coincidentally empty).
    Each micro-batch splits by side and delta-joins via
    :class:`JoinViewMaintainer`.

    foreachBatch is at-least-once; an epoch marker written after a
    successful apply makes checkpoint-replay a no-op (same pattern and
    same residual crash window as streaming/incremental.py)."""
    overlap = set(left_cols) & set(right_cols)
    if overlap or key in left_cols or key in right_cols:
        problems = []
        if overlap:
            problems.append(f"columns in both sides: {sorted(overlap)}")
        if key in left_cols or key in right_cols:
            problems.append(f"key {key!r} listed as a payload column")
        raise ValueError(
            "side payload columns must be disjoint and exclude the key; "
            + "; ".join(problems)
        )
    maintainer = JoinViewMaintainer(state_dir, key)
    reader = spark.readStream
    reader = reader.schema(
        schema if schema is not None else spark.read.parquet(feed_dir).schema
    )
    stream = reader.parquet(feed_dir)

    def split(batch_df: DataFrame, side: str, cols: list[str]) -> DataFrame | None:
        part = batch_df.filter(F.col(side_col) == side).select(key, *cols)
        return part if not part.isEmpty() else None

    def body(batch_df: DataFrame, _epoch: int) -> None:
        # no extra pin: the foreachBatch frame is already materialized
        # (LogicalRDD) and deterministic; apply_batch lazily pins the
        # split deltas before their multi-consumer use
        maintainer.apply_batch(
            spark,
            left_delta=split(batch_df, "left", left_cols),
            right_delta=split(batch_df, "right", right_cols),
        )

    process = epoch_idempotent(state_dir, checkpoint_dir, body)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
