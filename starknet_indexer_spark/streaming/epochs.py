"""Shared epoch-marker idempotence for foreachBatch sinks.

foreachBatch is at-least-once: if the streaming checkpoint commit
fails AFTER the batch body succeeded, the same epoch is re-delivered
on restart, and a non-idempotent body (additive merges, appends) would
double-apply it. The guard used across this package is a marker file
per (checkpoint-namespace, epoch) written after a successful apply —
a replayed epoch then short-circuits. The namespace comes from
``ingest.checkpoint_marker_ns`` (a per-checkpoint id, NOT a constant:
a stale constant namespace once silently skipped live batches —
ingest.py's marker-ns history) so a fresh checkpoint never inherits
old markers.

One helper, five sinks (incremental ledger, dedup index, IVF index,
join view, drift monitor — the file-feed ones all routed through
state_table.stream_maintain_with): the pattern has a bug history, so it lives in exactly
one place. The residual window — a crash between the body's final
write and the marker write — is the multi-file transactionality a
table format would close; with plain parquet directories it is
documented, not eliminated.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame


def epoch_idempotent(
    marker_root: str,
    checkpoint_dir: str,
    body: Callable[[DataFrame, int], None],
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch body: skip already-applied epochs, run the
    body only for non-empty batches, then persist the epoch marker
    (written for empty epochs too, so replays of them short-circuit
    without re-checking emptiness)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from ..ingest import _prune_epoch_markers, checkpoint_marker_ns

        ns = checkpoint_marker_ns(checkpoint_dir)
        ns_dir = os.path.join(marker_root, "_applied_epochs", ns)
        marker = os.path.join(ns_dir, str(epoch_id))
        if os.path.exists(marker):
            return
        if not batch_df.isEmpty():
            body(batch_df, epoch_id)
        os.makedirs(ns_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write("applied")
        # keep the marker dir O(tail): replay never reaches back past
        # the last uncommitted checkpoint offset, so markers far below
        # the committed epoch are dead weight (same policy as
        # ingest._prune_epoch_markers for the ingest sink)
        _prune_epoch_markers(ns_dir, epoch_id)

    return process
