"""Streaming-tier components: incremental view maintenance
(trigger-equivalent, SURVEY.md §2.5) built on foreachBatch over
Structured Streaming, with batch-recompute equivalence as the test
invariant — exactly how the reference validates its own incremental
table (src/dao.ts:510-515).
"""

from . import incremental, stateful, windows  # noqa: F401
