"""Table maintenance: small-file compaction for block-bucketed tables.

Streaming ingest appends one file set per micro-batch; at one batch
per block interval a bucket accumulates hundreds of small files, and
at 100 TB the scan cost becomes file-open-bound. Compaction rewrites a
bucket's files into few large ones — contents unchanged, so it can run
any time (the parquet analogue of Delta OPTIMIZE; with table formats
this is a metadata-transactional operation).

Only buckets older than the active head should be compacted in a live
pipeline (the head bucket is still receiving appends); callers pass
``max_bucket`` for that.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _bucket_dirs(table_dir: str) -> list[str]:
    return sorted(
        d for d in os.listdir(table_dir) if d.startswith("block_bucket=")
    )


def compact_table(
    spark: SparkSession,
    table_dir: str,
    max_bucket: int | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Compact every bucket of one table with >= ``min_files`` data
    files. Returns {bucket_dir: (files_before, files_after)}."""
    out: dict[str, tuple[int, int]] = {}
    if not os.path.isdir(table_dir):
        return out
    for d in _bucket_dirs(table_dir):
        bucket = int(d.split("=")[1])
        if max_bucket is not None and bucket > max_bucket:
            continue
        bdir = os.path.join(table_dir, d)
        files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        if len(files) < min_files:
            continue
        size = sum(os.path.getsize(os.path.join(bdir, f)) for f in files)
        n_out = max(1, round(size / target_file_bytes))
        df = spark.read.parquet(bdir)
        staging = bdir + "._compact"
        shutil.rmtree(staging, ignore_errors=True)
        df.coalesce(n_out).write.mode("overwrite").parquet(staging)
        trash = bdir + "._old"
        os.replace(bdir, trash)
        os.replace(staging, bdir)
        shutil.rmtree(trash, ignore_errors=True)
        out[d] = (
            len(files),
            len([f for f in os.listdir(bdir) if f.endswith(".parquet")]),
        )
    return out


def compact_all(
    spark: SparkSession, tables_dir: str, max_bucket: int | None = None
) -> dict[str, dict]:
    """Compact every stored table under the ingest root."""
    results = {}
    for name in sorted(os.listdir(tables_dir)):
        p = os.path.join(tables_dir, name)
        if os.path.isdir(p):
            r = compact_table(spark, p, max_bucket=max_bucket)
            if r:
                results[name] = r
    return results
