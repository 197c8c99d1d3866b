"""DB-API relational sink: executor-side upsert semantics against
stdlib sqlite3 (the reference's Postgres insert path,
src/index.ts:195-257 — idempotent per-key inserts, connection per
partition, micro-batch transaction boundary)."""

from __future__ import annotations

import functools
import sqlite3

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.sources.dbsink import foreach_batch_upsert, write_upsert

SF_DIR = "/root/testdata/sf0.001"


def _connect(path: str):
    # high timeout: partitions writing concurrently serialize on
    # sqlite's single-writer lock — fine for a test, Postgres takes
    # the parallel writes for real
    return sqlite3.connect(path, timeout=60)


def _make_db(path: str) -> None:
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE events (event_id INTEGER PRIMARY KEY, user_id INTEGER,"
        " event_type TEXT, value REAL)"
    )
    conn.commit()
    conn.close()


def _count(path: str) -> int:
    conn = sqlite3.connect(path)
    try:
        return conn.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    finally:
        conn.close()


def test_upsert_roundtrip_and_idempotency(spark, tmp_path):
    db = str(tmp_path / "sink.db")
    _make_db(db)
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "event_type", "value")
    n = ev.count()

    factory = functools.partial(_connect, db)
    write_upsert(ev.coalesce(4), "events", ["event_id"], factory)
    assert _count(db) == n

    # replay the full set plus an overlapping slice: counts must not move
    write_upsert(ev.coalesce(4), "events", ["event_id"], factory)
    write_upsert(
        ev.filter(F.col("event_id") < 100).coalesce(2), "events", ["event_id"], factory
    )
    assert _count(db) == n

    conn = sqlite3.connect(db)
    got = conn.execute(
        "SELECT event_id, user_id FROM events ORDER BY event_id LIMIT 3"
    ).fetchall()
    conn.close()
    want = [
        (r["event_id"], r["user_id"])
        for r in ev.orderBy("event_id").limit(3).collect()
    ]
    assert got == want


def test_foreach_batch_upsert_stream(spark, tmp_path):
    db = str(tmp_path / "stream.db")
    _make_db(db)
    src = str(tmp_path / "src")
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "event_type", "value")
    ev.coalesce(2).write.mode("overwrite").parquet(src)

    sink = foreach_batch_upsert("events", ["event_id"], functools.partial(_connect, db))
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    assert _count(db) == ev.count()

    # restart over the same checkpoint: no new data, no double writes
    stream2 = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream2.awaitTermination(120)
    assert _count(db) == ev.count()
