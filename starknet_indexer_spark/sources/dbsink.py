"""Relational (DB-API) sink: the Spark analogue of the reference's
Postgres insert path.

The reference writes every decoded event into Postgres inside one
transaction per block with ``ON CONFLICT DO NOTHING`` idempotency
(src/index.ts:195-257, src/dao.ts:1895-2893). On a Spark cluster the
equivalent shape is:

- **executor-side writes, connection per partition** — the driver
  never funnels rows (a driver-side loop caps throughput at one node);
  each task opens one connection, writes its partition in batches, and
  commits once, so a 1000-executor job gives the database exactly as
  much parallelism as it can take (bound it with
  ``df.coalesce(n_connections)`` when the DB is the bottleneck);
- **idempotent upsert** — INSERT OR IGNORE / ON CONFLICT DO NOTHING
  keyed on the table's natural key (event_id), so task retries and
  reorg replays are safe: the at-least-once delivery of a retried
  foreachBatch becomes exactly-once in the sink, the same guarantee
  the reference gets from its unique indexes;
- **micro-batch boundary = transaction boundary** — for streaming,
  ``foreachBatch(upsert_batch(...))`` commits each micro-batch the
  way the reference commits each block.

The connection factory is injected (any DB-API 2.0 driver: psycopg2,
sqlite3, mysqlclient), which keeps the module dependency-free and
testable against stdlib sqlite3 in this container. A JVM JDBC driver,
when present, can replace this with ``df.write.format("jdbc")`` for
append-only tables — but JDBC's SaveMode has no upsert, which is why
the reference-parity path is DB-API + explicit conflict clause.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame

# rows per executemany round-trip; large enough to amortize the call,
# small enough to keep per-statement memory flat
DEFAULT_BATCH_SIZE = 1_000


def _insert_sql(table: str, columns: list[str], key_columns: list[str], dialect: str) -> str:
    cols = ", ".join(columns)
    ph = ", ".join(["?"] * len(columns)) if dialect == "qmark" else ", ".join(
        ["%s"] * len(columns)
    )
    keys = ", ".join(key_columns)
    return (
        f"INSERT INTO {table} ({cols}) VALUES ({ph}) "
        f"ON CONFLICT ({keys}) DO NOTHING"
    )


def write_upsert(
    df: DataFrame,
    table: str,
    key_columns: list[str],
    connection_factory: Callable[[], Any],
    batch_size: int = DEFAULT_BATCH_SIZE,
    dialect: str = "qmark",
) -> None:
    """Write ``df`` into ``table`` with conflict-ignoring inserts,
    one connection and one transaction per partition.

    ``connection_factory`` must be picklable (top-level function or
    functools.partial over picklable args) — it runs on executors.
    ``dialect`` picks the placeholder style: ``qmark`` (sqlite3) or
    ``pyformat`` (psycopg2/mysql).
    """
    columns = df.columns
    sql = _insert_sql(table, columns, key_columns, dialect)

    def write_partition(rows: Iterator[Any]) -> Iterator[int]:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            buf: list[tuple] = []
            n = 0
            for row in rows:
                buf.append(tuple(row))
                if len(buf) >= batch_size:
                    cur.executemany(sql, buf)
                    n += len(buf)
                    buf.clear()
            if buf:
                cur.executemany(sql, buf)
                n += len(buf)
            conn.commit()
            yield n
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    # foreachPartition would do; mapPartitions + count() keeps a
    # per-task row count observable for tests/metrics
    df.rdd.mapPartitions(write_partition).sum()


def foreach_batch_upsert(
    table: str,
    key_columns: list[str],
    connection_factory: Callable[[], Any],
    batch_size: int = DEFAULT_BATCH_SIZE,
    dialect: str = "qmark",
):
    """``writeStream.foreachBatch`` adapter: each micro-batch lands as
    one idempotent upsert round — replayed batches (restart from
    checkpoint) deduplicate on the key, giving end-to-end exactly-once
    into the relational sink."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_upsert(
            batch_df,
            table,
            key_columns,
            connection_factory,
            batch_size=batch_size,
            dialect=dialect,
        )

    return _sink
