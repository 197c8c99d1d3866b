"""Raw event feed: schema + readers.

The reference consumes an ordered gRPC stream of messages, each
carrying block metadata and a raw felt252 array per event
(src/index.ts:127-141, src/processor.ts:17-26). Here the feed is a
directory of parquet with the same logical envelope; the stream
variant is the identical schema through ``readStream`` — Structured
Streaming's file source gives ordered, exactly-once file discovery
with the checkpoint as the cursor (SURVEY.md §2.5).

Scale: a production feed lands as many small files; both readers take
the schema explicitly (no inference scan), and the batch reader can be
pointed at a bounded block-bucket subdirectory for backfill slices.
Kafka drops in by replacing these two functions with
``spark.readStream.format("kafka")`` + ``from_json`` over the same
RAW_SCHEMA — nothing downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RAW_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.IntegerType(), False),
        T.StructField("block_hash", T.StringType(), True),
        T.StructField("block_time", T.TimestampType(), True),
        T.StructField("transaction_index", T.IntegerType(), False),
        T.StructField("event_index", T.IntegerType(), False),
        T.StructField("transaction_hash", T.StringType(), True),
        T.StructField("emitter", T.StringType(), True),
        T.StructField("keys", T.ArrayType(T.StringType()), False),
        T.StructField("data", T.ArrayType(T.StringType()), False),
        T.StructField("finality", T.StringType(), True),
    ]
)


def read_feed_batch(spark: SparkSession, feed_dir: str) -> DataFrame:
    return spark.read.schema(RAW_SCHEMA).parquet(feed_dir)


# File-provenance columns attached by read_feed_stream: inside
# foreachBatch the batch arrives as a plain RDD-backed frame (the
# hidden ``_metadata`` struct no longer resolves), so the provenance
# must be materialized as ordinary columns IN the stream plan for
# ingest to reconstruct in-feed message order across a co-batched
# backlog (ingest._apply_marker_batch).
FEED_FILE_COL = "_feed_file"
FEED_MTIME_COL = "_feed_mtime"


def read_feed_stream(
    spark: SparkSession, feed_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming feed reader. Emits RAW_SCHEMA plus the two
    provenance columns (FEED_FILE_COL, FEED_MTIME_COL) that let the
    ingest layer split marker-carrying micro-batches at reorg
    boundaries in file order; ``max_files_per_trigger`` bounds
    per-batch work (memory/latency) — it is no longer needed for
    marker ordering."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(feed_dir).select(
        "*",
        F.col("_metadata.file_path").alias(FEED_FILE_COL),
        F.col("_metadata.file_modification_time").alias(FEED_MTIME_COL),
    )


def decode_feed_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode a column of JSON message payloads into the feed envelope.

    This is the Kafka value-decode path made concrete: a Kafka source
    yields (key, value, topic, ...) rows whose ``value`` bytes hold one
    JSON message; ``from_json`` against the explicit RAW_SCHEMA (never
    inference — SURVEY §1.3, the reference's schemas are code-defined)
    turns them into the same envelope rows the parquet feed produces,
    so everything downstream of the source is format-agnostic.
    Malformed payloads surface as all-null envelope rows (from_json
    PERMISSIVE) and are dropped on the non-null block_number — at
    scale, route them to a dead-letter sink instead of silently
    discarding by keeping the raw column alongside."""
    from pyspark.sql import functions as F

    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), RAW_SCHEMA).alias("m")
    )
    return parsed.select("m.*").filter(F.col("block_number").isNotNull())


def decode_feed_json_split(
    raw: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter variant of ``decode_feed_json``: returns
    ``(decoded, malformed)``. Malformed payloads (from_json PERMISSIVE
    -> all-null envelope) keep their ORIGINAL bytes in a one-column
    ``raw_value`` frame for a dead-letter sink, instead of being
    silently discarded — at 100 TB/day, a silent drop rate is an
    outage you find weeks later; a dead-letter table is an alert you
    see at the next refresh. Both outputs derive from one projection
    of the same scan (no second read of the source)."""
    from pyspark.sql import functions as F

    parsed = raw.select(
        F.col(value_col).cast("string").alias("raw_value"),
        F.from_json(F.col(value_col).cast("string"), RAW_SCHEMA).alias("m"),
    )
    decoded = parsed.filter(F.col("m.block_number").isNotNull()).select("m.*")
    malformed = parsed.filter(F.col("m.block_number").isNull()).select("raw_value")
    return decoded, malformed


def read_feed_json_batch(spark: SparkSession, feed_dir: str) -> DataFrame:
    """JSON-lines feed directory (one message per line), batch."""
    return decode_feed_json(spark.read.text(feed_dir))


def read_feed_json_stream(spark: SparkSession, feed_dir: str) -> DataFrame:
    """JSON-lines feed directory as a stream; swapping in a real broker
    is ``spark.readStream.format("kafka")...`` feeding the same
    ``decode_feed_json``."""
    return decode_feed_json(spark.readStream.text(feed_dir))
