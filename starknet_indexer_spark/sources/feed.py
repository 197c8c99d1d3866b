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


def read_feed_stream(spark: SparkSession, feed_dir: str) -> DataFrame:
    return spark.readStream.schema(RAW_SCHEMA).parquet(feed_dir)
