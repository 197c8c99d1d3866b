"""Source plane: where raw bytes become DataFrames.

``feed`` defines the canonical raw-event message schema (the Spark
equivalent of the reference's Apibara gRPC stream payload,
src/index.ts:127-141) and its batch/streaming readers. A Kafka or
object-store deployment swaps the reader; everything downstream
(ingest decode, dispatch, sinks) is source-agnostic.
"""

from .feed import RAW_SCHEMA, read_feed_batch, read_feed_stream  # noqa: F401
