"""starknet_indexer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
EkuboProtocol/starknet-indexer (studied read-only at /root/reference/),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for ingest, and library-level operators (as-of /
argmax-per-key, range intersection, dedup/similarity/text-analysis) for
everything Postgres gave the reference for free.

Layout
------
- ``session``    SparkSession builder tuned for local[] test runs and
                 documented knobs for multi-executor clusters.
- ``catalog``    table registry over the driver-generated parquet dirs.
- ``schemas``    explicit StructTypes for the Ekubo event-sourced tables
                 (reference: src/dao.ts createSchema, lines 86-1541).
- ``decode``     felt-array parser combinators as column expressions
                 (reference: src/parse.ts).
- ``functions``  shared column-level helpers (event ids, hex codecs,
                 interval algebra, deterministic numeric policies).
- ``operators``  reusable DataFrame operators: as-of join, argmax-per-key,
                 dedup (exact/minhash/simhash), similarity search, text
                 analysis, multimodal plumbing.
- ``views``      the reference's derived views V1..V17 as DataFrame
                 pipelines over Ekubo-shaped tables.
- ``queries``    the driver-facing query library over the synthetic
                 TPC-H-ish tables (the t2 correctness surface).
- ``streaming``  incremental view maintenance (foreachBatch MERGE),
                 watermark windows, applyInPandasWithState operators.
- ``ingest``     raw feed -> decoded, flattened stored tables; cursor,
                 reorg suffix-invalidation, dimension upserts.
- ``runtime``    the two refresh tiers (per-block operational / 5-min
                 analytical) with the matview dependency DAG wired.
- ``daemon``     the indexer main loop: streaming feed -> ingest ->
                 cursor -> tiered refresh (reference src/index.ts).
- ``plans``      physical-plan inspection (the performance contract).
- ``maintenance`` bucket compaction (small-file mitigation at scale).
- ``sources``    raw feed schema + batch/stream readers.
"""

__version__ = "0.1.0"
