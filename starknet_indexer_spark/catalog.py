"""Table registry over the driver-generated parquet directories.

The synthetic corpus (TESTDATA.md) is a TPC-H-ish star schema plus an
``events`` stream table and the LLM-pipeline tables ``documents`` /
``embeddings``. All reads go through here so partitioning/bucketing
policy has a single home.

Scale notes: at 100 TB each logical table becomes a *directory* of
parquet files partitioned on its natural pruning key (facts:
date/block-range; events: event date). `spark.read.parquet(dir)`
with a filter on the partition column prunes at the source. The
sf* test dirs are single files, so the same code path works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Broadcast policy note: region/nation/supplier/customer/part are
# dimension-sized and every query broadcasts them EXPLICITLY at the
# join site (F.broadcast hints, locked by
# tests/test_plans.py::TestJoinStrategy) — hint-at-the-join keeps each
# plan self-documenting and lets a query opt out (e.g. the probe side
# of an outer join cannot take the hint). A load()-level hint was
# considered and rejected: it would silently attach to every use,
# including positions where Spark warns and ignores it.

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    # Timestamp normalization — two historical corpus encodings:
    # (a) TIMESTAMP(NANOS) read as epoch-nanos longs under
    #     spark.sql.legacy.parquet.nanosAsLong; convert by INTEGER
    #     division to micros — the same ns->us truncation DuckDB's
    #     reader applies. NOT floor(ts/1000): `/` is double division,
    #     and epoch-nanos (~1.7e18) exceed double's 53-bit mantissa.
    # (b) timestamp[us] written without isAdjustedToUTC, which Spark
    #     reads as TIMESTAMP_NTZ; epoch functions (unix_micros etc.)
    #     reject NTZ, so cast to session-TZ TIMESTAMP (session TZ is
    #     pinned UTC in session.py, so the cast is a pure re-tag).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize a table hash-bucketed (and optionally sorted) on its
    join key — the co-location strategy for repeated fact⋈fact joins
    at 100 TB: two tables bucketed on the same key into the same bucket
    count join with NO shuffle exchange (and no sort, if sorted), per
    bucket-pruned file pairing. The Spark analogue of the reference's
    covering composite indexes (SURVEY §4.1). Registered as an external
    parquet table so ``spark.table(table)`` carries the bucket spec."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
