"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (latest-state-per-key — the
pool_states_view pattern, reference src/dao.ts:384-427) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full registered query
library (starknet_indexer_spark.queries) for the driver's DuckDB
correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from starknet_indexer_spark import queries as qlib
from starknet_indexer_spark.catalog import DEFAULT_SF_DIR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    V1 pool_states — the reference's flagship materialized view
    (src/dao.ts:384-433) — run end-to-end through the event-derived
    Ekubo tables and the real view implementation."""
    return qlib.REGISTRY["v01_pool_states"].fn(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return qlib.queries()


def oracle_sql() -> dict[str, str]:
    return qlib.oracle_sql()
