"""Bucketed co-located joins: two tables bucketed on the join key into
the same bucket count must join with zero shuffle exchanges — the
plan-level proof of the 100 TB co-location strategy."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load, write_bucketed
from starknet_indexer_spark.plans import shuffle_count, without_aqe

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    tag = uuid.uuid4().hex[:8]
    to, tc = f"orders_b_{tag}", f"customer_b_{tag}"
    write_bucketed(
        load(spark, SF_DIR, "orders"),
        to,
        str(tmp_path / "orders_b"),
        ["o_custkey"],
        8,
        sort_cols=["o_custkey"],
    )
    write_bucketed(
        load(spark, SF_DIR, "customer"),
        tc,
        str(tmp_path / "customer_b"),
        ["c_custkey"],
        8,
        sort_cols=["c_custkey"],
    )
    yield to, tc
    spark.sql(f"DROP TABLE IF EXISTS {to}")
    spark.sql(f"DROP TABLE IF EXISTS {tc}")


def test_colocated_join_has_no_shuffle(spark, bucketed_pair):
    to, tc = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with without_aqe(spark):
            joined = spark.table(to).join(
                spark.table(tc),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            assert shuffle_count(joined) == 0, "bucketed join must not shuffle"
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # and it is still correct
    want = (
        load(spark, SF_DIR, "orders")
        .join(
            load(spark, SF_DIR, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    got = (
        spark.table(to)
        .join(spark.table(tc), F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    assert got == want
