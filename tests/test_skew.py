"""Salted operators must be *exactly* equivalent to their unsalted
forms — salting redistributes work, never changes results."""

from __future__ import annotations

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.operators.skew import salted_aggregate, salted_join

SF_DIR = "/root/testdata/sf0.001"


def _skewed(spark):
    """events with one synthetic hot key owning ~half the rows."""
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(7)).otherwise(F.col("user_id")),
    )


class TestSaltedAggregate:
    def test_equals_plain_groupby(self, spark):
        df = _skewed(spark)
        got = salted_aggregate(
            df,
            ["user_id"],
            {
                "total": ("value", "sum"),
                "n": ("value", "count"),
                "hi": ("value", "max"),
            },
        )
        want = df.groupBy("user_id").agg(
            F.sum("value").alias("total"),
            F.count("value").alias("n"),
            F.max("value").alias("hi"),
        )
        g = {(r["user_id"], round(r["total"], 6), r["n"], r["hi"]) for r in got.collect()}
        w = {(r["user_id"], round(r["total"], 6), r["n"], r["hi"]) for r in want.collect()}
        assert g == w


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        df = _skewed(spark)
        dim = (
            df.select("user_id").distinct().withColumn("grp", F.pmod("user_id", F.lit(5)))
        )
        got = salted_join(df, dim, ["user_id"])
        want = df.join(dim, ["user_id"])
        assert got.count() == want.count()
        g = {tuple(map(str, r)) for r in got.select(*sorted(got.columns)).collect()}
        w = {tuple(map(str, r)) for r in want.select(*sorted(want.columns)).collect()}
        assert g == w

    def test_left_join_preserved(self, spark):
        df = _skewed(spark)
        dim = (
            df.select("user_id")
            .distinct()
            .filter(F.col("user_id") != 7)  # hot key missing from dim
            .withColumn("grp", F.pmod("user_id", F.lit(5)))
        )
        got = salted_join(df, dim, ["user_id"], how="left")
        want = df.join(dim, ["user_id"], "left")
        assert got.count() == want.count()
        assert (
            got.filter(F.col("grp").isNull()).count()
            == want.filter(F.col("grp").isNull()).count()
        )
