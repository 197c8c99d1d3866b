"""Generic relational operators over the TPC-H-ish star schema.

Covers SURVEY.md §2.3 families R1-R3 (scan/filter/projection/CASE),
J1/J2/J6 (dimension joins, outer, anti), A1-A4 (hash aggregation,
conditional aggregation, argmax, distinct), W1 (row_number top-k),
O1/O2 (order/limit).

Reference parity notes are cited per query (src/dao.ts line numbers
refer to /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .registry import register

# Exact-aggregation decimal type: measures in the corpus are 2-decimal
# doubles well under 10^9, so DECIMAL(18,4) is lossless and the SUM is
# order-insensitive on both engines (registry.py determinism policy).
DEC = "decimal(18,4)"


@register(
    "pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    )
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(qty_c) AS DOUBLE) / 100 AS sum_qty,
      CAST(SUM(price_c) AS DOUBLE) / 100 AS sum_base_price,
      CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / 10000 AS sum_disc_price,
      CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000 AS sum_charge,
      ROUND(CAST(SUM(qty_c) AS DOUBLE) / 100 / COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(disc_c) AS DOUBLE) / 100 / COUNT(*), 6) AS avg_disc,
      COUNT(*) AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: grouped conditional aggregation (SURVEY §2.3 "
    "A1/A2/R2). Money math runs in the integer-cents domain: per-row "
    "products are exact LongType multiplies inside whole-stage codegen "
    "(the decimal-multiply chain would exceed precision 18 and fall "
    "off the compact fast path), and only the final sum widens to "
    "decimal(38,0) so it cannot overflow at any corpus size. Both "
    "engines cast the exact integer sum to double before dividing, so "
    "the results are bit-identical.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c.cast(d38)).cast("double") / 100).alias("sum_qty"),
            (F.sum(price_c.cast(d38)).cast("double") / 100).alias("sum_base_price"),
            (F.sum((price_c * (100 - disc_c)).cast(d38)).cast("double") / 10000).alias(
                "sum_disc_price"
            ),
            (
                F.sum((price_c * (100 - disc_c) * (100 + tax_c)).cast(d38)).cast("double")
                / 1000000
            ).alias("sum_charge"),
            F.round(F.sum(qty_c.cast(d38)).cast("double") / 100 / n, 6).alias("avg_qty"),
            F.round(F.sum(disc_c.cast(d38)).cast("double") / 100 / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "filter_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS net_price
    FROM lineitem
    WHERE l_quantity >= 45
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-01-01'
    """,
    doc="Scan + predicate + projection; filters and column pruning reach the "
    "parquet scan (SURVEY §2.3 R1/R2; reference pool_states_view scans "
    "src/dao.ts:384-427).",
)
def filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 45)
            & F.col("l_shipdate").between("1996-01-01", "1998-01-01")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC)))
            .cast("double")
            .alias("net_price"),
        )
    )


@register(
    "dim_join_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS order_count
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus <> 'P'
    GROUP BY r.r_name, n.n_name
    """,
    doc="Fact->dim star join with explicit broadcast of all dims "
    "(SURVEY §2.3 J1; reference: every view joins event facts to "
    "blocks/pool_keys, src/dao.ts:1556-1559).",
)
def dim_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    # Dims are broadcast: the fact table (orders) never shuffles for the
    # join — at 100 TB this is the difference between a map-side join
    # and a full sort-merge shuffle of the fact table.
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS total_customers,
           COUNT(*) FILTER (WHERE o.o_custkey IS NULL) AS without_orders
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
           ON c.c_custkey = o.o_custkey
    GROUP BY n.n_name
    """,
    doc="Left-outer + anti-join semantics (SURVEY §2.3 J2/J6; reference "
    "NOT EXISTS at src/dao.ts:1455-1459, LEFT JOIN at 915-920).",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("total_customers"),
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("without_orders"),
        )
    )


@register(
    "top_customers_per_nation",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal, rn
    FROM (
      SELECT n.n_name, c.c_custkey, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_nationkey
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    WHERE rn <= 3
    """,
    doc="Top-K per key via row_number window (SURVEY §2.3 W1/W5; the "
    "rewrite target for the reference's LEFT JOIN LATERAL ... LIMIT 1, "
    "src/dao.ts:392-405).",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    w = W.partitionBy("n_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_custkey", "c_acctbal", "rn")
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_s
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderdate_s, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: the canonical fact-to-fact shuffle join "
    "(lineitem JOIN orders on orderkey) under selective dimension and "
    "date predicates, then top-10 by aggregated revenue. At 100 TB "
    "both fact sides shuffle on orderkey — co-locating them with "
    "catalog.write_bucketed removes that exchange entirely (the "
    "zero-shuffle plan is locked in tests/test_bucketing.py); the "
    "customer filter broadcasts. Date filters reach both parquet "
    "scans. Deterministic total order: (revenue DESC, date, key).",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1996-03-15 00:00:00").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
        )
        .orderBy(F.col("revenue").desc(), "orderdate_s", "l_orderkey")
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON r.r_regionkey = n.n_regionkey
    JOIN customer c ON n.n_nationkey = c.c_nationkey
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: six-table star-plus-fact join with the "
    "local-supplier correlation (supplier nation == customer nation, a "
    "second non-pushable equi condition on the supplier join). One "
    "shuffle join (lineitem-orders); every dimension side broadcasts; "
    "the region filter prunes nations before they fan out, so the "
    "broadcast sets shrink at the source. The pattern of every "
    "multi-dim Ekubo view (swaps x pool_keys x blocks, "
    "src/dao.ts:1556-1559) at its largest scale.",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31 23:59:59.999999")
    )
    li = load(spark, sf_dir, "lineitem")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "order_priority_distribution",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Distinct aggregation + min/max (SURVEY §2.3 A3/A4; reference "
    "MAX(event_id) at src/dao.ts:767-769, DISTINCT at 875-879).",
)
def order_priority_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min(F.col("o_totalprice").cast(DEC)).cast("double").alias("min_price"),
        F.max(F.col("o_totalprice").cast(DEC)).cast("double").alias("max_price"),
    )
