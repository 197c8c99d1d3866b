"""Additional TPC-H query shapes (Q2/Q7/Q11/Q13/Q16/Q18/Q22 analogues).

The driver corpus carries a simplified TPC-H schema (no partsupp, no
c_phone / s_comment), so each query keeps the *shape* — the join
topology, aggregation staging, and subquery pattern that stress the
optimizer — re-grounded on the available columns. Shapes covered:

- argmin-per-key decorrelation (Q2): the reference's LEFT JOIN LATERAL
  ... ORDER BY ... LIMIT 1 rewrite target (src/dao.ts:392-405).
- nation-pair conditional volume (Q7): two roles for one dimension.
- group share vs global scalar (Q11): scalar-subquery HAVING
  (src/dao.ts:1693-1698 first_event_id pattern).
- outer-join count distribution (Q13): two-level aggregation.
- anti-join + count-distinct (Q16).
- HAVING-driven semi-join (Q18).
- global-avg scalar subquery + anti-join (Q22: src/dao.ts:1455-1459
  NOT EXISTS pattern).

Scale notes are per query; the common rule: lineitem/orders never
shuffle for a dimension lookup (broadcast), and fact-fact joins reuse
the orderkey shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .registry import register

DEC = "decimal(18,4)"


@register(
    "min_cost_supplier",
    oracle="""
    WITH offer AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 // CAST(l_quantity AS BIGINT)) AS unit_cents
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, l_suppkey, unit_cents,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cents, l_suppkey) AS rn
      FROM offer
    )
    SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
           CAST(b.unit_cents AS DOUBLE) / 100 AS best_unit_price
    FROM best b
    JOIN part p ON b.l_partkey = p.p_partkey
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    WHERE b.rn = 1 AND p.p_size <= 10
    """,
    doc="TPC-H Q2 shape: cheapest supplier per part. The correlated "
    "min-subquery decorrelates into a per-(part,supplier) aggregate "
    "followed by an argmin window per part — one shuffle on partkey "
    "serves both the aggregate and the window (same key, Catalyst "
    "reuses the exchange). Unit price is computed in integer cents "
    "(floor-div) so the argmin is exact and tie-broken by suppkey on "
    "both engines. Part/supplier dims broadcast.",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supplier = load(spark, sf_dir, "supplier")
    # DuckDB `//` is floor division on BIGINT; Spark's long/long is
    # double division, so floor explicitly to match.
    unit_cents = F.floor(
        F.round(F.col("l_extendedprice") * 100).cast("long")
        / F.col("l_quantity").cast("long")
    ).cast("long")
    offer = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("unit_cents")
    )
    w = W.partitionBy("l_partkey").orderBy("unit_cents", "l_suppkey")
    best = offer.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            (F.col("unit_cents").cast("double") / 100).alias("best_unit_price"),
        )
    )


@register(
    "nation_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE ((sn.n_name = 'FRANCE' AND cn.n_name = 'GERMANY')
        OR (sn.n_name = 'GERMANY' AND cn.n_name = 'FRANCE'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY sn.n_name, cn.n_name, ship_year
    """,
    doc="TPC-H Q7 shape: the same nation dimension joined in two roles "
    "(supplier side and customer side) under a disjunctive cross-role "
    "predicate, grouped by year. Both nation branches broadcast "
    "independently; the only shuffle is lineitem-orders on orderkey. "
    "The disjunction cannot push below either join alone — it runs "
    "post-join inside codegen, the shape Catalyst's filter placement "
    "must handle (reference analogue: token0/token1 routing across "
    "mirrored sides, src/dao.ts:1620-1646).",
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31 23:59:59.999999")
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    pair = F.lit("FRANCE"), F.lit("GERMANY")
    cust_n = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("FRANCE", "GERMANY"))
    supp_n = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("FRANCE", "GERMANY"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_n), customer.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_n), supplier.s_nationkey == F.col("sn_key"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("volume")
        )
    )


@register(
    "part_value_share",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS value_cents
      FROM lineitem
      GROUP BY l_partkey
    ),
    total AS (SELECT SUM(value_cents) AS total_cents FROM pv)
    SELECT pv.l_partkey AS p_partkey,
           CAST(pv.value_cents AS DOUBLE) / 100 AS part_value,
           ROUND(CAST(pv.value_cents AS DOUBLE) / CAST(t.total_cents AS DOUBLE), 9)
             AS value_share
    FROM pv, total t
    WHERE pv.value_cents * 10000 > t.total_cents
    """,
    doc="TPC-H Q11 shape: per-group value vs a global scalar aggregate "
    "(keep parts holding > 0.01% of total traded value). The global "
    "total is a one-row aggregate cross-joined (broadcast) against the "
    "per-part aggregate — the reference's first_event_id scalar "
    "subquery pattern (src/dao.ts:1693-1698). The threshold compare "
    "runs in exact integer cents; only the reported share divides in "
    "double, rounded to 9 places on both engines.",
)
def part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pv = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(cents).alias("value_cents")
    )
    total = pv.agg(F.sum("value_cents").alias("total_cents"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select(
            "p_partkey",
            (F.col("value_cents").cast("double") / 100).alias("part_value"),
            F.round(
                F.col("value_cents").cast("double") / F.col("total_cents").cast("double"),
                9,
            ).alias("value_share"),
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT order_count, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY order_count
    """,
    doc="TPC-H Q13 shape: two-level aggregation over an outer join — "
    "orders per customer (COUNT of a nullable side counts 0 for "
    "customers with no orders), then the distribution of those counts. "
    "First aggregate shuffles on custkey; the second input is one row "
    "per customer, so AQE coalesces the distribution shuffle to a "
    "handful of partitions. At 100 TB the first stage is map-side "
    "combinable (count), keeping the shuffle narrow.",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy(customer.c_custkey)
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (5, 10, 15, 20)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    """,
    doc="TPC-H Q16 shape: count-distinct suppliers per part attribute, "
    "excluding a blacklist via anti-join (NOT IN over a non-null key "
    "is a left-anti join; reference NOT EXISTS at src/dao.ts:1455-59). "
    "The blacklist is tiny and broadcast, so the anti-join is "
    "map-side; the distinct aggregation expands to (brand,size,supp) "
    "then re-aggregates — Spark's two-phase distinct keeps the first "
    "phase partial/map-side.",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size").isin(5, 10, 15, 20))
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_s,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate_s, total_price
    """,
    doc="TPC-H Q18 shape: HAVING-qualified keys (orders whose total "
    "quantity exceeds a threshold) semi-joined back to the fact and "
    "re-aggregated with full detail. The qualifying-key set is small "
    "after the HAVING filter, so it broadcasts back onto lineitem — "
    "the second lineitem pass re-reads the scan rather than caching "
    "(at 100 TB a cache of lineitem does not fit; two scans of a "
    "pruned column set beat one materialization).",
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_key")),
                li.l_orderkey == F.col("big_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            F.col("o_totalprice").cast(DEC).cast("double").alias("total_price"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
    )


@register(
    "idle_rich_customers",
    oracle="""
    WITH bal AS (
      SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer c, bal
    WHERE CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) * bal.n > bal.s
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape: customers above the global average positive "
    "balance (scalar-aggregate subquery, broadcast as a one-row cross "
    "join) with no orders (anti-join on the orders key set), "
    "aggregated by segment. The threshold is the exact rational "
    "comparison cents*n > sum_cents — AVG's quotient differs between "
    "engines (DuckDB AVG(DECIMAL) is DOUBLE, Spark widens the "
    "decimal), so cross-multiplication in integer cents is the "
    "bit-for-bit-stable form. The anti-join side is orders projected "
    "to one column; the scalar broadcasts.",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        customer.crossJoin(F.broadcast(bal))
        .filter(cents * F.col("n") > F.col("s"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )
