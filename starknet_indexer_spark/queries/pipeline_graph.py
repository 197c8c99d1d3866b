"""Iterative graph analytics: integer-exact PageRank.

Connected components (`dedup_components`) proved the min-label
iteration; PageRank is the other canonical iterative graph kernel —
value flows along edges and re-normalizes each round, the shape behind
influence scoring, spam-site demotion in crawl curation, and
importance-weighted sampling of a citation/link graph when selecting
pretraining data.

Exactness: like the k-means family, the iteration runs in scaled
BIGINT arithmetic — ranks carry a 10^12 scale, per-edge contributions
are integral divisions (``rank div degree``; all values non-negative,
so DuckDB's truncate-toward-zero ``//`` and Spark's ``div`` agree),
and the damping mix is ``(15*base + 85*sum) div 100``. Integer sums
are order-independent, so three unrolled rounds are bit-equal across
engines and partitionings — an ITERATIVE float-ish algorithm with a
full value-hash oracle.

Graph: the customer <-> supplier trade graph (an edge per distinct
(customer, supplier) pair appearing in an order's lineitems), made
bidirectional so the walk has no dangling sinks. Scale shape per
round: one join of the rank relation to the edge list (shuffle on the
node key — pre-bucketing both on node id makes it map-side) + one
map-side-combined sum per destination; the rank relation is
node-sized, never edge-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

PR_SCALE = 10**12
PR_ROUNDS = 3


def _edges_sql() -> str:
    return """
      SELECT DISTINCT 'c' || o_custkey AS u, 's' || l_suppkey AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """


@register(
    "graph_pagerank",
    oracle=f"""
    WITH pairs AS ({_edges_sql()}),
    edges AS (
      SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
    ),
    deg AS (SELECT u AS node, COUNT(*) AS deg FROM edges GROUP BY u),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    base AS (SELECT CAST({PR_SCALE} // n AS BIGINT) AS b FROM nn),
    r0 AS (SELECT node, deg, (SELECT b FROM base) AS rank FROM deg),
    {",".join(
        f'''
    c{i} AS (
      SELECT e.v AS node, SUM(r.rank // r.deg) AS s
      FROM r{i - 1} r JOIN edges e ON e.u = r.node
      GROUP BY e.v
    ),
    r{i} AS (
      SELECT d.node, d.deg,
             CAST((15 * (SELECT b FROM base) + 85 * c.s) // 100 AS BIGINT) AS rank
      FROM deg d JOIN c{i} c ON c.node = d.node
    )'''
        for i in range(1, PR_ROUNDS + 1)
    )}
    SELECT node, CAST(rank AS BIGINT) AS rank FROM r{PR_ROUNDS}
    """,
    doc=f"Integer-exact PageRank ({PR_ROUNDS} rounds, damping 0.85, "
    f"scale 10^12) over the bidirectional customer<->supplier trade "
    "graph: per round, one node-keyed join of the node-sized rank "
    "relation to the edge list + one map-side-combined sum per "
    "destination. All arithmetic is non-negative BIGINT with integral "
    "division, so the iteration is bit-equal across engines and "
    "partitionings — the iterative-graph-analytics twin of the "
    "connected-components query, with a fully unrolled DuckDB CTE "
    "oracle.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("u"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("v"),
        )
        .distinct()
    )
    # edges feeds deg + one join per round, deg feeds every round's
    # rank rebuild — without materialization each consumer recomputes
    # the scan->join->distinct chain (~4x each). Lazy local checkpoint
    # = one materialization, no eager extra job.
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    deg = (
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n"))
    base = n_nodes.select(
        F.expr(f"CAST({PR_SCALE} div n AS BIGINT)").alias("b")
    )

    ranks = deg.crossJoin(F.broadcast(base)).select(
        "node", "deg", F.col("b").alias("rank")
    )
    for _ in range(PR_ROUNDS):
        contrib = (
            ranks.join(edges, ranks.node == edges.u)
            .select(F.col("v").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            deg.join(contrib, "node")
            .crossJoin(F.broadcast(base))
            .select(
                "node",
                "deg",
                F.expr("CAST((15 * b + 85 * s) div 100 AS BIGINT)").alias("rank"),
            )
        )
    return ranks.select("node", "rank")
