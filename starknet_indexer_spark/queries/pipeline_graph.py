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
    # node keys stay BIGINT through every edge-sized join/aggregate
    # (customer 2k, supplier 2k+1) — the 1M+-row edge relation hashes
    # integers, not strings; the reference 'c…'/'s…' labels are
    # re-derived once on the final NODE-sized projection
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("bigint").alias("u"),
            (F.col("l_suppkey") * 2 + 1).cast("bigint").alias("v"),
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
        # the rank relation is NODE-sized (orders of magnitude under
        # the edge list) — broadcast it into the edge join so each
        # round's only shuffle is the map-side-combined per-destination
        # sum. The rank rebuild joins deg back ONTO the contribution
        # (r13): deg is the same checkpointed relation every round, so
        # its broadcast build is planned once and reused, where the
        # former deg ⋈ broadcast(contrib) built a fresh broadcast of
        # each round's aggregation output (one extra build job per
        # round). Inner join either way round: the graph is
        # bidirectional, so every deg node receives a contribution and
        # the row sets are identical. At web-graph scale where nodes
        # outgrow broadcast, pre-bucket edges and ranks on the node
        # key instead (module docstring) — the round structure is
        # unchanged.
        contrib = (
            edges.join(F.broadcast(ranks), ranks.node == edges.u)
            .select(F.col("v").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            contrib.join(F.broadcast(deg), "node")
            .crossJoin(F.broadcast(base))
            .select(
                "node",
                "deg",
                F.expr("CAST((15 * b + 85 * s) div 100 AS BIGINT)").alias("rank"),
            )
        )
    label = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("c"), F.expr("node div 2"))
    ).otherwise(F.concat(F.lit("s"), F.expr("(node - 1) div 2")))
    return ranks.select(label.alias("node"), "rank")


#: kNN graph parameters: nodes are the first TRI_NODES vectors, each
#: contributing directed edges to its TRI_K nearest neighbors (within
#: the node set) by rounded cosine; symmetrized + deduped before
#: counting
TRI_NODES = 500
TRI_K = 3


def _knn_edges_sql() -> str:
    return f"""
      v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                 AS en
        FROM embeddings WHERE vec_id < {TRI_NODES}
      ),
      sims AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               CAST(FLOOR(list_dot_product(a.ev, b.ev) / (a.en * b.en)
                          * 10000 + 0.5) AS BIGINT) AS sim_i4
        FROM v a, v b WHERE a.vec_id <> b.vec_id
      ),
      knn AS (
        SELECT src, dst FROM (
          SELECT src, dst,
                 ROW_NUMBER() OVER (PARTITION BY src
                                    ORDER BY sim_i4 DESC, dst) AS rnk
          FROM sims
        ) WHERE rnk <= {TRI_K}
      ),
      edges AS (
        SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM knn
      )
    """


@register(
    "knn_graph_triangles",
    oracle=f"""
    WITH {_knn_edges_sql()},
    tris AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pernode AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
      ) GROUP BY node
    )
    SELECT p.node, p.n_triangles, CAST(d.degree AS BIGINT) AS degree
    FROM pernode p
    JOIN (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    ) d USING (node)
    """,
    doc="Triangle counting on the symmetrized kNN similarity graph "
    "(the clustering-coefficient / community-density signal used to "
    "audit embedding-space structure before semantic dedup): each "
    "node's nearest-neighbor edges are symmetrized into a canonical "
    "u<v edge list, and triangles are counted by the ORIENTED "
    "two-join (e1.v=e2.u closing wedge checked against e3) — every "
    "triangle a<b<c is generated exactly once, so no /6 correction "
    "and no per-key cross product: per-edge work is bounded by the "
    "oriented out-degree (<= kNN fan-in), the standard arboricity "
    "bound that keeps distributed triangle counting linear-ish at "
    "scale. Brute-force kNN derivation is the baseline; the IVF/LSH "
    "candidate stages are the documented scale path.",
)
def knn_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import gemm_topk_neighbors

    # kNN derivation on the blocked-GEMM kernel (the same reroute as
    # ann_topk_cosine — replaces a TRI_NODES^2 Catalyst dot-product
    # fold with one numpy GEMM per tile); sims quantize to integer
    # ten-thousandths before ranking on both engines
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TRI_NODES)
    knn = gemm_topk_neighbors(emb, emb, TRI_K).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    edges = (
        knn.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumed 4x (3 joins + degree)
    )
    e1 = edges
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tris = (
        e1.join(e2, F.col("v") == F.col("b2"))
        .join(e3, (F.col("a3") == F.col("u")) & (F.col("c3") == F.col("c2")))
        .select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("c2").alias("c"))
    )
    pernode = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return pernode.join(deg, "node").select("node", "n_triangles", "degree")
