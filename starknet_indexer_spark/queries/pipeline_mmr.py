"""Maximal Marginal Relevance (MMR) diverse top-k: greedy re-ranking
of an exact-cosine shortlist so the selected set trades relevance
against redundancy.

MMR (Carbonell & Goldstein 1998) is the standard diversity-aware
selection used on top of retrieval: after ANN produces a relevance
shortlist, pick k items greedily by ``lambda*rel - (1-lambda)*
max_sim_to_already_selected``. It is the retrieval-side twin of
SemDeDup's "don't keep near-copies" rule and the last missing member
of the retrieval family (bm25_topk = lexical, ann_* = dense,
hybrid_rrf_retrieval = fusion, this = diversification).

Exactness: similarities are quantized ONCE to 1e-4 units
(``ROUND(cos*10000, 0)`` -> BIGINT, the same rounded-double parity
every ann_* query already relies on), and the MMR score is then pure
integer arithmetic — ``7*rel4 - 3*maxsim4`` (lambda = 0.7 in tenths)
— with ties broken on neighbor_id, so the greedy trajectory is
totally ordered and both engines walk it identically.

Scale shape: the ONLY corpus-sized stage is the shortlist build —
the same broadcast-queries map-side cosine scan + per-query top-N
window as ann_topk_cosine (at real scale you'd feed the IVF-PQ
shortlist instead; the MMR stage is identical). Everything after
operates on queries x N shortlist rows (200 here): the pairwise
similarity relation is shortlist x shortlist WITHIN a query, and
each greedy round is a broadcast-sized join + argmax. Rounds touch
no corpus data at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register
from .pipeline_similarity import N_QUERIES, _dot

MMR_SHORT_N = 20  # relevance shortlist depth per query
MMR_K = 5  # selected set size
MMR_LAMBDA_TENTHS = 7  # lambda = 0.7: score = 7*rel4 - 3*maxsim4


def _oracle() -> str:
    lam, com = MMR_LAMBDA_TENTHS, 10 - MMR_LAMBDA_TENTHS
    rounds = []
    for r in range(2, MMR_K + 1):
        rounds.append(
            f"""
    m{r} AS (
      SELECT s.query_id, s.neighbor_id, s.rel4, MAX(p.sim4) AS ms
      FROM short s
      JOIN sel{r - 1} t ON t.query_id = s.query_id
      JOIN ps p ON p.query_id = s.query_id
              AND p.a_id = s.neighbor_id AND p.b_id = t.neighbor_id
      LEFT JOIN sel{r - 1} e ON e.query_id = s.query_id
                            AND e.neighbor_id = s.neighbor_id
      WHERE e.neighbor_id IS NULL
      GROUP BY 1, 2, 3
    ),
    pick{r} AS (
      SELECT query_id, neighbor_id, rel4, {lam} * rel4 - {com} * ms AS score
      FROM (
        SELECT query_id, neighbor_id, rel4, ms,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY {lam} * rel4 - {com} * ms DESC, neighbor_id
               ) AS rn
        FROM m{r}
      ) WHERE rn = 1
    ),
    sel{r} AS (
      SELECT query_id, neighbor_id FROM sel{r - 1}
      UNION ALL
      SELECT query_id, neighbor_id FROM pick{r}
    )"""
        )
    selects = " UNION ALL ".join(
        [
            f"SELECT query_id, neighbor_id, 1 AS mmr_rank, rel4, score FROM pick1"
        ]
        + [
            f"SELECT query_id, neighbor_id, {r} AS mmr_rank, rel4, score"
            f" FROM pick{r}"
            for r in range(2, MMR_K + 1)
        ]
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
      FROM embeddings
    ),
    short AS (
      SELECT query_id, cand_id AS neighbor_id, cv, cn, rel4 FROM (
        SELECT q.query_id, c.cand_id, c.cv, c.cn,
               CAST(FLOOR(list_dot_product(q.qv, c.cv) / (q.qn * c.cn)
                          * 10000 + 0.5) AS BIGINT) AS rel4,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY CAST(FLOOR(list_dot_product(q.qv, c.cv)
                               / (q.qn * c.cn) * 10000 + 0.5) AS BIGINT) DESC,
                          c.cand_id
               ) AS rn
        FROM q, c WHERE q.query_id <> c.cand_id
      ) WHERE rn <= {MMR_SHORT_N}
    ),
    ps AS (
      SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
             CAST(ROUND(list_dot_product(a.cv, b.cv) / (a.cn * b.cn)
                        * 10000, 0) AS BIGINT) AS sim4
      FROM short a JOIN short b
        ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
    ),
    pick1 AS (
      SELECT query_id, neighbor_id, rel4, {lam} * rel4 AS score
      FROM (
        SELECT query_id, neighbor_id, rel4,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rel4 DESC, neighbor_id) AS rn
        FROM short
      ) WHERE rn = 1
    ),
    sel1 AS (SELECT query_id, neighbor_id FROM pick1),
    {",".join(rounds)}
    SELECT query_id, neighbor_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
           rel4, CAST(score AS BIGINT) AS score
    FROM ({selects})
    """


@register(
    "mmr_diverse_topk",
    oracle=_oracle(),
    doc=f"Maximal-marginal-relevance diverse top-{MMR_K}: greedy "
    "selection over a per-query exact-cosine shortlist of "
    f"{MMR_SHORT_N}, score = {MMR_LAMBDA_TENTHS}*rel4 - "
    f"{10 - MMR_LAMBDA_TENTHS}*max_sim4_to_selected with similarities "
    "quantized once to 1e-4-unit BIGINTs, so the greedy trajectory is "
    "integer-exact with neighbor_id tie-breaks and both engines pick "
    "identical sets. The corpus-sized work is exactly the "
    "ann_topk_cosine shortlist scan (broadcast queries, map-side "
    "cosine, per-query top-N window — swap in the IVF-PQ shortlist at "
    "real scale); the pairwise-similarity relation and every greedy "
    "round live on queries x shortlist rows only.",
)
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import gemm_topk_neighbors

    lam, com = MMR_LAMBDA_TENTHS, 10 - MMR_LAMBDA_TENTHS
    emb = load(spark, sf_dir, "embeddings")
    # Shortlist scan on the blocked-GEMM kernel (the last exact-cosine
    # Catalyst fold in the headline set — VERDICT r9 mandate #2): the
    # kernel's sim_i4 IS rel4 (FLOOR(x*1e4+0.5), mirrored in the
    # oracle's short CTE), and its (sim DESC, id ASC) top-N equals the
    # former window. Candidate vectors for the pairwise stage come
    # from one broadcast hash-join of the tiny shortlist against the
    # corpus — no dot products in that scan.
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    cands = gemm_topk_neighbors(emb, probes, MMR_SHORT_N).withColumnRenamed(
        "sim_i4", "rel4"
    )
    short = (
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .join(F.broadcast(cands), "neighbor_id")
        # norms AFTER the join: computed on queries x N shortlist rows,
        # not once per corpus row
        .select(
            "query_id",
            "neighbor_id",
            F.col("embedding").alias("cv"),
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("cn"),
            "rel4",
        )
        .localCheckpoint(eager=False)  # feeds ps + the greedy cogroup
    )
    # distinct aliases per consumer: slim and ps share short's lineage
    # and cogrouping un-aliased copies trips the ambiguous-self-join
    # analyzer check (same pattern as blocked_cosine_pairs)
    sa, sb, sc = short.alias("mmr_a"), short.alias("mmr_b"), short.alias("mmr_s")
    pa = sa.select(
        F.col("mmr_a.query_id").alias("query_id"),
        F.col("mmr_a.neighbor_id").alias("a_id"),
        F.col("mmr_a.cv").alias("cv"),
        F.col("mmr_a.cn").alias("cn"),
    )
    pb = sb.select(
        F.col("mmr_b.query_id").alias("query_id"),
        F.col("mmr_b.neighbor_id").alias("b_id"),
        F.col("mmr_b.cv").alias("bv"),
        F.col("mmr_b.cn").alias("bn"),
    )
    ps = (
        pa.join(pb, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "query_id",
            "a_id",
            "b_id",
            F.round(
                _dot(F.col("cv"), F.col("bv")) / (F.col("cn") * F.col("bn")) * 10000,
                0,
            )
            .cast("bigint")
            .alias("sim4"),
        )
    )
    slim = sc.select(
        F.col("mmr_s.query_id").alias("query_id"),
        F.col("mmr_s.neighbor_id").alias("neighbor_id"),
        F.col("mmr_s.rel4").alias("rel4"),
    )

    # Greedy selection (optimization r12): the former per-round plan —
    # MMR_K-1 rounds of anti-join + join + groupBy + argmax window,
    # each a localCheckpoint barrier, ~20 tiny stages — is replaced by
    # ONE cogroup over (shortlist, pairwise-sim) per query. Every
    # input the greedy touches (rel4, sim4) is already an integer
    # quantized by the SAME Spark expressions as before, so the kernel
    # is pure int64 arithmetic with the same (score DESC, neighbor_id
    # ASC) tie-break — the trajectory is identical by construction,
    # and no float crosses the Python boundary. Group sizes are
    # queries x MMR_SHORT_N (and its square for sims) — probe-batch-
    # bounded, never corpus-sized (guide §2.4/§4.2).
    def greedy(l: "pd.DataFrame", r: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        cols = ["query_id", "neighbor_id", "mmr_rank", "rel4", "score"]
        if l.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        qid = int(l["query_id"].iat[0])
        cand = {
            int(n): int(v) for n, v in zip(l["neighbor_id"], l["rel4"])
        }
        sim = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(r["a_id"], r["b_id"], r["sim4"])
        }
        # round 1: pure relevance, ties on neighbor_id
        first = min(cand, key=lambda n: (-cand[n], n))
        out = [(qid, first, 1, cand[first], lam * cand[first])]
        sel = [first]
        for rank in range(2, MMR_K + 1):
            best = None
            for n, rel in cand.items():
                if n in sel:
                    continue
                pairs = [sim[(n, s)] for s in sel if (n, s) in sim]
                if not pairs:  # no sim edge (degenerate tiny shortlist)
                    continue
                score = lam * rel - com * max(pairs)
                key = (-score, n)
                if best is None or key < best[0]:
                    best = (key, n, rel, score)
            if best is None:
                break
            _, n, rel, score = best
            out.append((qid, n, rank, rel, score))
            sel.append(n)
        return pd.DataFrame(out, columns=cols)

    picked = (
        slim.groupBy("query_id")
        .cogroup(ps.groupBy("query_id"))
        .applyInPandas(
            greedy,
            schema="query_id BIGINT, neighbor_id BIGINT, mmr_rank BIGINT, "
            "rel4 BIGINT, score BIGINT",
        )
    )
    return picked.select(
        "query_id", "neighbor_id", "mmr_rank", "rel4", "score"
    )
