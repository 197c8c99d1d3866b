"""Full-text and hybrid retrieval over the documents corpus.

The reference indexer exposes its data through SQL views rather than a
search endpoint, but a training-data engine needs retrieval — for
decontamination lookups, eval-set mining, and RAG-style candidate
generation. Two queries:

- ``bm25_topk``: Okapi BM25 lexical ranking as a pure DataFrame plan
  with an inverted-index shape;
- ``hybrid_rrf_retrieval``: reciprocal-rank fusion of the BM25 ranks
  with embedding-cosine ranks (the standard hybrid-search combiner,
  Cormack et al.'s RRF with k=60) — integer-exact, so the fusion is
  reproducible across engines and partitionings.

Scale shape (both): the exploded token stream is filtered to the query
vocabulary *inside the scan stage* (an `IN` literal list), so the only
fact-sized shuffle is the (doc_id, term) tf aggregate over matched
postings — at 100 TB the match stream is a tiny fraction of the
corpus, and everything downstream is posting-list-sized. The document-
frequency, query-term, and corpus-stats relations broadcast. The dense
branch of the hybrid broadcasts the three query vectors over the
embeddings scan (map-side dot products, then one per-query top-k
window) — same shape as ann_topk_cosine.

Determinism: per-term BM25 scores are rounded to integer micro-units
before the per-(query, doc) sum; RRF contributions are integer
floor-divisions of 1e9. All cross-engine float math (ln, the cosine)
follows the precedent of pipeline_quality/pipeline_similarity: same
IEEE double expression tree on both engines, rounded before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import tokens_expr
from .pipeline_similarity import _dot, _with_norm
from .registry import register

# DuckDB mirror of operators.dedup.tokens_expr (same as pipeline_cleaning)
_TOKS = (
    "list_filter(string_split_regex(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')"
)

TOP_K = 10
FUSE_N = 20  # per-source candidate depth feeding the fusion
RRF_K = 60

# Fixed benchmark queries (query_id, term). Terms come from the corpus
# vocabulary so every query has matches at every SF. The hybrid query
# additionally uses embeddings.vec_id == query_id as the dense anchor
# (vec_id indexes the embedded prefix of doc_id at every SF).
_QUERY_TERMS: list[tuple[int, str]] = [
    (1, "customer"),
    (1, "order"),
    (1, "join"),
    (2, "stream"),
    (2, "window"),
    (2, "batch"),
    (3, "vector"),
    (3, "hash"),
    (3, "scan"),
]

_QUERY_IDS = sorted({q for q, _ in _QUERY_TERMS})
_TERM_SET = sorted({t for _, t in _QUERY_TERMS})
_QT_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _QUERY_TERMS)
_IN_LIST = ", ".join(f"'{t}'" for t in _TERM_SET)

# Shared oracle fragment: CTE chain ending in `bm25_ranked`
# (query_id, doc_id, n_terms_matched, score_micro, rank). Both
# retrieval oracles build on this single definition.
_BM25_CTES = f"""
    qt(query_id, term) AS (VALUES {_QT_VALUES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
    stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    tok AS (
      SELECT doc_id, u.term AS term
      FROM toks, UNNEST(t) AS u(term)
      WHERE u.term IN ({_IN_LIST})
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT q.query_id, f.doc_id,
             -- float literals are written 0.5e0 etc. so DuckDB binds
             -- them as DOUBLE (bare 0.5 parses as DECIMAL and would
             -- diverge from Spark's IEEE double sequence)
             CAST(ROUND(
               LN((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0) + 1)
               * ((f.tf * 2.2e0)
                  / (f.tf + 1.2e0 * (0.25e0 + (0.75e0 * l.dl * s.n_docs) / s.total_dl)))
               * 1000000) AS BIGINT) AS score_micro
      FROM tf f
      JOIN dfq d USING (term)
      JOIN dl l USING (doc_id)
      JOIN qt q USING (term)
      CROSS JOIN stats s
    ),
    bm25_agg AS (
      SELECT query_id, doc_id,
             COUNT(*) AS n_terms_matched,
             CAST(SUM(score_micro) AS BIGINT) AS score_micro
      FROM scored GROUP BY query_id, doc_id
    ),
    bm25_ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY score_micro DESC, doc_id ASC) AS rank
      FROM bm25_agg
    )"""


def bm25_rank_postings(
    tf: DataFrame, dfq: DataFrame, qt: DataFrame, stats: DataFrame
) -> DataFrame:
    """(query_id, doc_id, n_terms_matched, score_micro, rank) from a
    (doc_id, term, tf, dl) posting relation, a (term, df) document-
    frequency relation, a (query_id, term) query map, and a one-row
    (n_docs, total_dl) stats relation. ONE definition of the Okapi
    scoring/ranking algebra — shared by the registered batch query and
    the maintained segment-log index (streaming/retrieval_index.py),
    so stream == batch holds by shared code. Expression structure
    mirrors the oracle token-for-token so both engines evaluate the
    same IEEE double sequence before the micro-unit rounding."""
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    norm = (F.col("tf") * 2.2) / (
        F.col("tf")
        + 1.2 * (0.25 + (0.75 * F.col("dl") * F.col("n_docs")) / F.col("total_dl"))
    )
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(idf * norm * 1000000).cast("long").alias("score_micro"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum("score_micro").cast("long").alias("score_micro"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return agg.withColumn("rank", F.row_number().over(w).cast("long"))


def bm25_topk_projection(ranked: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """Final top-k filter + micro-unit -> score projection over a
    ``bm25_rank_postings`` result — ONE definition shared by the batch
    query and the maintained index probe, so the output shape (and any
    future precision change) cannot diverge between them."""
    return (
        ranked.filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            "n_terms_matched",
            F.round(F.col("score_micro").cast("double") / 1000000, 6).alias(
                "score"
            ),
        )
    )


def _bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, n_terms_matched, score_micro, rank) —
    Spark twin of the ``bm25_ranked`` oracle CTE."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr(F.col("text")).alias("t")
    )
    dl = docs.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").cast("long").alias("total_dl")
    )
    tok = docs.select(
        "doc_id", F.size("t").cast("long").alias("dl"), F.explode("t").alias("term")
    ).filter(F.col("term").isin(_TERM_SET))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = spark.createDataFrame(_QUERY_TERMS, "query_id bigint, term string")
    return bm25_rank_postings(tf, dfq, qt, stats)


@register(
    "bm25_topk",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank, n_terms_matched,
           ROUND(CAST(score_micro AS DOUBLE) / 1000000, 6) AS score
    FROM bm25_ranked WHERE rank <= {TOP_K}
    """,
    doc="Okapi BM25 top-10 per query over an inverted-index-shaped "
    "plan: the query-vocabulary filter sits inside the scan stage, "
    "document frequency and the query-term map broadcast, corpus "
    "stats (N, total_dl) broadcast as one row. Per-term scores are "
    "fixed to integer micro-units before the per-(query, doc) sum so "
    "the aggregate is order-insensitive; the final top-k is one "
    "posting-sized window. The static plan scans the (doc_id, text)-"
    "pruned corpus three times (lengths/stats, postings, document "
    "frequency) — each pass is map-only, and every shuffle after the "
    "matched-postings tf aggregate is posting-list-sized; doc "
    "lengths ride the explode (max(dl) per group), not a corpus-"
    "sized join.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk_projection(_bm25_ranked(spark, sf_dir), TOP_K)


@register(
    "hybrid_rrf_retrieval",
    oracle=f"""
    WITH {_BM25_CTES},
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS en
      FROM embeddings
    ),
    dq AS (
      SELECT vec_id AS query_id, ev AS qv, en AS qn FROM v
      WHERE vec_id IN ({", ".join(map(str, _QUERY_IDS))})
    ),
    dsims AS (
      SELECT dq.query_id, v.vec_id AS doc_id,
             ROUND(list_dot_product(dq.qv, v.ev) / (dq.qn * v.en), 4) AS sim
      FROM dq, v WHERE dq.query_id <> v.vec_id
    ),
    dense_ranked AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, doc_id ASC) AS rank
      FROM dsims
    ),
    contributions AS (
      SELECT query_id, doc_id, 1000000000 // ({RRF_K} + rank) AS rrf_ppb
      FROM bm25_ranked WHERE rank <= {FUSE_N}
      UNION ALL
      SELECT query_id, doc_id, 1000000000 // ({RRF_K} + rank) AS rrf_ppb
      FROM dense_ranked WHERE rank <= {FUSE_N}
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(SUM(rrf_ppb) AS BIGINT) AS rrf_ppb,
             COUNT(*) AS n_sources
      FROM contributions GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank, rrf_ppb, n_sources
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_ppb DESC, doc_id ASC) AS rank
      FROM fused
    ) WHERE rank <= {TOP_K}
    """,
    doc="Hybrid retrieval: reciprocal-rank fusion (k=60) of BM25 "
    "lexical ranks with embedding-cosine ranks, top-20 candidates "
    "per source, fused top-10 per query. Contributions are integer "
    "floor-divisions 1e9 div (60+rank), so the fusion sum is exact "
    "and engine-identical — no float accumulation anywhere past the "
    "per-source ranking. Docs outside the embedded prefix (or "
    "missing a term match) simply lack that source's contribution, "
    "which is RRF's point. Plan: the lexical branch is bm25_topk's "
    "inverted-index shape; the dense branch broadcasts the 3 query "
    "vectors over the embeddings scan (map-side dot products + one "
    "top-k window); the fusion itself touches at most "
    "2*FUSE_N*|queries| rows — driver-trivial at any corpus size.",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= FUSE_N)
    emb = load(spark, sf_dir, "embeddings")
    dq = _with_norm(emb.filter(F.col("vec_id").isin(_QUERY_IDS)), "query_id", "qv", "qn")
    cand = _with_norm(emb, "doc_id", "cv", "cn")
    dsims = (
        cand.crossJoin(F.broadcast(dq))
        .filter(F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).alias(
                "sim"
            ),
        )
    )
    wd = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("doc_id").asc())
    dense = (
        dsims.withColumn("rank", F.row_number().over(wd).cast("long"))
        .filter(F.col("rank") <= FUSE_N)
    )
    rrf = F.expr(f"1000000000 div ({RRF_K} + rank)").alias("rrf_ppb")
    contributions = lex.select("query_id", "doc_id", rrf).unionByName(
        dense.select("query_id", "doc_id", rrf)
    )
    fused = contributions.groupBy("query_id", "doc_id").agg(
        F.sum("rrf_ppb").cast("long").alias("rrf_ppb"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    wf = W.partitionBy("query_id").orderBy(F.col("rrf_ppb").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "doc_id", "rank", "rrf_ppb", "n_sources")
    )


# Shared (doc_id, pos, term) 1-based positional relation — the Spark
# builder and the oracle CTE fragment used by postings_index and
# phrase_match (a tokenizer/position-base change happens in one place).
def _positions(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.posexplode(tokens_expr(F.col("text"))).alias("i0", "term"),
    ).select("doc_id", (F.col("i0") + 1).alias("pos"), "term")


def _px_ctes(where: str = "") -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tokens FROM documents
    ),
    px AS (
      SELECT doc_id, t.i AS pos, tokens[t.i] AS term
      FROM toks, UNNEST(range(1, len(tokens) + 1)) AS t(i)
      {where}
    )"""


@register(
    "postings_index",
    oracle=f"""
    {_px_ctes()}
    SELECT term, doc_id,
           CAST(COUNT(*) AS BIGINT) AS tf,
           string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions_csv
    FROM px
    GROUP BY 1, 2
    """,
    doc="Positional inverted-index construction — the foundational "
    "retrieval artifact (feeds BM25 scoring, phrase queries, and "
    "proximity ranking): one posexplode of the shared tokenizer, then "
    "a single (term, doc_id)-keyed map-side-combined agg emitting "
    "term frequency and the sorted position list (joined to a CSV "
    "string so the value hash is order-stable — collect_list alone "
    "is partition-order nondeterministic, sort_array pins it). At "
    "scale this is the canonical build: one shuffle keyed on "
    "(term, doc_id) whose skew is bounded by per-doc term counts, "
    "ready to be written bucketed by term for co-located query-time "
    "joins.",
)
def postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = _positions(load(spark, sf_dir, "documents"))
    return px.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("pos")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("positions_csv"),
    )


# Fixed benchmark phrases (phrase_id, first term, second term) from the
# corpus template vocabulary so matches exist at every SF; the last one
# is deliberately rare to exercise the empty/sparse-match path.
_PHRASES: list[tuple[int, str, str]] = [
    (1, "order", "fast"),
    (2, "window", "join"),
    (3, "stream", "column"),
    (4, "data", "slow"),
    (5, "slow", "window"),
]
_PHRASE_VALUES = ", ".join(f"({i}, '{a}', '{b}')" for i, a, b in _PHRASES)
_PHRASE_TERMS = sorted({t for _, a, b in _PHRASES for t in (a, b)})
_PHRASE_IN = ", ".join(f"'{t}'" for t in _PHRASE_TERMS)


@register(
    "phrase_match",
    oracle=f"""
    {_px_ctes(f"WHERE tokens[t.i] IN ({_PHRASE_IN})")},
    ph(phrase_id, t1, t2) AS (VALUES {_PHRASE_VALUES})
    SELECT ph.phrase_id, a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(a.pos) AS BIGINT) AS first_pos
    FROM ph
    JOIN px a ON a.term = ph.t1
    JOIN px b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
             AND b.term = ph.t2
    GROUP BY 1, 2
    """,
    doc="Exact phrase search over the positional index: a phrase "
    '"t1 t2" matches where t1\'s postings and t2\'s postings intersect '
    "at adjacent positions — the positional-join evaluation every "
    "phrase/proximity query engine runs on a postings_index artifact. "
    "The term-set filter is pushed into the scan (only postings of "
    "the phrases' vocabulary are materialized, the same inverted-"
    "index discipline as bm25_topk), the phrase table is a broadcast "
    "VALUES relation, and the positional self-join shuffles on "
    "(doc_id, pos) — bounded by the filtered postings, not the "
    "corpus.",
)
def phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = _positions(load(spark, sf_dir, "documents")).filter(
        F.col("term").isin(_PHRASE_TERMS)
    )
    ph = spark.createDataFrame(_PHRASES, "phrase_id long, t1 string, t2 string")
    return phrase_match_from_positions(px, ph)


# Fixed benchmark proximity pairs (pair_id, t1, t2, window) over the
# corpus template vocabulary; windows vary so the theta bound is
# actually exercised, and the last pair is rare (sparse-match path).
_PROX_PAIRS: list[tuple[int, str, str, int]] = [
    (1, "order", "fast", 3),
    (2, "window", "join", 5),
    (3, "stream", "column", 4),
    (4, "customer", "hash", 6),
    (5, "data", "slow", 2),
]
_PROX_VALUES = ", ".join(f"({i}, '{a}', '{b}', {w})" for i, a, b, w in _PROX_PAIRS)
_PROX_TERMS = sorted({t for _, a, b, _w in _PROX_PAIRS for t in (a, b)})
_PROX_IN = ", ".join(f"'{t}'" for t in _PROX_TERMS)

# ONE oracle definition for the proximity evaluation — shared verbatim
# by the batch query and the maintained-index probe (the phrase_match
# convention), so the driver hash on the maintained variant IS the
# index==batch equality contract.
_PROX_ORACLE = f"""
    {_px_ctes(f"WHERE tokens[t.i] IN ({_PROX_IN})")},
    pq(pair_id, t1, t2, w) AS (VALUES {_PROX_VALUES})
    SELECT pq.pair_id, a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(ABS(b.pos - a.pos)) AS BIGINT) AS min_dist
    FROM pq
    JOIN px a ON a.term = pq.t1
    JOIN px b ON b.doc_id = a.doc_id AND b.term = pq.t2
             AND b.pos <> a.pos
             AND ABS(b.pos - a.pos) <= pq.w
    GROUP BY 1, 2
    """


@register(
    "proximity_match",
    oracle=_PROX_ORACLE,
    doc="Unordered proximity search over the positional index: a pair "
    '(t1, t2, w) matches where an occurrence of t1 and an occurrence '
    "of t2 sit within w tokens of each other — the windowed "
    "co-occurrence evaluation behind proximity ranking and NEAR/w "
    "query operators, emitting the pair count and the closest "
    "distance per document. Same plan discipline as phrase_match: "
    "the pairs' vocabulary filter is pushed into the scan, the pair "
    "table is a broadcast VALUES relation, the positional self-join "
    "is an equi-join on (doc_id, term) with the window bound as a "
    "post-join theta filter — shuffles are bounded by the filtered "
    "postings, not the corpus.",
)
def proximity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = _positions(load(spark, sf_dir, "documents")).filter(
        F.col("term").isin(_PROX_TERMS)
    )
    pq = spark.createDataFrame(
        _PROX_PAIRS, "pair_id long, t1 string, t2 string, w int"
    )
    return proximity_match_from_positions(px, pq)


def proximity_match_from_positions(px: DataFrame, pq: DataFrame) -> DataFrame:
    """Windowed co-occurrence evaluation over any (doc_id, pos, term)
    relation and a (pair_id, t1, t2, w) pair table — ONE definition
    shared by the registered batch query above and the maintained
    segment-log index probe (streaming/retrieval_index.
    proximity_match_from_index). ``px`` should already be pruned to
    the pairs' vocabulary (scan-stage filter for the batch query,
    term_bucket partition pruning for the index).

    A t1 == t2 pair (repeated-term proximity) is well-defined: the
    pos_a != pos_b guard keeps an occurrence from pairing with itself
    (code-review r12: without it every single-occurrence doc matched
    with min_dist 0). The guard is vacuous for t1 != t2 — one
    (doc_id, pos) holds exactly one term — so it costs nothing on the
    common path; same-term occurrence pairs count once per ORDERED
    (a, b) role assignment, mirroring the two-role join shape."""
    dist = F.abs(F.col("pos_b") - F.col("pos_a"))
    a = px.select("doc_id", F.col("pos").alias("pos_a"), F.col("term").alias("t1"))
    b = px.select("doc_id", F.col("pos").alias("pos_b"), F.col("term").alias("t2"))
    return (
        a.join(F.broadcast(pq), "t1")
        .join(b, ["doc_id", "t2"])
        .filter((F.col("pos_b") != F.col("pos_a")) & (dist <= F.col("w")))
        .groupBy("pair_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min(dist).cast("bigint").alias("min_dist"),
        )
    )


def phrase_match_from_positions(px: DataFrame, ph: DataFrame) -> DataFrame:
    """The positional-join phrase evaluation over any (doc_id, pos,
    term) relation and a (phrase_id, t1, t2) phrase table — ONE
    definition shared by the registered batch query above and the
    maintained segment-log index probe (streaming/retrieval_index.
    phrase_match_from_index), so stream == batch holds by shared
    code. ``px`` should already be pruned to the phrases' vocabulary
    (the caller owns where that filter lands — scan stage for the
    batch query, term_bucket partition pruning for the index)."""
    a = px.select("doc_id", F.col("pos").alias("pos_a"), F.col("term").alias("t1"))
    b = px.select(
        "doc_id", F.col("pos").alias("pos_b"), F.col("term").alias("t2")
    )
    return (
        a.join(F.broadcast(ph), "t1")
        .join(b, ["doc_id", "t2"])
        .filter(F.col("pos_b") == F.col("pos_a") + 1)
        .groupBy("phrase_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("pos_a").cast("bigint").alias("first_pos"),
        )
    )
