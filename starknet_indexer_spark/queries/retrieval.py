"""Full-text retrieval over the documents corpus: BM25 ranking.

The reference indexer exposes its data through SQL views rather than a
search endpoint, but a training-data engine needs lexical retrieval —
for decontamination lookups, eval-set mining, and hybrid (BM25 +
embedding) candidate generation. This module implements Okapi BM25 as
a pure DataFrame plan:

- inverted-index shape: the exploded token stream is filtered to the
  query vocabulary *inside the scan stage* (an `IN` literal list), so
  the only fact-sized shuffle is the (doc_id, term) tf aggregate over
  matched postings — at 100 TB the match stream is a tiny fraction of
  the corpus, and everything downstream is posting-list-sized;
- the document-frequency and query-term relations broadcast (vocab-
  sized); corpus stats (N, total token count) broadcast as one row;
- per-term partial scores are rounded to integer micro-units before
  the per-(query, doc) sum, so the aggregate is order-insensitive and
  engine-exact (registry.py determinism policy); `ln` is evaluated on
  identical doubles on both engines (same precedent as the log2-based
  perplexity proxies in pipeline_quality.py).

BM25 parameters are the textbook defaults k1=1.2, b=0.75; idf is the
Robertson–Sparck-Jones form ln((N - df + 0.5)/(df + 0.5) + 1) (the
Lucene variant, always positive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import tokens_expr
from .registry import register

# DuckDB mirror of operators.dedup.tokens_expr (same as pipeline_cleaning)
_TOKS = (
    "list_filter(string_split_regex(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')"
)

TOP_K = 10

# Fixed benchmark queries (query_id, term). Terms come from the corpus
# vocabulary so every query has matches at every SF.
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

_TERM_SET = sorted({t for _, t in _QUERY_TERMS})
_QT_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _QUERY_TERMS)
_IN_LIST = ", ".join(f"'{t}'" for t in _TERM_SET)


@register(
    "bm25_topk",
    oracle=f"""
    WITH qt(query_id, term) AS (VALUES {_QT_VALUES}),
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
             CAST(ROUND(
               -- float literals are written 0.5e0 etc. so DuckDB binds
               -- them as DOUBLE (bare 0.5 parses as DECIMAL and would
               -- diverge from Spark's IEEE double sequence)
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
    agg AS (
      SELECT query_id, doc_id,
             COUNT(*) AS n_terms_matched,
             CAST(SUM(score_micro) AS BIGINT) AS score_micro
      FROM scored GROUP BY query_id, doc_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY score_micro DESC, doc_id ASC) AS rank
      FROM agg
    )
    SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank, n_terms_matched,
           ROUND(CAST(score_micro AS DOUBLE) / 1000000, 6) AS score
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="Okapi BM25 top-10 per query over an inverted-index-shaped "
    "plan: the token stream is filtered to the 9-term query "
    "vocabulary before any shuffle, document frequency and the "
    "query-term map broadcast, corpus stats (N, total_dl) broadcast "
    "as one row. Per-term scores are fixed to integer micro-units "
    "before the per-(query, doc) sum so the aggregate is order- "
    "insensitive; the final top-k is one posting-sized window. The "
    "static plan scans the (doc_id, text)-pruned corpus three times "
    "(lengths/stats, postings, document frequency) — each pass is "
    "map-only, and every shuffle after the matched-postings tf "
    "aggregate is posting-list-sized; doc lengths ride the explode "
    "(max(dl) per group), not a corpus-sized join.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # Expression structure mirrors the oracle token-for-token so both
    # engines evaluate the same IEEE double sequence before rounding.
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
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "doc_id",
            "rank",
            "n_terms_matched",
            F.round(F.col("score_micro").cast("double") / 1000000, 6).alias("score"),
        )
    )
