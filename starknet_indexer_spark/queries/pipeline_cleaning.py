"""Corpus-cleaning operators: segment-level dedup, PII redaction,
overlapping chunking, tf-idf term ranking.

These are the C4/RefinedWeb-style cleaning passes a training-data
pipeline runs between raw crawl and tokenization:

- **Segment-level dedup** (C4's "line dedup"): drop every repeated
  line across the whole corpus, keeping only the first occurrence.
  The driver corpus stores single-line documents, so the segmenter
  here is "consecutive 8-token windows"; on real data the segmenter
  expression is ``split(text, '\\n')`` and nothing else changes.
- **PII redaction**: regexp scrub of emails / phone numbers with
  per-document match counts. The corpus contains no PII, so the
  query deterministically plants synthetic PII (a pure function of
  doc_id) and then redacts it — the planted rows prove the scrub
  and the untouched rows prove no false positives.
- **Overlapping chunking**: RAG/window chunking of each document
  into fixed-size token chunks with a fixed stride.
- **tf-idf top terms**: per-document top-k salient terms. Ranking is
  (tf DESC, df ASC, term ASC) — the tf-idf ordering expressed in
  pure integers so both engines agree bit-for-bit (ln() ulp noise
  between JVM and DuckDB would make a float score hash-unstable).

Scale notes are per query below; none of these needs more than two
hash shuffles, and nothing ever materializes a pairwise product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import tokens_expr
from .registry import register

SEG_TOKENS = 8  # segment width for the line-dedup analogue
CHUNK_SIZE = 16  # RAG chunk width (tokens)
CHUNK_STRIDE = 12  # chunk start-to-start distance (4-token overlap)
TOP_TERMS = 3

# DuckDB mirror of operators.dedup.tokens_expr
_TOKS = (
    "list_filter(string_split_regex(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')"
)


@register(
    "segment_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    segs AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(t[i*{SEG_TOKENS}+1 : (i+1)*{SEG_TOKENS}], ' ') AS seg
      FROM toks, UNNEST(range(CAST(ceil(len(t) / {SEG_TOKENS}.0) AS BIGINT))) AS u(i)
    ),
    ranked AS (
      SELECT doc_id, pos, seg,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
      FROM segs
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(seg, ' ' ORDER BY pos)
                        FILTER (WHERE rn = 1), '')) AS clean_md5
    FROM ranked
    GROUP BY doc_id
    """,
    doc="C4-style corpus-wide segment dedup: first occurrence (by "
    "doc_id, position) of each segment wins, later repeats are "
    "dropped, and surviving segments are reassembled in document "
    "order. Two shuffles: one window partitioned by segment text "
    "(at 100 TB, segments are near-unique so partitions balance; "
    "boilerplate mega-segments are exactly what AQE skew-split "
    "handles), one groupBy doc_id for reassembly. The reassembled "
    "text leaves the query as an md5 so the shuffled payload, not "
    "just the compared value, stays bounded.",
)
def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # filter empty docs BEFORE sequence(): Spark's sequence(0, -1)
    # yields [0, -1] (inferred negative step), not an empty array
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens_expr(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    n_seg = F.ceil(F.size("t") / F.lit(float(SEG_TOKENS))).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.array_join(
                    F.slice(F.col("t"), i * SEG_TOKENS + 1, SEG_TOKENS), " "
                ),
            )
        ).alias("pos", "seg"),
    ).withColumn("pos", F.col("pos").cast("bigint"))
    ranked = segs.withColumn(
        "rn", F.row_number().over(W.partitionBy("seg").orderBy("doc_id", "pos"))
    )
    kept_struct = F.when(F.col("rn") == 1, F.struct("pos", "seg"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["seg"]
                ),
                " ",
            )
        ).alias("clean_md5"),
    )


# Synthetic planted PII — pure functions of doc_id so Spark and DuckDB
# derive identical inputs. ~1/3 of docs get an email, ~1/5 a phone.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"


def _planted_sql() -> str:
    return (
        "text || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id"
        " || '@example.com for details' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' or call 555-'"
        " || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END"
    )


@register(
    "pii_redaction",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_planted_sql()} AS text FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_md5
    FROM planted
    """,
    doc="PII scrub: count and redact emails/phone numbers per "
    "document. Map-only — zero shuffles, runs at parquet scan "
    "speed; the regexes execute JVM-side inside whole-stage "
    "codegen. The corpus has no organic PII, so a deterministic "
    "planting step (pure function of doc_id) provides positives "
    "while the remaining docs prove no false matches.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    planted = docs.select("doc_id", F.expr(_planted_sql()).alias("text"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    # patterns passed as literal Columns, NOT through F.expr — the SQL
    # parser would eat the \b escapes in a quoted literal
    n_email = F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), F.lit(0)))
    return planted.select(
        "doc_id",
        n_email.cast("bigint").alias("n_emails"),
        n_phone.cast("bigint").alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    )


@register(
    "chunk_overlap",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    n AS (
      SELECT doc_id, t,
             CASE WHEN len(t) = 0 THEN 0
                  ELSE CAST(ceil(greatest(len(t) - {CHUNK_SIZE}, 0)
                                 / {CHUNK_STRIDE}.0) AS BIGINT) + 1 END AS n_chunks
      FROM toks
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(len(t[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_SIZE}]) AS BIGINT)
             AS n_tokens,
           md5(array_to_string(t[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_SIZE}], ' '))
             AS chunk_md5
    FROM n, UNNEST(range(n_chunks)) AS u(i)
    """,
    doc="Overlapping sliding-window chunking (RAG / context-window "
    "prep): fixed 16-token chunks every 12 tokens, final partial "
    "chunk kept. Map-only explode — no shuffle; output cardinality "
    "is ~len/stride per doc, linear in corpus size. The chunk text "
    "leaves as md5 to bound the result width.",
)
def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # empty docs filtered BEFORE sequence() — see segment_dedup note
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens_expr(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    n_chunks = (
        F.ceil(
            F.greatest(F.size("t") - CHUNK_SIZE, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
        ).cast("bigint")
        + 1
    )
    chunks = docs.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("t"), (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int"), CHUNK_SIZE
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    pairs AS (
      SELECT doc_id, u.term AS term, COUNT(*) AS tf
      FROM toks, UNNEST(t) AS u(term)
      GROUP BY doc_id, u.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM pairs GROUP BY term),
    ranked AS (
      SELECT p.doc_id, p.term, p.tf, df.df,
             ROW_NUMBER() OVER (PARTITION BY p.doc_id
                                ORDER BY p.tf DESC, df.df ASC, p.term ASC) AS rank
      FROM pairs p JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_TERMS}
    """,
    doc="Per-document top-3 salient terms, tf-idf ordered. The float "
    "idf is replaced by the equivalent integer sort (tf DESC, df "
    "ASC, term ASC) so the ranking is engine-exact. Plan: explode "
    "-> two-level agg (map-side partial combine on (doc_id, term)), "
    "document frequency as a broadcast term dimension (vocabulary "
    "<< corpus; for web-scale vocabularies swap the hint for a "
    "shuffle join on term — the code path is otherwise identical), "
    "then a per-doc top-k window. Two shuffles total.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("term")
    )
    pairs = docs.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ranked = pairs.join(F.broadcast(df), "term").withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(
                F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
            )
        ),
    )
    return ranked.filter(F.col("rank") <= TOP_TERMS).select(
        "doc_id", "term", "tf", "df", F.col("rank").cast("bigint").alias("rank")
    )
