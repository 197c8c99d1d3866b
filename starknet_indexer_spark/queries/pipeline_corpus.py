"""Corpus-statistics and sessionization queries.

Operator families this module adds to the engine surface:

- **Session windows** (gap-based sessionization): absent from the
  reference (SURVEY §2.5 "session windows: not used") but a core
  capability of a stream-analytics engine; implemented with the
  canonical lag → new-session flag → running-sum rewrite, which is
  also how the reference's interval-sweep views (V12, src/dao.ts:
  1231-1352) segment running state.
- **ROLLUP / grouping sets**: SURVEY §2.3 notes the reference never
  uses them; a multi-granularity rollup is the hypertable-style
  operation its hourly tables (V13-V16, src/dao.ts:435-473) would
  need at coarser grains, expressed in one pass instead of N.
- **Vocabulary statistics** (document frequency / IDF, top tokens per
  language) and **stratified sampling** — training-data pipeline ops
  over ``documents``.

Scale notes per query in the docstrings; the common theme is that
every aggregation here is a single hash shuffle with map-side partial
aggregation, and every window partitions by a high-cardinality key
(user_id, lang) so no single task sees more than one key group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import tokens_expr, word_ngrams_expr
from .registry import register

SESSION_GAP_S = 1800

_TOKS_SQL = r"""
    SELECT doc_id, lang,
           list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                       ' '), x -> x <> '') AS tokens
    FROM documents
"""


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      -- FLOOR before the cast: epoch() returns fractional seconds and
      -- a bare BIGINT cast rounds, while Spark's unix_timestamp truncates
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
             LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY event_id) AS prev_s
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts_s,
             CASE WHEN prev_s IS NULL OR ts_s - prev_s > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sess AS (
      SELECT user_id, ts_s,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts_s) AS session_start,
           MAX(ts_s) AS session_end,
           MAX(ts_s) - MIN(ts_s) AS duration_s
    FROM sess
    GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30-min inactivity) via the lag → "
    "new-session flag → running-sum rewrite, then per-session "
    "aggregation. One shuffle on user_id serves both the window and "
    "the groupBy (the agg key prefixes the window key, so Catalyst "
    "reuses the partitioning). At 100 TB user_id is high-cardinality, "
    "so partitions stay balanced; the streaming analogue is "
    "session_window() in streaming/windows.py.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts").alias("ts_s")
    ordered = ev.select("user_id", "event_id", ts_s)
    w_seq = W.partitionBy("user_id").orderBy("event_id")
    flagged = ordered.withColumn(
        "is_new",
        F.when(
            F.lag("ts_s").over(w_seq).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(w_seq) > SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new")
        .over(w_seq.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_s").alias("session_start"),
        F.max("ts_s").alias("session_end"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
    )


@register(
    "rollup_hourly_activity",
    oracle="""
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(CAST(epoch(date_trunc('hour', ts)) AS BIGINT), -1) AS hour_ts,
           CAST(GROUPING(event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT))
                AS BIGINT) AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (event_type,
                     CAST(epoch(date_trunc('hour', ts)) AS BIGINT))
    """,
    doc="Multi-granularity ROLLUP over (event_type, hour): per-hour, "
    "per-type, and grand-total rows in ONE aggregation pass instead of "
    "three jobs — at 100 TB this reads the fact table once where the "
    "reference's per-grain tables (src/dao.ts:435-473) would scan per "
    "grain. grouping_id disambiguates grain; rolled-up keys are "
    "COALESCEd to sentinels so the result is NULL-free on both engines.",
)
def rollup_hourly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour_ts = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_ts")
    return (
        ev.select("event_type", hour_ts, "value")
        .rollup("event_type", "hour_ts")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("hour_ts"), F.lit(-1)).alias("hour_ts"),
            "gid",
            "n_events",
            "total_value",
        )
    )


@register(
    "token_doc_frequency",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tok AS (
      SELECT doc_id, UNNEST(list_distinct(tokens)) AS token FROM toks
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token,
           COUNT(*) AS df,
           ROUND(LN(CAST((SELECT n_docs FROM n) AS DOUBLE) / COUNT(*)), 6) AS idf
    FROM tok
    GROUP BY token
    HAVING COUNT(*) >= 5
    """,
    doc="Vocabulary document-frequency + IDF table: distinct tokens per "
    "doc (map-side array_distinct bounds the explode), one hash "
    "aggregation on token, corpus size as a broadcast scalar (SURVEY "
    "§2.3 R4 scalar-subquery pattern). The df >= 5 floor is the "
    "standard vocab-pruning step and keeps the result bounded. The "
    "token shuffle is Zipf-skewed at scale; partial aggregation "
    "absorbs the head (each map task emits one row per distinct "
    "token), so the reduce side sees at most n_tasks rows per token.",
)
def token_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select(
        F.explode(F.array_distinct(tokens_expr(F.col("text")))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 5)
        .select(
            "token",
            "df",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("idf"),
        )
    )


@register(
    "top_tokens_per_lang",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tok AS (SELECT lang, UNNEST(tokens) AS token FROM toks),
    counts AS (
      SELECT lang, token, COUNT(*) AS cnt
      FROM tok GROUP BY lang, token
    ),
    ranked AS (
      SELECT lang, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, token) AS rn
      FROM counts
    )
    SELECT lang, token, cnt, rn FROM ranked WHERE rn <= 10
    """,
    doc="Top-10 tokens per language: explode → (lang, token) count → "
    "row_number top-k per lang with a deterministic (cnt DESC, token) "
    "tiebreak. Two shuffles: the count agg and the per-lang window; "
    "the window side is pre-shrunk to one row per (lang, token) by the "
    "agg, and lang cardinality is small, so the top-k stage is tiny.",
)
def top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(tokens_expr(F.col("text"))).alias("token"))
    counts = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "token", "cnt", "rn")
    )


@register(
    "stratified_sample",
    oracle="""
    SELECT lang, doc_id, source
    FROM (
      SELECT lang, doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 100
    """,
    doc="Deterministic stratified sample: up to 100 docs per language, "
    "selected by md5(doc_id) order — a content-independent, "
    "engine-portable pseudo-random order that is reproducible across "
    "runs and engines (no RNG state). The corpus-balancing step of a "
    "training-data pipeline. One shuffle on lang; at scale, strata "
    "counts this small make the window input tiny after the scan's "
    "column pruning (3 columns).",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        docs.select("lang", "doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("lang", "doc_id", "source")
    )


# Keep-threshold for the repetition filter: docs whose duplicate-bigram
# fraction exceeds this are flagged (not dropped — selection queries
# compose the flag downstream).
MAX_DUP_BIGRAM_FRAC = 0.5


@register(
    "repetition_score",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    bg AS (
      SELECT doc_id,
             [tokens[i] || ' ' || tokens[i+1] for i in range(1, len(tokens))] AS bigrams
      FROM toks WHERE len(tokens) >= 2
    ),
    stats AS (
      SELECT doc_id,
             len(bigrams) AS n_bigrams,
             len(list_distinct(bigrams)) AS n_distinct
      FROM bg
    ),
    counts AS (
      SELECT doc_id, bigram, COUNT(*) AS cnt
      FROM (SELECT doc_id, UNNEST(bigrams) AS bigram FROM bg)
      GROUP BY doc_id, bigram
    ),
    maxes AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM counts GROUP BY doc_id)
    SELECT s.doc_id,
           s.n_bigrams,
           ROUND(1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_bigrams, 6) AS dup_bigram_frac,
           ROUND(CAST(m.top_cnt AS DOUBLE) / s.n_bigrams, 6) AS top_bigram_frac,
           (1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_bigrams)
             <= {MAX_DUP_BIGRAM_FRAC} AS keep
    FROM stats s JOIN maxes m USING (doc_id)
    """,
    doc="Repetition-based quality filter (the Gopher/MassiveText "
    "duplicate-n-gram family): per document, the fraction of word "
    "bigrams that are duplicates and the share of the single most "
    "frequent bigram, plus a keep flag. The distinct/total fractions "
    "are map-only array math; only the top-bigram count needs a "
    "shuffle, keyed on (doc_id, bigram) with map-side combine, then a "
    "per-doc max. doc_id is unique, so the shuffle has no skew by "
    "construction.",
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
    bg = toks.filter(F.size("tokens") >= 2).select(
        "doc_id", word_ngrams_expr(F.col("tokens"), 2).alias("bigrams")
    )
    # single-pass rewrite (r12): every output derives from the
    # (doc_id, bigram) count relation — n_bigrams = SUM(cnt),
    # n_distinct = COUNT(*), top_cnt = MAX(cnt) — so one explode +
    # two aggregations replace the former two-branch plan (map-side
    # stats + exploded maxes) whose join re-ran the tokenize->bigram
    # chain twice. Domain unchanged: >= 2 tokens implies >= 1 bigram,
    # so the explode never drops a document the stats branch kept.
    per_doc = (
        bg.select("doc_id", F.explode("bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_bigrams"),
            F.count(F.lit(1)).cast("int").alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    dup_frac = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round(dup_frac, 6).alias("dup_bigram_frac"),
        F.round(F.col("top_cnt").cast("double") / F.col("n_bigrams"), 6).alias(
            "top_bigram_frac"
        ),
        (dup_frac <= MAX_DUP_BIGRAM_FRAC).alias("keep"),
    )


SEQ_LEN = 512  # tokens per packed training sequence


@register(
    "sequence_packing",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    n AS (SELECT doc_id, lang, len(tokens) AS n_tok FROM toks WHERE len(tokens) > 0),
    packed AS (
      SELECT doc_id, lang, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT)
               AS start_tok
      FROM n
    )
    SELECT doc_id, lang, n_tok, start_tok,
           start_tok // {SEQ_LEN} AS seq_first,
           (start_tok + n_tok - 1) // {SEQ_LEN} AS seq_last,
           (start_tok + n_tok - 1) // {SEQ_LEN} - start_tok // {SEQ_LEN} + 1
             AS n_seqs_spanned
    FROM packed
    """,
    doc=f"GPT-style sequence packing (concat-and-chunk): documents are "
    f"concatenated in doc_id order within each lang shard and chunked "
    f"into {SEQ_LEN}-token training sequences; each document gets its "
    "global token offset and the range of sequence ids it lands in. "
    "One running-sum window per shard — a single exchange on lang; "
    "shards pack independently, so at 100 TB the natural unit is "
    "(shard, file-partition) and the window never crosses executors. "
    "Integer token counts make the running sum exact on both engines.",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id", "lang", F.size(tokens_expr(F.col("text"))).alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = n.withColumn(
        "start_tok", (F.sum("n_tok").over(w) - F.col("n_tok")).cast("bigint")
    )
    # integer `div`, not floor(x/512): double division loses exactness
    # once offsets exceed 2^53 (the catalog.load ns->us lesson); both
    # engines' integer division agrees on the non-negative offsets here
    seq_first = F.expr(f"start_tok div {SEQ_LEN}").cast("bigint")
    seq_last = F.expr(f"(start_tok + n_tok - 1) div {SEQ_LEN}").cast("bigint")
    return packed.select(
        "doc_id",
        "lang",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        "start_tok",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + F.lit(1)).alias("n_seqs_spanned"),
    )


# hex-digit buckets on a content-independent md5: 12/16 train, 2/16
# val, 2/16 test — the standard deterministic holdout split that stays
# stable under repartitioning and incremental corpus growth
_SPLIT_SQL = """
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND '9'
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('a', 'b') THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
         ELSE 'test' END
"""


@register(
    "train_val_test_split",
    oracle=f"""
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           CAST(SUM(CEIL(length(text) / 4.0)) AS BIGINT) AS est_bpe_tokens
    FROM (SELECT lang, text, {_SPLIT_SQL} AS split FROM documents)
    GROUP BY 1, 2
    """,
    doc="Deterministic train/val/test split (75/12.5/12.5) by the "
    "first hex digit of md5(doc_id): reproducible across engines, "
    "runs, partitionings, and incremental corpus growth (a doc never "
    "changes split when new docs arrive — unlike ROW_NUMBER-based "
    "splits). Map-only assignment + one aggregation shuffle; at "
    "100 TB the assignment is a projection fused into the scan.",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(h.between("0", "9") | h.isin("a", "b"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", F.length("text").alias("len"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len").alias("n_chars"),
            F.sum(F.ceil(F.col("len") / 4.0)).cast("bigint").alias("est_bpe_tokens"),
        )
    )


# Gopher-style composite quality rules (Rae et al. 2021, table A1
# analogues, thresholds adapted to the synthetic corpus scale)
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 10_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


@register(
    "gopher_quality_filter",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    feats AS (
      SELECT doc_id, lang,
             len(tokens) AS word_count,
             ROUND(CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE)
                   / GREATEST(len(tokens), 1), 6) AS mean_word_len,
             len(list_filter(tokens,
                 x -> list_contains({list(GOPHER_STOPWORDS)!r}, x))) AS n_stopwords
      FROM toks
    )
    SELECT doc_id, lang, word_count, mean_word_len,
           CAST(n_stopwords AS BIGINT) AS n_stopwords,
           (word_count BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS ok_words,
           (mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                              AND {GOPHER_MAX_MEAN_WORD_LEN}) AS ok_word_len,
           (n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS ok_stopwords,
           ((word_count BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
            AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                                   AND {GOPHER_MAX_MEAN_WORD_LEN})
            AND n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS keep
    FROM feats
    """,
    doc="Gopher-style composite quality filter (word-count bounds, "
    "mean word length bounds, stopword floor) emitting per-rule "
    "verdicts plus the conjunction — the repeatable quality gate of a "
    "pretraining pipeline, kept as flags so downstream selection "
    "composes rather than destructively dropping rows. Pure column "
    "expressions over one scan; no shuffle at all (map-only), so it "
    "pipelines into any downstream operator at 100 TB.",
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("word_count"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast(
                "double"
            )
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("mean_word_len"),
        F.size(F.filter(toks, lambda x: x.isin(*GOPHER_STOPWORDS))).cast("bigint").alias(
            "n_stopwords"
        ),
    )
    ok_words = F.col("word_count").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_wlen = F.col("mean_word_len").between(
        GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
    )
    ok_stop = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    return d.select(
        "doc_id",
        "lang",
        "word_count",
        "mean_word_len",
        "n_stopwords",
        ok_words.alias("ok_words"),
        ok_wlen.alias("ok_word_len"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wlen & ok_stop).alias("keep"),
    )


_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@register(
    "source_lang_pivot",
    oracle=f"""
    SELECT source,
           {", ".join(
               "CAST(SUM(CASE WHEN lang = '" + la + "' THEN 1 ELSE 0 END) AS BIGINT)"
               " AS n_" + la
               for la in _PIVOT_LANGS
           )},
           CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
    doc="Cross-tab of the corpus mix: one row per source, one count "
    "column per language — Spark's pivot() with an EXPLICIT value "
    "list, which compiles to conditional aggregation in a single "
    "hash agg (one shuffle). Never call pivot() without the value "
    "list at scale: value discovery adds a full distinct pass over "
    "the fact table before the real aggregation.",
)
def source_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = docs.groupBy("source").pivot("lang", list(_PIVOT_LANGS)).agg(
        F.count(F.lit(1)).alias("n")
    )
    # total_chars covers ALL rows of the source, not just the pivoted
    # languages — a lang outside _PIVOT_LANGS must still count here
    # (summing the per-language pivot columns would silently undercount
    # the moment the corpus grows a sixth language)
    totals = docs.groupBy("source").agg(
        F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("bigint").alias("total_chars")
    )
    cols = [F.col("source")]
    for la in _PIVOT_LANGS:
        cols.append(F.coalesce(F.col(la), F.lit(0)).cast("bigint").alias(f"n_{la}"))
    cols.append(F.col("total_chars"))
    return out.join(totals, "source").select(*cols)


N_SHARDS = 8


@register(
    "corpus_shuffle_shard",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('shuf1:' || CAST(doc_id AS STRING)), 1, 15))
                  AS BIGINT) AS hv
      FROM documents
    )
    SELECT doc_id,
           CAST(hv % {N_SHARDS} AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY hv % {N_SHARDS}
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos_in_shard
    FROM h
    """,
    doc="Deterministic global corpus shuffle + sharding: every doc "
    "gets a pseudorandom but reproducible position from a seeded "
    "60-bit md5 hash — shard = hash mod N, position = rank of hash "
    "within shard. The training-data staple (epoch shuffling must be "
    "identical across reruns and independent of input partitioning). "
    "One shuffle on the shard key; within-shard ordering is a "
    "per-shard sort, never a global one — at 100 TB a global ORDER "
    "BY is the anti-pattern this operator replaces.",
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("shuf1:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    h = docs.select("doc_id", hv.alias("hv"), (hv % N_SHARDS).alias("shard"))
    w = W.partitionBy("shard").orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


# Weighted-sample weight: 1 + min(n_chars div 80, 7) -> 1..8 over the
# corpus's 48..~550-char docs; longer docs proportionally likelier.
WSAMPLE_K = 100


def _es_key_sql() -> str:
    """The Efraimidis-Spirakis max-of-w md5 key (DuckDB dialect).

    The SINGLE definition both weighted samplers' oracles are built
    from — a weight-formula change lands in both or neither."""
    cases = ",\n               ".join(
        f"CASE WHEN 1 + LEAST(n_chars // 80, 7) >= {j}"
        f"\n                    THEN md5(CAST(doc_id AS VARCHAR) || ':{j}') ELSE '' END"
        for j in range(2, 9)
    )
    return f"""GREATEST(
               md5(CAST(doc_id AS VARCHAR) || ':1'),
               {cases}
             )"""


def _es_sample_key_col() -> Column:
    """Spark twin of :func:`_es_key_sql`; expects ``doc_id`` and
    ``weight`` columns in scope."""
    terms = [F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":1")))]
    for j in range(2, 9):
        terms.append(
            F.when(
                F.col("weight") >= j,
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{j}"))),
            ).otherwise(F.lit(""))
        )
    return F.greatest(*terms)


@register(
    "weighted_sample_topk",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             1 + LEAST(n_chars // 80, 7) AS weight,
             {_es_key_sql()} AS sample_key
      FROM documents
    )
    SELECT doc_id, source, CAST(weight AS BIGINT) AS weight, sample_key
    FROM keyed
    ORDER BY sample_key DESC, doc_id
    LIMIT {WSAMPLE_K}
    """,
    doc=f"Exact-k weighted sampling WITHOUT replacement "
    f"(Efraimidis-Spirakis): each doc gets key = max of w independent "
    "md5 draws (max of w uniforms ~ u^(1/w), the E-S key), w = "
    "1+min(n_chars div 80, 7); the global top-"
    f"{WSAMPLE_K} by key is a weight-proportional WOR sample — "
    "reproducible across runs, engines, and partitionings (no RNG "
    "state). Complements source_mixing_sample (Bernoulli, "
    "approximate rate) and stratified_sample (uniform per-stratum): "
    "this is the exact-size, item-weighted variant a token-budgeted "
    "corpus draw needs. Scale shape: the w draws are a STATIC "
    "8-term greatest() unrolled in the scan (no explode, no "
    "per-doc shuffle); the only distributed op is the final "
    "top-k (TakeOrdered — never a global sort).",
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wcol = (F.lit(1) + F.least(F.expr("n_chars div 80"), F.lit(7))).alias("weight")
    return (
        docs.select("doc_id", "source", wcol, "n_chars")
        .select(
            "doc_id",
            "source",
            F.col("weight").cast("bigint").alias("weight"),
            _es_sample_key_col().alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(WSAMPLE_K)
    )


# Collocation mining: pairs must occur at least this often, and the
# top-k by integer-scaled lift is emitted.
PMI_MIN_COUNT = 5
PMI_TOP_K = 50


@register(
    "pmi_collocations",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    uni AS (
      SELECT t.tok AS tok, COUNT(*) AS c
      FROM toks, UNNEST(tokens) AS t(tok)
      GROUP BY 1
    ),
    n AS (SELECT SUM(c) AS n FROM uni),
    bg AS (
      SELECT b.bigram AS bigram, COUNT(*) AS c_xy
      FROM (
        SELECT [tokens[i] || ' ' || tokens[i+1]
                for i in range(1, len(tokens))] AS bigrams
        FROM toks WHERE len(tokens) >= 2
      ), UNNEST(bigrams) AS b(bigram)
      GROUP BY 1
    ),
    m AS (SELECT SUM(c_xy) AS m FROM bg),
    sp AS (
      SELECT split_part(bigram, ' ', 1) AS left_tok,
             split_part(bigram, ' ', 2) AS right_tok, c_xy
      FROM bg WHERE c_xy >= {PMI_MIN_COUNT}
    )
    SELECT left_tok, right_tok,
           CAST(c_xy AS BIGINT) AS pair_count,
           CAST(ux.c AS BIGINT) AS left_count,
           CAST(uy.c AS BIGINT) AS right_count,
           CAST((CAST(c_xy AS HUGEINT) * (SELECT n FROM n) * (SELECT n FROM n)
                 * 1000000)
                // (CAST((SELECT m FROM m) AS HUGEINT) * ux.c * uy.c)
                AS BIGINT) AS lift_ppm
    FROM sp
    JOIN uni ux ON ux.tok = sp.left_tok
    JOIN uni uy ON uy.tok = sp.right_tok
    ORDER BY lift_ppm DESC, left_tok, right_tok
    LIMIT {PMI_TOP_K}
    """,
    doc=f"PMI-style collocation mining (word2vec-phrases / NLTK "
    "collocations family): for every adjacent word pair seen >= "
    f"{PMI_MIN_COUNT} times, the pointwise-mutual-information LIFT "
    "p(xy)/(p(x)p(y)) = (c_xy*N*N)/(M*c_x*c_y) as an integer "
    "parts-per-million via truncating division — rank-equivalent to "
    "PMI (log is monotone) with none of the float, so the top-"
    f"{PMI_TOP_K} is value-hash exact. Two corpus-sized map-side-"
    "combined aggs (unigram + bigram counts); everything after joins "
    "vocabulary-sized relations (unigram side broadcast) and the "
    "final top-k is a TakeOrdered, not a global sort. The HUGEINT/"
    "decimal(38,0) product holds to N ~ 1e8 tokens at 1e6 scaling; "
    "beyond that, renormalize counts (divide all by a common power "
    "of two) before the ratio, same bound discipline as "
    "ks_drift_by_source.",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    D38 = "decimal(38,0)"
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(tokens_expr(F.col("text")).alias("tokens"))
    uni = (
        toks.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = uni.agg(F.sum("c").alias("n"))
    bg = (
        toks.filter(F.size("tokens") >= 2)
        .select(F.explode(word_ngrams_expr(F.col("tokens"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    m = bg.agg(F.sum("c_xy").alias("m"))
    sp = bg.filter(F.col("c_xy") >= PMI_MIN_COUNT).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("left_tok"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("right_tok"),
        "c_xy",
    )
    ux = uni.select(F.col("tok").alias("left_tok"), F.col("c").alias("cx"))
    uy = uni.select(F.col("tok").alias("right_tok"), F.col("c").alias("cy"))
    return (
        sp.join(F.broadcast(ux), "left_tok")
        .join(F.broadcast(uy), "right_tok")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(m))
        .select(
            "left_tok",
            "right_tok",
            F.col("c_xy").cast("bigint").alias("pair_count"),
            F.col("cx").cast("bigint").alias("left_count"),
            F.col("cy").cast("bigint").alias("right_count"),
            F.expr(
                "CAST((CAST(c_xy AS decimal(38,0)) * n * n * 1000000)"
                " div (CAST(m AS decimal(38,0)) * cx * cy) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "left_tok", "right_tok")
        .limit(PMI_TOP_K)
    )


SKIPGRAM_WINDOW = 4  # max distance between center and context token
SKIPGRAM_TOP_K = 100


def _skipgram_oracle() -> str:
    offsets = " UNION ALL ".join(
        f"""
      SELECT p.pr[1] AS left_tok, p.pr[2] AS right_tok
      FROM toks, UNNEST(
        [[tokens[i], tokens[i + {j}]] for i in range(1, len(tokens) - {j - 1})]
      ) AS p(pr)"""
        for j in range(1, SKIPGRAM_WINDOW + 1)
    )
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    pairs AS ({offsets})
    SELECT left_tok, right_tok, CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY 1, 2
    ORDER BY pair_count DESC, left_tok, right_tok
    LIMIT {SKIPGRAM_TOP_K}
    """


@register(
    "skipgram_pairs",
    oracle=_skipgram_oracle(),
    doc=f"Skip-gram co-occurrence extraction (the word2vec/fastText "
    f"training-pair op): every (center, context) token pair within "
    f"distance {SKIPGRAM_WINDOW}, counted corpus-wide, top-"
    f"{SKIPGRAM_TOP_K} by exact count with lexicographic tie-break. "
    "Pair generation is MAP-ONLY array math — one zip of two shifted "
    "slices per offset (the word_ngrams_expr discipline: zip_with "
    "walks each slice once; a positional self-join would shuffle the "
    "token stream once per offset instead) — so the only shuffle is "
    "the single map-side-combined pair count, and the top-k is a "
    "TakeOrdered. Output volume is window x corpus tokens, the same "
    "shape every embedding-training data loader materializes.",
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(tokens_expr(F.col("text")).alias("tokens"))

    def offset_pairs(j: int) -> F.Column:
        length = F.greatest(F.size("tokens") - j, F.lit(0))
        return F.zip_with(
            F.slice(F.col("tokens"), 1, length),
            F.slice(F.col("tokens"), j + 1, length),
            lambda a, b: F.struct(a.alias("left_tok"), b.alias("right_tok")),
        )

    # all offsets in ONE projection over ONE scan — a union of
    # per-offset branches would re-scan and re-tokenize the corpus
    # once per offset (Catalyst does not dedupe scans across a Union)
    allp = toks.select(
        F.explode(
            F.concat(*[offset_pairs(j) for j in range(1, SKIPGRAM_WINDOW + 1)])
        ).alias("pr")
    )
    return (
        allp.select("pr.left_tok", "pr.right_tok")
        .groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_tok", "right_tok")
        .limit(SKIPGRAM_TOP_K)
    )


WSAMPLE_PER_SOURCE_K = 10


@register(
    "weighted_sample_per_source",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             1 + LEAST(n_chars // 80, 7) AS weight,
             {_es_key_sql()} AS sample_key
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, weight, sample_key,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY sample_key DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT source, doc_id, CAST(weight AS BIGINT) AS weight,
           CAST(rk AS BIGINT) AS rank_in_source
    FROM ranked WHERE rk <= {WSAMPLE_PER_SOURCE_K}
    """,
    doc=f"Per-source exact-k weighted sampling without replacement: the "
    "same Efraimidis-Spirakis max-of-w md5 keys as "
    f"weighted_sample_topk, but drawn top-{WSAMPLE_PER_SOURCE_K} "
    "WITHIN each source — the balanced, token-budget-per-slice corpus "
    "draw a mixing schedule needs (stratified_sample is the uniform "
    "variant; this one is item-weighted within stratum). One "
    "source-keyed window over the scan's static key expression; "
    "source is high-cardinality at web scale so the single shuffle "
    "has no skew hot-spot, and per-partition top-k means no global "
    "sort.",
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wcol = (F.lit(1) + F.least(F.expr("n_chars div 80"), F.lit(7))).alias("weight")
    keyed = docs.select("doc_id", "source", wcol).select(
        "doc_id", "source", "weight", _es_sample_key_col().alias("sample_key")
    )
    w = W.partitionBy("source").orderBy(F.col("sample_key").desc(), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WSAMPLE_PER_SOURCE_K)
        .select(
            "source",
            "doc_id",
            F.col("weight").cast("bigint").alias("weight"),
            F.col("rk").cast("bigint").alias("rank_in_source"),
        )
    )


#: non-splitting packing capacity (tokens per training sequence)
PACK_CAP = 1024


@register(
    "bucketed_sequence_packing",
    oracle=f"""
    WITH toks AS ({{toks}}),
    n AS (
      SELECT doc_id, len(tokens) AS n_tok FROM toks
      WHERE len(tokens) > 0 AND len(tokens) <= {PACK_CAP}
    ),
    b AS (
      -- power-of-2 length bucket: the smallest 2^k >= n_tok, via
      -- INTEGER bit-length (length of bin(n-1)) — LOG2/CEIL floats
      -- differ by one ulp at exact powers of two across engines
      SELECT doc_id, n_tok,
             CASE WHEN n_tok = 1 THEN 1
                  ELSE 1 << length(bin(n_tok - 1)) END AS bucket
      FROM n
    ),
    slotted AS (
      SELECT doc_id, n_tok, bucket,
             {PACK_CAP} // bucket AS slots,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1
               AS pos
      FROM b
    )
    SELECT bucket,
           CAST(MAX(slots) AS BIGINT) AS slots_per_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(pos // slots) + 1 AS BIGINT) AS n_bins,
           CAST(SUM(n_tok) AS BIGINT) AS content_tokens,
           CAST((MAX(pos // slots) + 1) * {PACK_CAP} AS BIGINT)
             AS capacity_tokens,
           CAST(FLOOR(1000000.0 * SUM(n_tok)
                      / ((MAX(pos // slots) + 1) * {PACK_CAP}) + 0.5) AS BIGINT)
             AS fill_ppm
    FROM slotted GROUP BY bucket
    """.format(toks=_TOKS_SQL),
    doc=f"Length-bucketed NON-SPLITTING sequence packing (the SFT/"
    "instruction-tuning counterpart to sequence_packing's GPT-style "
    "concat-and-chunk, which splits documents across sequence "
    "boundaries): each doc rounds up to its power-of-2 length bucket, "
    f"a {PACK_CAP}-token bin holds exactly cap/bucket same-bucket "
    "docs, and bin assignment is pos div slots over a deterministic "
    "row numbering — the fully PARALLEL packing rule (true first-fit-"
    "decreasing is a sequential fold; bucketing is how production "
    "packers parallelize it, trading <= 2x padding within a bucket). "
    "Output: per-bucket bin counts and the fill ratio — the padding-"
    "waste table a data team reads to pick capacity. Docs longer than "
    "the capacity are excluded (they go to the chunking path). Scale "
    "shape: one token-length pass, then a per-bucket window over "
    "doc-count-sized relations; buckets pack independently, so at "
    "100 TB the unit is (bucket, shard) and rows never cross "
    "executors outside their bucket.",
)
def bucketed_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tok")
    ).filter((F.col("n_tok") > 0) & (F.col("n_tok") <= PACK_CAP))
    # integer bit-length bucket (see oracle comment: LOG2/CEIL floats
    # are a one-ulp cross-engine hazard at exact powers of two)
    bucket = F.when(F.col("n_tok") == 1, F.lit(1).cast("bigint")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), length(bin(n_tok - 1)))")
    )
    b = n.withColumn("bucket", bucket).withColumn(
        "slots", F.expr(f"{PACK_CAP} div bucket")
    )
    pos = F.row_number().over(W.partitionBy("bucket").orderBy("doc_id")) - 1
    slotted = b.withColumn("pos", pos)
    return slotted.groupBy("bucket").agg(
        F.max("slots").cast("bigint").alias("slots_per_bin"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.max(F.expr("pos div slots")) + 1).cast("bigint").alias("n_bins"),
        F.sum("n_tok").cast("bigint").alias("content_tokens"),
        ((F.max(F.expr("pos div slots")) + 1) * PACK_CAP)
        .cast("bigint")
        .alias("capacity_tokens"),
        F.floor(
            F.lit(1000000.0)
            * F.sum("n_tok")
            / ((F.max(F.expr("pos div slots")) + 1) * PACK_CAP)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("fill_ppm"),
    )
