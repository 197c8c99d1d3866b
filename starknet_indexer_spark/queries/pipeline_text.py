"""Text-analysis operators over the ``documents`` table.

Training-data pipeline surface: exact dedup, token counting, quality
scoring, language ID, document fingerprinting. All JVM-side column
expressions (no Python UDFs) — at 100 TB these run inside whole-stage
codegen with the parquet scan, and the only shuffle is the final
aggregate where one exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

# language stopword regexes (word-boundary alternations; identical
# pattern semantics in Java regex and DuckDB's RE2)
LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|that|it|for|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "fr": r"\b(le|les|est|une|des|que|dans|pour|avec|sur)\b",
    "es": r"\b(el|los|las|es|y|una|como|por|para|con)\b",
}


@register(
    "dedup_exact",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS h FROM documents
    ),
    canon AS (SELECT h, MIN(doc_id) AS canonical_id FROM hashed GROUP BY h)
    SELECT hd.doc_id, hd.source, c.canonical_id,
           CAST(hd.doc_id = c.canonical_id AS BOOLEAN) AS is_canonical
    FROM hashed hd JOIN canon c ON hd.h = c.h
    """,
    doc="Exact deduplication via content hash: every doc mapped to the "
    "canonical (min doc_id) member of its normalized-text hash group. "
    "Scale path: hash group-by is a single shuffle on the digest; no "
    "pairwise comparison.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", "source", F.md5(F.lower(F.trim(F.col("text")))).alias("h")
    )
    canon = hashed.groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
    return hashed.join(canon, "h").select(
        "doc_id",
        "source",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )


@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id, lang,
           len(list_filter(string_split_regex(trim(text), '[ \t\n\r]+'),
                           x -> x <> '')) AS n_tokens,
           length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
           CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens, punctuation count, and a "
    "BPE-ish chars/4 estimate, per document. Pure projection — no "
    "shuffle; runs inside the parquet scan stage.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\r]+"), lambda x: x != "")
    return docs.select(
        "doc_id",
        "lang",
        F.size(tokens).alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), r"[^.,!?;:]", "")).alias("n_punct"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_bpe_tokens"),
    )


@register(
    "text_quality_score",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id, lang,
             length(text) AS n_chars_m,
             len(list_filter(string_split_regex(trim(text), '[ \t\n\r]+'),
                             x -> x <> '')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(regexp_extract_all(lower(text),
                 '\b(the|and|of|to|in|is|that|it|for|was)\b')) AS n_stop
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           ROUND(CAST(n_alpha AS DOUBLE) / n_chars_m, 6) AS alpha_ratio,
           ROUND(CAST(n_digit AS DOUBLE) / n_chars_m, 6) AS digit_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1), 6) AS stopword_ratio,
           ROUND(0.5 * (CAST(n_alpha AS DOUBLE) / n_chars_m)
                 + 0.3 * LEAST(CAST(n_tokens AS DOUBLE) / 100, 1.0)
                 + 0.2 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1) * 5, 1.0), 6)
             AS quality_score
    FROM feats
    """,
    doc="Heuristic quality scoring: alpha/digit/stopword ratios blended "
    "into a [0,1] score (the length/punct/stopword family of "
    "pretraining-data filters). Projection-only, codegen'd.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_chars = F.length("text")
    tokens = F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\r]+"), lambda x: x != "")
    n_tokens = F.size(tokens)
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(LANG_PATTERNS["en"]), 0))
    feats = docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        n_stop.alias("n_stop"),
    )
    alpha_ratio = F.col("n_alpha").cast("double") / F.col("n_chars_m")
    digit_ratio = F.col("n_digit").cast("double") / F.col("n_chars_m")
    stop_ratio = F.col("n_stop").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1))
    return feats.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            0.5 * alpha_ratio
            + 0.3 * F.least(F.col("n_tokens").cast("double") / 100, F.lit(1.0))
            + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)),
            6,
        ).alias("quality_score"),
    )


def _lang_id_oracle() -> str:
    counts = ",\n             ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS c_{lang}"
        for lang, pat in LANG_PATTERNS.items()
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS c_cjk,
             {counts}
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN c_cjk > 0 THEN 'zh'
                WHEN c_en >= GREATEST(c_de, c_fr, c_es) THEN 'en'
                WHEN c_de >= GREATEST(c_fr, c_es) THEN 'de'
                WHEN c_fr >= c_es THEN 'fr'
                ELSE 'es' END AS pred_lang,
           CAST(lang = (CASE WHEN c_cjk > 0 THEN 'zh'
                WHEN c_en >= GREATEST(c_de, c_fr, c_es) THEN 'en'
                WHEN c_de >= GREATEST(c_fr, c_es) THEN 'de'
                WHEN c_fr >= c_es THEN 'fr'
                ELSE 'es' END) AS BOOLEAN) AS correct
    FROM scored
    """


@register(
    "lang_id",
    oracle=_lang_id_oracle(),
    doc="N-gram/stopword-heuristic language identification over "
    "en/de/fr/es + CJK-codepoint detection for zh; deterministic "
    "argmax with fixed tie order. Projection-only.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[一-鿿]"), 0)).alias("c_cjk"),
        *[
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), 0)).alias(f"c_{lang}")
            for lang, pat in LANG_PATTERNS.items()
        ],
    )
    pred = (
        F.when(F.col("c_cjk") > 0, "zh")
        .when(F.col("c_en") >= F.greatest("c_de", "c_fr", "c_es"), "en")
        .when(F.col("c_de") >= F.greatest("c_fr", "c_es"), "de")
        .when(F.col("c_fr") >= F.col("c_es"), "fr")
        .otherwise("es")
    )
    return scored.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (F.col("lang") == pred).alias("correct"),
    )


TOKEN_BUDGET_PER_LANG = 20_000


@register(
    "corpus_select",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             md5(lower(trim(text))) AS h,
             len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r]+'),
                             x -> x <> '')) AS n_tokens,
             CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(text) AS n_chars_m,
             len(regexp_extract_all(lower(text),
                 '\\b(the|and|of|to|in|is|that|it|for|was)\\b')) AS n_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, h, n_tokens, est_bpe_tokens,
             ROUND(0.5 * (CAST(n_alpha AS DOUBLE) / n_chars_m)
                   + 0.3 * LEAST(CAST(n_tokens AS DOUBLE) / 100, 1.0)
                   + 0.2 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1) * 5, 1.0),
                   6) AS quality_score
      FROM feats
    ),
    canon AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS dup_rank
        FROM scored
      ) WHERE dup_rank = 1
    ),
    budgeted AS (
      SELECT doc_id, lang, n_tokens, quality_score,
             SUM(est_bpe_tokens) OVER (
               PARTITION BY lang ORDER BY quality_score DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM canon
    )
    SELECT doc_id, lang, n_tokens, quality_score,
           cum_tokens::BIGINT AS cum_tokens
    FROM budgeted WHERE cum_tokens <= {TOKEN_BUDGET_PER_LANG}
    """,
    doc="End-to-end corpus selection: quality scoring -> exact dedup "
    "(canonical per content hash) -> greedy per-language selection "
    "under a token budget (running sum over quality-descending order). "
    "The composed form of the pipeline ops; the budget window "
    "partitions by language, so selection parallelizes per language "
    "at scale instead of one global sort.",
)
def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\r]+"), lambda x: x != "")
    n_tokens = F.size(tokens)
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(LANG_PATTERNS["en"]), 0))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    quality = F.round(
        0.5 * (n_alpha.cast("double") / F.length("text"))
        + 0.3 * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)),
        6,
    )
    scored = docs.select(
        "doc_id",
        "lang",
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
        n_tokens.alias("n_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_bpe_tokens"),
        quality.alias("quality_score"),
    )
    canon = (
        scored.withColumn(
            "dup_rank", F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("dup_rank") == 1)
        .drop("dup_rank")
    )
    wb = (
        W.partitionBy("lang")
        .orderBy(F.col("quality_score").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        canon.withColumn("cum_tokens", F.sum("est_bpe_tokens").over(wb))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_LANG)
        .select("doc_id", "lang", "n_tokens", "quality_score", "cum_tokens")
    )


WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (guarantee: shared substrings >= k+w-1 chars collide)
WINNOW_B = 256
WINNOW_P = 1_000_000_007


def _winnow_oracle() -> str:
    return f"""
    WITH chars AS (
      SELECT doc_id,
             list_transform(
               string_split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ''),
               c -> ascii(c)::BIGINT) AS cs
      FROM documents
    ),
    hashes AS (
      SELECT doc_id,
             list_transform(
               range(1, len(cs) - {WINNOW_K} + 2),
               i -> list_reduce(cs[i:i + {WINNOW_K} - 1],
                                (acc, c) -> (acc * {WINNOW_B} + c) % {WINNOW_P})) AS hs
      FROM chars WHERE len(cs) >= {WINNOW_K}
    ),
    fps AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(range(1, len(hs) - {WINNOW_W} + 2),
                              j -> list_min(hs[j:j + {WINNOW_W} - 1])))) AS fp
      FROM hashes WHERE len(hs) >= {WINNOW_W}
    )
    SELECT doc_id,
           len(fp) AS n_fingerprints,
           fp[1] AS min_fingerprint,
           md5(array_to_string(fp, ',')) AS fp_digest
    FROM fps
    """


@register(
    "winnowing_fingerprint",
    oracle=_winnow_oracle(),
    doc="Winnowing document fingerprint (Schleimer et al. local "
    f"fingerprinting): char {WINNOW_K}-gram polynomial rolling hashes "
    f"(base {WINNOW_B} mod {WINNOW_P}), per-window minima over "
    f"{WINNOW_W} consecutive hashes, distinct-sorted. Any shared "
    f"substring of >= {WINNOW_K + WINNOW_W - 1} chars produces a "
    "colliding fingerprint — the near-dup guarantee exact hashing "
    "lacks. Map-only array folds; the fingerprint set (not the text) "
    "is what shuffles in a dedup join.",
)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cs = F.transform(
        F.split(F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]+", " ")), ""),
        lambda c: F.ascii(c),
    )
    chars = docs.select("doc_id", cs.alias("cs")).filter(F.size("cs") >= WINNOW_K)
    hs = F.transform(
        F.sequence(F.lit(1), F.size("cs") - (WINNOW_K - 1)),
        lambda i: F.aggregate(
            F.slice("cs", i, WINNOW_K),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * WINNOW_B + c) % WINNOW_P,
        ),
    )
    hashes = chars.select("doc_id", hs.alias("hs")).filter(F.size("hs") >= WINNOW_W)
    fp = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("hs") - (WINNOW_W - 1)),
                lambda j: F.array_min(F.slice("hs", j, WINNOW_W)),
            )
        )
    )
    return hashes.select("doc_id", fp.alias("fp")).select(
        "doc_id",
        F.size("fp").alias("n_fingerprints"),
        F.element_at("fp", 1).alias("min_fingerprint"),
        F.md5(F.concat_ws(",", F.col("fp").cast("array<string>"))).alias("fp_digest"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           substr(md5(lower(trim(text))), 1, 16) AS fingerprint,
           length(text) AS fp_len
    FROM documents
    """,
    doc="64-bit content fingerprint (md5 prefix of normalized text) — "
    "the exact-dup key; the shingle/winnowing near-dup fingerprint "
    "lives in operators.dedup (signature path).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.md5(F.lower(F.trim(F.col("text")))), 1, 16).alias("fingerprint"),
        F.length("text").alias("fp_len"),
    )


# ---------------------------------------------------------------------------
# Vocabulary construction + token-id encoding (tokenizer-prep step)
# ---------------------------------------------------------------------------

# vocabulary size; OOV encodes as id 0. 16 < the corpus's 31 distinct
# tokens, so the frequency-rank boundary (ties broken by token) and
# the OOV path are both exercised at every SF; production sets this
# to the tokenizer's real vocab size — the plan shape is unchanged.
VOCAB_V = 16


@register(
    "vocab_encode_ids",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               string_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
               x -> x <> '') AS tokens
      FROM documents
    ),
    tok AS (
      SELECT doc_id, i, tokens[i] AS token
      FROM (SELECT doc_id, tokens,
                   UNNEST(range(1, len(tokens) + 1)) AS i
            FROM toks WHERE len(tokens) > 0)
    ),
    vocab AS (
      SELECT token, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS id
      FROM (SELECT token, COUNT(*) AS cnt FROM tok
            GROUP BY token ORDER BY cnt DESC, token LIMIT {VOCAB_V})
    ),
    enc AS (
      SELECT tok.doc_id, tok.i, COALESCE(v.id, 0) AS id
      FROM tok LEFT JOIN vocab v ON v.token = tok.token
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY i)) AS ids_digest
    FROM enc GROUP BY doc_id
    """,
    doc=f"Tokenizer-prep encoding: build a {VOCAB_V}-entry vocabulary "
    "(top tokens by corpus frequency, ties by token — a deterministic "
    "total order both engines share) and encode every document as its "
    "position-ordered token-id sequence with OOV=0, reported as "
    "(n_tokens, n_oov, md5 digest of the id sequence) so the exact "
    "per-position encoding value-hash-checks. Scale shape: the "
    "vocabulary is one map-side-combined count aggregation + a "
    "VOCAB-sized sort (the corpus never sorts), then encoding is a "
    "posexplode + broadcast join + one per-doc re-collect keyed on "
    "the document — the id-mapping twin of what a real BPE pipeline "
    "does with a broadcast merge table. Integer-exact end to end.",
)
def vocab_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.dedup import tokens_expr

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tokens")).filter(
        F.size("tokens") > 0
    )
    tok = toks.select("doc_id", F.posexplode("tokens").alias("i", "token"))
    # the single-partition row_number window runs over the ALREADY
    # limited VOCAB_V-row relation, never the corpus
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(VOCAB_V)
        .select(
            "token",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("token")))
            .alias("id"),
        )
    )
    enc = tok.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "i", F.coalesce(F.col("id"), F.lit(0)).alias("id")
    )
    ids = F.transform(
        F.sort_array(F.collect_list(F.struct("i", "id"))), lambda s: s["id"]
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("id") == 0, 1).otherwise(0)).cast("bigint").alias("n_oov"),
        F.md5(F.concat_ws(",", ids.cast("array<string>"))).alias("ids_digest"),
    )
