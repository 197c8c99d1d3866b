"""Statistical quality scoring and corpus-mixing operators.

Training-data pipeline surface beyond simple ratio heuristics
(pipeline_text.text_quality_score): information-theoretic per-document
scores (word entropy, unigram-LM cross-entropy a la CCNet-style
perplexity filtering) and the deterministic weighted source-mixing
sampler a pretraining data recipe needs.

Determinism: entropy/log-prob scores are sums of dozens of
``c*log2(c)`` terms; cross-engine float error is ~1e-13 relative, so
rounding to 6 dp (the driver's own comparison precision) is stable.
Sampling decisions are pure BIGINT arithmetic (Knuth multiplicative
hash) — bit-identical on both engines, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

# Shared whitespace tokenizer (same semantics as pipeline_text).
_TOKENS = lambda c: F.filter(F.split(F.trim(c), r"[ \t\n\r]+"), lambda x: x != "")  # noqa: E731
_DUCK_TOKENS = r"list_filter(string_split_regex(trim(text), '[ \t\n\r]+'), x -> x <> '')"


@register(
    "word_entropy_quality",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents
    ),
    cnt AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct,
           ROUND(LOG2(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * LOG2(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE),
                 6) AS word_entropy,
           ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS type_token_ratio
    FROM cnt GROUP BY doc_id
    """,
    doc="Per-document Shannon entropy of the token distribution plus "
    "type-token ratio — the low-entropy tail is boilerplate/spam, the "
    "classic pretraining quality cut. Shape: explode -> two chained "
    "aggregations, both keyed by doc_id, so the token-count aggregate "
    "and the per-doc reduce share one shuffle (Catalyst reuses the "
    "hash partitioning on the common prefix key). Entropy uses the "
    "exact integer counts: H = log2(N) - sum(c*log2 c)/N — one "
    "float reduction at the end, not a running float sum per row.",
)
def word_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_TOKENS(F.col("text"))).alias("token"))
    cnt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("long")
    return cnt.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log2(n.cast("double"))
            - F.sum(F.col("c") * F.log2(F.col("c").cast("double"))) / n.cast("double"),
            6,
        ).alias("word_entropy"),
        F.round(F.count(F.lit(1)) / n.cast("double"), 6).alias("type_token_ratio"),
    )


@register(
    "unigram_logprob_score",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents
    ),
    lm AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM lm)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(LOG2(CAST(MAX(tot.total) AS DOUBLE))
                 - AVG(LOG2(CAST(l.tf AS DOUBLE))), 6) AS avg_neg_logprob
    FROM tok t JOIN lm l ON t.token = l.token CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    doc="Unigram-LM cross-entropy per document (CCNet-style perplexity "
    "proxy): average -log2 p(token) under the corpus's own unigram "
    "model. High scores = out-of-distribution/noise docs. Scale path: "
    "the LM table is vocabulary-sized (millions of rows at 100 TB, "
    "still ~100 MB) — it broadcast-joins back onto the exploded token "
    "stream, so the only fact-sized shuffle is the final per-doc "
    "aggregate; -log2 p factors into log2(total) - avg(log2 tf) so "
    "the scalar total joins as a one-row broadcast, not a per-row "
    "division.",
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_TOKENS(F.col("text"))).alias("token"))
    lm = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    # total token count straight off the token stream: a map-side
    # partial count + one single-partition exchange of 32 rows —
    # NOT sum(lm.tf), which would re-aggregate the token-keyed subtree
    # a second time (the broadcast consumer blocks subtree reuse).
    tot = tok.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        tok.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.log2(F.max("total").cast("double"))
                - F.avg(F.log2(F.col("tf").cast("double"))),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


@register(
    "source_mixing_sample",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source, n_chars,
             CASE CAST(SUBSTR(source, 4) AS INTEGER) % 4
               WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250 ELSE 125
             END AS mix_permille,
             ((doc_id * 2654435761) % 4294967296) % 1000 AS slot
      FROM documents
    )
    SELECT source, mix_permille,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE slot < mix_permille) AS n_selected,
           CAST(COALESCE(SUM(n_chars) FILTER (WHERE slot < mix_permille), 0)
                AS BIGINT) AS selected_chars
    FROM weighted
    GROUP BY source, mix_permille
    """,
    doc="Deterministic weighted source mixing: each source gets a "
    "per-mille sampling rate (the data-recipe weight) and a document "
    "is kept iff its Knuth-multiplicative-hash slot falls under the "
    "rate — reproducible across runs, engines, and partitionings, "
    "unlike df.sample(). Pure BIGINT arithmetic inside the scan "
    "stage; one narrow aggregate by source. At 100 TB this is the "
    "map-only pre-pass that materializes a training mix without a "
    "global shuffle or an RNG seed dependency on partition layout.",
)
def source_mixing_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    rate = (
        F.when(F.substring("source", 4, 10).cast("int") % 4 == 0, 1000)
        .when(F.substring("source", 4, 10).cast("int") % 4 == 1, 500)
        .when(F.substring("source", 4, 10).cast("int") % 4 == 2, 250)
        .otherwise(125)
    )
    slot = F.pmod(F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)), F.lit(1000))
    sel = F.col("slot") < F.col("mix_permille")
    return (
        docs.select(
            "source",
            "n_chars",
            rate.alias("mix_permille"),
            slot.alias("slot"),
        )
        .groupBy("source", "mix_permille")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(sel, 1)).alias("n_selected"),
            F.coalesce(F.sum(F.when(sel, F.col("n_chars"))), F.lit(0))
            .cast("long")
            .alias("selected_chars"),
        )
    )


@register(
    "length_bucket_histogram",
    oracle=rf"""
    WITH t AS (
      SELECT source,
             len({_DUCK_TOKENS}) AS n_tokens,
             n_chars
      FROM documents
    )
    SELECT source,
           CASE WHEN n_tokens < 16 THEN 0 WHEN n_tokens < 32 THEN 1
                WHEN n_tokens < 64 THEN 2 WHEN n_tokens < 128 THEN 3
                WHEN n_tokens < 256 THEN 4 ELSE 5 END AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM t
    GROUP BY source, len_bucket
    """,
    doc="Token-length histogram per source on power-of-two buckets — "
    "the input stats a sequence-packing stage (sequence_packing) "
    "needs to pick its chunk length and predict padding waste. "
    "Buckets are integer CASE ladders, not floor(log2(n)) (float log2 "
    "at exact powers of two differs between engines by one ulp). "
    "Map-side combinable count/sum; one narrow shuffle.",
)
def length_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(_TOKENS(F.col("text")))
    bucket = (
        F.when(n_tokens < 16, 0)
        .when(n_tokens < 32, 1)
        .when(n_tokens < 64, 2)
        .when(n_tokens < 128, 3)
        .when(n_tokens < 256, 4)
        .otherwise(5)
    )
    return (
        docs.select(
            "source",
            bucket.alias("len_bucket"),
            n_tokens.alias("n_tokens"),
            "n_chars",
        )
        .groupBy("source", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


@register(
    "bigram_logprob_score",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, t[k] AS w1, t[k+1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(k)
      WHERE len(t) >= 2
    ),
    lm2 AS (SELECT w1, w2, COUNT(*) AS tf2 FROM bg GROUP BY w1, w2),
    lm1 AS (SELECT w1, CAST(SUM(tf2) AS BIGINT) AS tf1 FROM lm2 GROUP BY w1)
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(LOG2(CAST(l1.tf1 AS DOUBLE))
                     - LOG2(CAST(l2.tf2 AS DOUBLE))), 6) AS avg_neg_logprob
    FROM bg b
    JOIN lm2 l2 ON b.w1 = l2.w1 AND b.w2 = l2.w2
    JOIN lm1 l1 ON b.w1 = l1.w1
    GROUP BY b.doc_id
    """,
    doc="Bigram-LM cross-entropy per document: average "
    "-log2 p(w2|w1) with p = count(w1 w2)/count(w1 *) under the "
    "corpus's own bigram model — one Markov order beyond "
    "unigram_logprob_score, the cheapest perplexity proxy that "
    "penalizes scrambled word ORDER, not just rare words. Scale "
    "shape: both LM tables are vocabulary-sized and broadcast back "
    "onto the exploded bigram stream; the only fact-sized shuffles "
    "are the bigram count and the final per-doc aggregate. Docs "
    "shorter than 2 tokens have no bigrams and drop out on both "
    "engines.",
)
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _TOKENS(F.col("text")).alias("t")
    )
    n = F.size("t")
    pairs = docs.filter(n >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, n - 1),
                F.slice(F.col("t"), 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    lm2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("tf2"))
    lm1 = lm2.groupBy("w1").agg(F.sum("tf2").cast("long").alias("tf1"))
    return (
        pairs.join(F.broadcast(lm2), ["w1", "w2"])
        .join(F.broadcast(lm1), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log2(F.col("tf1").cast("double"))
                    - F.log2(F.col("tf2").cast("double"))
                ),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


#: temperature-mix token budget (tokens to allocate across sources)
MIX_BUDGET = 1_000_000


@register(
    "temperature_mix_allocation",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(
                 regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                 x -> x <> '')) AS token
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok GROUP BY source),
    -- alpha = 0.5 smoothing: sqrt is correctly rounded in IEEE-754, and
    -- the weight is quantized to integer micro-units BEFORE any sum, so
    -- the total is an exact BIGINT on both engines
    w AS (
      SELECT source, n_tokens,
             CAST(FLOOR(1000000 * sqrt(CAST(n_tokens AS DOUBLE)) + 0.5) AS BIGINT)
               AS wq
      FROM n
    ),
    t AS (SELECT CAST(SUM(wq) AS BIGINT) AS tw, COUNT(*) AS n_src FROM w),
    base AS (
      SELECT w.source, w.n_tokens, w.wq, t.tw,
             ({MIX_BUDGET} * w.wq) // t.tw AS floor_alloc,
             ({MIX_BUDGET} * w.wq) % t.tw AS rem
      FROM w CROSS JOIN t
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
             {MIX_BUDGET} - SUM(floor_alloc) OVER () AS leftover
      FROM base
    )
    SELECT source, n_tokens,
           CAST(FLOOR(1000000.0 * wq / tw + 0.5) AS BIGINT) AS weight_ppm,
           CAST(floor_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS budget_tokens
    FROM ranked
    """,
    doc="Temperature-scaled mixing allocation (the multilingual-LM "
    "data recipe, Lample & Conneau 2019): per-source sampling weights "
    "p_i = n_i^alpha / sum n_j^alpha with alpha=0.5, then an integer "
    "token budget apportioned by largest remainder (Hamilton), so the "
    "allocations are exact integers summing EXACTLY to the budget — "
    "the number a downstream per-source sampler (weighted_sample_per_"
    "source) consumes directly. Cross-engine exactness: sqrt is "
    "correctly rounded in IEEE-754 and weights quantize to micro-units "
    "BEFORE summation, so every later quantity is integer arithmetic; "
    "ties in the remainder ranking break on source. Scale shape: one "
    "corpus-sized token count (map-side combined); everything after "
    "lives on the source-cardinality relation (a window over ~20 "
    "rows). Complements source_mixing_sample (fixed per-source rates) "
    "with the rate-SETTING step computed from the corpus itself.",
)
def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import tokens_expr

    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    n = (
        docs.select("source", F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    return mix_allocation_from_counts(n)


def mix_allocation_from_counts(n: DataFrame) -> DataFrame:
    """Temperature-scaled allocation from a (source, n_tokens) count
    relation — the sufficient statistic is one additive counter per
    source, so the streaming monitor (streaming/mixing.py) maintains
    the counts and re-derives the allocation at read time."""
    from pyspark.sql.window import Window as W

    w = n.select(
        "source",
        "n_tokens",
        F.floor(F.lit(1000000) * F.sqrt(F.col("n_tokens").cast("double")) + F.lit(0.5))
        .cast("bigint")
        .alias("wq"),
    )
    t = w.agg(F.sum("wq").cast("bigint").alias("tw"))
    base = w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tokens",
        "wq",
        "tw",
        (F.lit(MIX_BUDGET) * F.col("wq")).alias("q"),
    ).select(
        "source",
        "n_tokens",
        "wq",
        "tw",
        F.expr("q DIV tw").alias("floor_alloc"),
        F.pmod("q", "tw").alias("rem"),
    )
    wr = W.orderBy(F.col("rem").desc(), "source")
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = base.withColumn("rr", F.row_number().over(wr)).withColumn(
        "leftover", F.lit(MIX_BUDGET) - F.sum("floor_alloc").over(wall)
    )
    return ranked.select(
        "source",
        "n_tokens",
        F.floor(F.lit(1000000.0) * F.col("wq") / F.col("tw") + F.lit(0.5))
        .cast("bigint")
        .alias("weight_ppm"),
        (
            F.col("floor_alloc")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("budget_tokens"),
    )


#: micro-nat quantization for per-bigram LM costs (same idiom as the
#: NB classifier: round per TERM, sum exact BIGINTs — order-invariant)
PPL_MICRO = 1_000_000


@register(
    "ccnet_perplexity_buckets",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang, {_DUCK_TOKENS} AS t FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
    ),
    bg AS (
      SELECT doc_id, lang, t[k] AS w1, t[k+1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(k)
      WHERE len(t) >= 2
    ),
    lm2 AS (SELECT w1, w2, COUNT(*) AS tf2 FROM bg GROUP BY w1, w2),
    lm1 AS (SELECT w1, CAST(SUM(tf2) AS BIGINT) AS tf1 FROM lm2 GROUP BY w1),
    perdoc AS (
      SELECT b.doc_id, b.lang,
             CAST(FLOOR(
               CAST(SUM(CAST(FLOOR({PPL_MICRO} *
                      LN(CAST(l1.tf1 AS DOUBLE) / CAST(l2.tf2 AS DOUBLE))
                    + 0.5) AS BIGINT)) AS DOUBLE)
               / COUNT(*) + 0.5) AS BIGINT) AS score_micro
      FROM bg b
      JOIN lm2 l2 ON b.w1 = l2.w1 AND b.w2 = l2.w2
      JOIN lm1 l1 ON b.w1 = l1.w1
      GROUP BY b.doc_id, b.lang
    ),
    per_score AS (
      SELECT lang, score_micro, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM perdoc GROUP BY lang, score_micro
    ),
    cum AS (
      SELECT lang, score_micro, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY lang ORDER BY score_micro
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             SUM(cnt) OVER (PARTITION BY lang) AS n
      FROM per_score
    ),
    bucketed AS (
      SELECT lang, score_micro, cnt,
             1 + (below * 3) // n AS bucket
      FROM cum
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           MIN(score_micro) AS lo_micro,
           MAX(score_micro) AS hi_micro,
           CAST(FLOOR(CAST(SUM(score_micro * cnt) AS DOUBLE)
                      / SUM(cnt) + 0.5) AS BIGINT) AS avg_micro
    FROM bucketed GROUP BY lang, bucket
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): "
    "per-language head/middle/tail terciles of documents by LM "
    "cross-entropy under the corpus's own bigram model — the recipe "
    "CCNet uses to keep the head (lowest perplexity) of each "
    "language and drop or downweight the tail. Exactness: per-bigram "
    "costs quantize to micro-nats BEFORE summation (the NB-classifier "
    "idiom — LN of one IEEE division of exact counts, floored once), "
    "so per-doc scores are exact BIGINTs; tercile boundaries derive "
    "from the DISTINCT-score relation per language (bucket = "
    "1 + 3*|docs strictly below|/n, all integer), so ties land in one "
    "bucket deterministically and there is NO corpus-sized sort — the "
    "window runs over distinct scores only, unlike a literal NTILE. "
    "Scale shape: vocabulary-sized LM tables broadcast onto the "
    "bigram stream; corpus-sized shuffles are the bigram count and "
    "the per-doc aggregate; everything after is distinct-score-sized. "
    "Output: per (lang, bucket) doc counts and score-boundary "
    "summary — the cut table a CCNet-style filter applies.",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    t = _TOKENS(F.col("text"))
    n = F.size("t")
    pairs = (
        docs.select("doc_id", "lang", t.alias("t"))
        .filter(n >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.zip_with(
                    F.slice(F.col("t"), 1, n - 1),
                    F.slice(F.col("t"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        # feeds the lm2 count AND the per-doc scoring join; lm2 comes
        # back as a broadcast, so no exchange reuse — without this the
        # bigram explode runs twice (r12)
        .localCheckpoint(eager=False)
    )
    lm2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("tf2"))
    lm1 = lm2.groupBy("w1").agg(F.sum("tf2").cast("long").alias("tf1"))
    cost = F.floor(
        F.lit(PPL_MICRO)
        * F.log(F.col("tf1").cast("double") / F.col("tf2").cast("double"))
        + F.lit(0.5)
    ).cast("bigint")
    perdoc = (
        pairs.join(F.broadcast(lm2), ["w1", "w2"])
        .join(F.broadcast(lm1), "w1")
        .groupBy("doc_id", "lang")
        .agg(
            F.floor(
                F.sum(cost).cast("double") / F.count(F.lit(1)) + F.lit(0.5)
            )
            .cast("bigint")
            .alias("score_micro")
        )
    )
    per_score = perdoc.groupBy("lang", "score_micro").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    from pyspark.sql.window import Window as W

    below_w = (
        W.partitionBy("lang")
        .orderBy("score_micro")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    tot_w = W.partitionBy("lang")
    cum = per_score.select(
        "lang",
        "score_micro",
        "cnt",
        F.coalesce(F.sum("cnt").over(below_w), F.lit(0)).alias("below"),
        F.sum("cnt").over(tot_w).alias("n"),
    )
    bucketed = cum.select(
        "lang",
        "score_micro",
        "cnt",
        (F.lit(1) + F.expr("(below * 3) div n")).cast("bigint").alias("bucket"),
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.min("score_micro").alias("lo_micro"),
        F.max("score_micro").alias("hi_micro"),
        F.floor(
            F.sum(F.col("score_micro") * F.col("cnt")).cast("double")
            / F.sum("cnt")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("avg_micro"),
    )
