"""Supervised classifier / filter-calibration operators over ``documents``.

The filtering stage of a production pretraining pipeline is usually a
LEARNED model, not just heuristics: CCNet filters with a fastText
language/quality classifier, DCLM and FineWeb-Edu with trained quality
classifiers. The trainable core of that family — a multinomial model
over hashed token features — is counting, so it expresses exactly as
aggregations, stays integer-exact in micro-nats (per-feature rounding
makes every later sum order-invariant), and carries a full value-hash
oracle. Alongside the model sits the calibration op every learned
filter needs: an EXACT AUC (Mann-Whitney rank form) measuring how well
a score separates a label — the precision knob a data team turns
before setting a filter threshold.

Scale shape (both queries): corpus-sized work is one token pass with
map-side combine; everything after lives on vocabulary-sized or
doc-sized relations; model weights broadcast. At 100 TB the trainer
runs on a labeled sample and the frozen weight table broadcast-scores
the full corpus — the same split ensure_ivfpq_codebooks makes for ANN
codebooks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import md5_hash60_expr, tokens_expr
from .registry import register

#: hashed-vocabulary buckets for the NB feature space (small enough
#: that the per-class weight table broadcasts: NB_FEATURES x n_classes)
NB_FEATURES = 4096
MICRO = 1_000_000

_NB_TOKS_SQL = r"""
    SELECT doc_id, lang,
           unnest(list_filter(string_split_regex(
               regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
               x -> x <> '')) AS token
    FROM documents
    WHERE text IS NOT NULL AND lang IS NOT NULL
"""


@register(
    "nb_lang_classifier",
    oracle=f"""
    WITH tok AS ({_NB_TOKS_SQL}),
    feat AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(token), 1, 15))::BIGINT % {NB_FEATURES} AS f
      FROM tok
    ),
    docf AS (SELECT doc_id, lang, f, COUNT(*) AS tf FROM feat GROUP BY 1, 2, 3),
    classes AS (
      SELECT lang AS c, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tok
      FROM feat GROUP BY lang
    ),
    tot AS (SELECT SUM(n_docs) AS n FROM classes),
    cf AS (SELECT lang AS c, f, COUNT(*) AS cnt FROM feat GROUP BY 1, 2),
    w AS (
      SELECT d.f, cl.c,
             CAST(FLOOR({MICRO} * LN(CAST(COALESCE(cf.cnt, 0) + 1 AS DOUBLE)
                   / CAST(cl.n_tok + {NB_FEATURES} AS DOUBLE)) + 0.5) AS BIGINT)
               AS w_micro
      FROM (SELECT DISTINCT f FROM feat) d
      CROSS JOIN classes cl
      LEFT JOIN cf ON cf.f = d.f AND cf.c = cl.c
    ),
    prior AS (
      SELECT c, CAST(FLOOR({MICRO} * LN(CAST(n_docs AS DOUBLE)
                     / CAST(tot.n AS DOUBLE)) + 0.5) AS BIGINT) AS p_micro
      FROM classes CROSS JOIN tot
    ),
    score AS (
      SELECT df.doc_id, df.lang, w.c,
             MAX(prior.p_micro) + CAST(SUM(df.tf * w.w_micro) AS BIGINT)
               AS s_micro
      FROM docf df JOIN w ON w.f = df.f JOIN prior ON prior.c = w.c
      GROUP BY df.doc_id, df.lang, w.c
    ),
    pred AS (
      SELECT doc_id, lang, c AS predicted FROM (
        SELECT doc_id, lang, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY s_micro DESC, c) AS rn
        FROM score
      ) WHERE rn = 1
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY lang, predicted
    """,
    doc="Multinomial Naive Bayes language classifier trained and "
    "evaluated on the corpus (the trainable core of the "
    "CCNet/fastText-style learned-filter family): hashed token "
    "features (4096 buckets), add-one-smoothed per-class token "
    "likelihoods and doc-count priors in integer micro-nats (rounded "
    "per FEATURE, so per-doc score sums are order-invariant exact "
    "BIGINTs), argmax posterior with deterministic ties (score desc, "
    "class asc), output = the confusion matrix. Scale shape: one "
    "corpus token pass (map-side combined) trains the model; the "
    "weight table (features x classes) broadcast-joins back onto the "
    "per-doc feature counts, so scoring never shuffles the corpus by "
    "anything but doc_id. At deployment the trainer runs on a labeled "
    "sample and the frozen broadcast weights score everything. "
    "Measured honesty note: the synthetic corpus draws lang labels "
    "independently of text (filter_auc_by_lang reads ~0.5), so here "
    "the posterior correctly collapses to the majority prior; "
    "tests/test_pipeline_classifier.py plants class-specific "
    "vocabulary and pins a diagonal confusion matrix when signal "
    "exists, plus a pure-Python mirror of the exact integer math.",
)
def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # one materialization each (r12): feat (tokenize+hash per token)
    # feeds the two count aggregates AND the scoring docf — 3 full
    # re-derivations without the checkpoint; counts (vocab-sized)
    # feeds classes + the weight grid. The streaming maintainer path
    # (stream-held counts) is untouched.
    feat = nb_features(docs).localCheckpoint(eager=False)
    counts = nb_count_partials(feat).localCheckpoint(eager=False)
    return nb_confusion_from_counts(counts, feat)


#: sentinel feature id carrying per-class DOC counts in the unified
#: (c, f, cnt) count relation — token features are always >= 0, and doc
#: counts are additive across disjoint batches, which is what lets the
#: streaming twin (streaming/nb_model.py) maintain the model as ONE
#: mergeable state table
DOC_COUNT_F = -1


def nb_features(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, f) hashed-token feature stream — the one
    definition the batch query and the streaming model maintainer
    share."""
    return (
        docs.filter(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select(
            "doc_id",
            "lang",
            F.explode(tokens_expr(F.col("text"))).alias("token"),
        )
        .select(
            "doc_id",
            "lang",
            (md5_hash60_expr(F.col("token")) % F.lit(NB_FEATURES)).alias("f"),
        )
    )


def nb_count_partials(feat: DataFrame) -> DataFrame:
    """The NB sufficient statistics of a doc batch as ONE additive
    (c, f, cnt) relation: token-feature counts plus DOC_COUNT_F
    sentinel rows with per-class doc counts. Additive because a doc
    lives in exactly one batch — summing partials over any disjoint
    batch split equals the whole-corpus counts (pinned in
    tests/test_streaming_nb.py)."""
    cf = feat.groupBy(F.col("lang").alias("c"), "f").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    nd = feat.groupBy(F.col("lang").alias("c")).agg(
        F.countDistinct("doc_id").cast("bigint").alias("cnt")
    ).select("c", F.lit(DOC_COUNT_F).cast("bigint").alias("f"), "cnt")
    return cf.unionByName(nd)


def nb_confusion_from_counts(counts: DataFrame, feat: DataFrame) -> DataFrame:
    """Train (weights + priors) from the (c, f, cnt) count relation and
    score the ``feat`` doc stream; returns the confusion matrix. The
    count relation may come from a single batch pass (the registered
    query) or from the stream-maintained model state — identical
    results either way."""
    docf = feat.groupBy("doc_id", "lang", "f").agg(F.count(F.lit(1)).alias("tf"))
    classes = (
        counts.groupBy("c")
        .agg(
            F.sum(F.when(F.col("f") == DOC_COUNT_F, F.col("cnt"))).alias("n_docs"),
            F.sum(F.when(F.col("f") >= 0, F.col("cnt"))).alias("n_tok"),
        )
    )
    tot = classes.agg(F.sum("n_docs").alias("n"))
    cf = counts.filter(F.col("f") >= 0)
    w = (
        cf.select("f")
        .distinct()
        .crossJoin(F.broadcast(classes))
        .join(cf, ["f", "c"], "left")
        .select(
            "f",
            "c",
            F.floor(
                F.lit(MICRO)
                * F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                    / (F.col("n_tok") + NB_FEATURES).cast("double")
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    prior = classes.crossJoin(F.broadcast(tot)).select(
        "c",
        F.floor(
            F.lit(MICRO)
            * F.log(F.col("n_docs").cast("double") / F.col("n").cast("double"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("p_micro"),
    )
    # Features outside the training support (possible only when the
    # scored docs differ from the training stream, e.g. the streaming
    # confusion() path) get the add-one-smoothed zero-count weight
    # ln(1/(n_tok_c + NB_FEATURES)) — the exact value ``w`` carries for
    # a seen-but-zero-count (f, c). An inner join silently dropped them,
    # skewing posteriors toward classes with fewer unseen features
    # (r8 ADVICE).
    w_floor = classes.select(
        "c",
        F.floor(
            F.lit(MICRO)
            * F.log(F.lit(1.0) / (F.col("n_tok") + NB_FEATURES).cast("double"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("w_floor"),
    )
    score = (
        docf.crossJoin(F.broadcast(w_floor))
        .join(F.broadcast(w), ["f", "c"], "left")
        .join(F.broadcast(prior), "c")
        .groupBy("doc_id", "lang", "c")
        .agg(
            (
                F.max("p_micro")
                + F.sum(F.col("tf") * F.coalesce(F.col("w_micro"), F.col("w_floor")))
            )
            .cast("bigint")
            .alias("s_micro")
        )
    )
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("s_micro").desc(), F.col("c"))
    )
    pred = (
        score.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("c").alias("predicted"))
    )
    return pred.groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


@register(
    "filter_auc_by_lang",
    oracle=f"""
    WITH tok AS ({_NB_TOKS_SQL}),
    scored AS (
      SELECT doc_id, lang,
             CAST(FLOOR({MICRO} * CAST(SUM(length(token)) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS score
      FROM tok GROUP BY doc_id, lang
    ),
    srank AS (
      -- 2*avg_rank per distinct score = 2*(docs strictly below) +
      -- (ties at this score) + 1, all integers — ranks computed on the
      -- DISTINCT-score relation, never a corpus-sized window
      SELECT score, cnt,
             2 * COALESCE(SUM(cnt) OVER (ORDER BY score
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) + cnt + 1
               AS two_avg_rank
      FROM (SELECT score, COUNT(*) AS cnt FROM scored GROUP BY score)
    ),
    tot AS (SELECT COUNT(*) AS n FROM scored),
    per_class AS (
      SELECT s.lang,
             CAST(COUNT(*) AS BIGINT) AS n_pos,
             CAST(SUM(r.two_avg_rank) AS BIGINT) AS two_r1
      FROM scored s JOIN srank r ON r.score = s.score
      GROUP BY s.lang
    )
    SELECT lang, n_pos, CAST(tot.n - n_pos AS BIGINT) AS n_neg,
           CAST(FLOOR(
             {MICRO} * CAST(two_r1 - n_pos * (n_pos + 1) AS DOUBLE)
                     / CAST(2 * n_pos * (tot.n - n_pos) AS DOUBLE)
             + 0.5) AS BIGINT) AS auc_ppm
    FROM per_class CROSS JOIN tot
    """,
    doc="Exact one-vs-rest AUC audit (filter calibration): for each "
    "language class, the Mann-Whitney AUC of a per-doc score (mean "
    "token length, micro units) separating that class from the rest — "
    "the machinery a data team runs before thresholding ANY learned "
    "or heuristic quality filter. Exactness: tie-averaged ranks enter "
    "as 2*avg_rank = 2*count_below + ties + 1 (all BIGINT), ranks are "
    "computed on the DISTINCT-score relation (tiny) and broadcast "
    "back, and AUC = (2*R1 - n1(n1+1)) / (2*n1*n0) is rounded once at "
    "the end (FLOOR(x+0.5) ppm). Scale shape: one corpus-sized "
    "doc-score aggregation; the ranking window runs over distinct "
    "scores only — never a global sort of the corpus.",
)
def filter_auc_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    scored = tok.groupBy("doc_id", "lang").agg(
        F.floor(
            F.lit(MICRO)
            * F.sum(F.length("token")).cast("double")
            / F.count(F.lit(1)).cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("score")
    )
    counts = scored.groupBy("score").agg(F.count(F.lit(1)).alias("cnt"))
    wnd = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    srank = counts.select(
        "score",
        (2 * F.coalesce(F.sum("cnt").over(wnd), F.lit(0)) + F.col("cnt") + 1)
        .cast("bigint")
        .alias("two_avg_rank"),
    )
    tot = scored.agg(F.count(F.lit(1)).alias("n"))
    per_class = (
        scored.join(F.broadcast(srank), "score")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pos"),
            F.sum("two_avg_rank").cast("bigint").alias("two_r1"),
        )
    )
    return per_class.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        F.floor(
            F.lit(MICRO)
            * (F.col("two_r1") - F.col("n_pos") * (F.col("n_pos") + 1)).cast(
                "double"
            )
            / (2 * F.col("n_pos") * (F.col("n") - F.col("n_pos"))).cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("auc_ppm"),
    )


#: positive class for the operating-point curve (the corpus's largest)
PR_POS_LANG = "en"


@register(
    "precision_recall_curve",
    oracle=f"""
    WITH tok AS ({_NB_TOKS_SQL}),
    scored AS (
      SELECT doc_id, lang,
             CAST(FLOOR({MICRO} * CAST(SUM(length(token)) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS score
      FROM tok GROUP BY doc_id, lang
    ),
    per_score AS (
      SELECT score,
             CAST(COUNT(*) AS BIGINT) AS n_at,
             CAST(COUNT(*) FILTER (WHERE lang = '{PR_POS_LANG}') AS BIGINT)
               AS pos_at
      FROM scored GROUP BY score
    ),
    tot AS (SELECT CAST(SUM(pos_at) AS BIGINT) AS n_pos FROM per_score),
    cum AS (
      SELECT score,
             SUM(n_at) OVER (ORDER BY score DESC) AS pred_pos,
             SUM(pos_at) OVER (ORDER BY score DESC) AS tp
      FROM per_score
    )
    SELECT score AS threshold,
           CAST(pred_pos AS BIGINT) AS pred_pos,
           CAST(tp AS BIGINT) AS tp,
           CAST(FLOOR(1000000.0 * tp / pred_pos + 0.5) AS BIGINT)
             AS precision_ppm,
           CAST(FLOOR(1000000.0 * tp / tot.n_pos + 0.5) AS BIGINT)
             AS recall_ppm
    FROM cum CROSS JOIN tot
    """,
    doc="Filter operating-point curve: for every distinct score "
    "threshold (mean token length, the same score filter_auc_by_lang "
    "audits), the precision and recall of 'keep iff score >= t' "
    "against the positive class — the table a data team reads to SET "
    "a filter threshold after AUC says the score is usable. Exact: "
    "per-threshold counts are window cumsums over the DISTINCT-score "
    "relation (never a corpus-sized window), ppm rounding once per "
    "output row. Scale shape: one corpus-sized doc-score aggregation, "
    "then everything lives on distinct scores.",
)
def precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    scored = tok.groupBy("doc_id", "lang").agg(
        F.floor(
            F.lit(MICRO)
            * F.sum(F.length("token")).cast("double")
            / F.count(F.lit(1)).cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("score")
    )
    per_score = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at"),
        F.sum(F.when(F.col("lang") == PR_POS_LANG, 1).otherwise(0))
        .cast("bigint")
        .alias("pos_at"),
    )
    tot = per_score.agg(F.sum("pos_at").cast("bigint").alias("n_pos"))
    wnd = W.orderBy(F.col("score").desc()).rowsBetween(W.unboundedPreceding, 0)
    cum = per_score.select(
        F.col("score").alias("threshold"),
        F.sum("n_at").over(wnd).cast("bigint").alias("pred_pos"),
        F.sum("pos_at").over(wnd).cast("bigint").alias("tp"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "pred_pos",
        "tp",
        F.floor(F.lit(1000000.0) * F.col("tp") / F.col("pred_pos") + F.lit(0.5))
        .cast("bigint")
        .alias("precision_ppm"),
        F.floor(F.lit(1000000.0) * F.col("tp") / F.col("n_pos") + F.lit(0.5))
        .cast("bigint")
        .alias("recall_ppm"),
    )
