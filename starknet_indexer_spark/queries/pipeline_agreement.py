"""Classifier-agreement audits: Cohen's kappa and per-class F1 of the
heuristic language-ID against gold labels.

A curation pipeline that routes documents by a cheap classifier
(language ID, quality filter) needs more than raw accuracy before
trusting the routing: accuracy is inflated by class imbalance (a
filter predicting the majority language everywhere scores high while
carrying zero signal). Cohen's kappa corrects agreement by the chance
agreement implied by both marginals — the acceptance number alongside
knn_label_agreement (embedding-space signal) and filter_auc_by_lang
(score calibration). Per-class F1 localizes WHICH classes the router
fails on.

Exactness: both metrics derive from the confusion relation (one
map-side-combined corpus aggregate; everything after lives on a
<=K^2-row relation). Counts are BIGINTs; each metric takes ONE
ppm-flooring at the end, so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline_text import _lang_id_oracle, lang_id
from .registry import register


def _confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, pred_lang, c) — the one corpus-sized pass; both metrics
    derive from this tiny relation."""
    return (
        lang_id(spark, sf_dir)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


@register(
    "langid_cohens_kappa",
    oracle=f"""
    WITH pred AS ({_lang_id_oracle()}),
    conf AS (
      SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM pred GROUP BY 1, 2
    ),
    tot AS (
      SELECT SUM(c) AS n,
             SUM(CASE WHEN lang = pred_lang THEN c ELSE 0 END) AS agree
      FROM conf
    ),
    rowm AS (SELECT lang AS cls, SUM(c) AS r FROM conf GROUP BY 1),
    colm AS (SELECT pred_lang AS cls, SUM(c) AS p FROM conf GROUP BY 1),
    pe AS (
      SELECT SUM(COALESCE(r.r, 0) * COALESCE(p.p, 0)) AS pe_num
      FROM rowm r FULL OUTER JOIN colm p USING (cls)
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(t.agree AS BIGINT) AS n_agree,
           CAST(FLOOR(1000000.0 * t.agree / t.n + 0.5) AS BIGINT)
             AS accuracy_ppm,
           CAST(FLOOR(1000000.0 * pe.pe_num / (t.n * t.n) + 0.5) AS BIGINT)
             AS chance_ppm,
           CAST(FLOOR(1000000.0 * (t.n * t.agree - pe.pe_num)
                      / GREATEST(t.n * t.n - pe.pe_num, 1) + 0.5) AS BIGINT)
             AS kappa_ppm
    FROM tot t, pe
    """,
    doc="Cohen's kappa of the heuristic language-ID against gold "
    "labels: kappa = (p_o - p_e) / (1 - p_e) with chance agreement "
    "p_e = sum_c (gold marginal_c * predicted marginal_c) / n^2 — the "
    "imbalance-corrected agreement a routing decision should gate on "
    "(raw accuracy rewards majority-class collapse; kappa ~0 exposes "
    "it). Multiplied out to exact integers: kappa_ppm = "
    "FLOOR(1e6 * (n*agree - pe_num) / (n^2 - pe_num) + 0.5), one "
    "rounding, BIGINT everywhere. Scale shape: one map-side-combined "
    "groupBy(lang, pred_lang) over the corpus; marginals, the chance "
    "term, and the ratio all live on the <=K^2 confusion relation.",
)
def langid_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    conf = _confusion(spark, sf_dir).localCheckpoint(eager=False)
    tot = conf.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("lang") == F.col("pred_lang"), F.col("c")).otherwise(0)).alias(
            "agree"
        ),
    )
    rowm = conf.groupBy(F.col("lang").alias("cls")).agg(F.sum("c").alias("r"))
    colm = conf.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("c").alias("p")
    )
    pe = (
        rowm.join(colm, "cls", "full_outer")
        .select(
            (
                F.coalesce(F.col("r"), F.lit(0))
                * F.coalesce(F.col("p"), F.lit(0))
            ).alias("rp")
        )
        .agg(F.sum("rp").alias("pe_num"))
    )
    return tot.crossJoin(pe).select(
        F.col("n").cast("bigint").alias("n"),
        F.col("agree").cast("bigint").alias("n_agree"),
        F.floor(F.lit(1000000.0) * F.col("agree") / F.col("n") + F.lit(0.5))
        .cast("bigint")
        .alias("accuracy_ppm"),
        F.floor(
            F.lit(1000000.0) * F.col("pe_num") / (F.col("n") * F.col("n"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("chance_ppm"),
        F.floor(
            F.lit(1000000.0)
            * (F.col("n") * F.col("agree") - F.col("pe_num"))
            / F.greatest(
                F.col("n") * F.col("n") - F.col("pe_num"), F.lit(1)
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("kappa_ppm"),
    )


@register(
    "langid_class_f1",
    oracle=f"""
    WITH pred AS ({_lang_id_oracle()}),
    conf AS (
      SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM pred GROUP BY 1, 2
    ),
    rowm AS (SELECT lang AS cls, SUM(c) AS gold_n FROM conf GROUP BY 1),
    colm AS (SELECT pred_lang AS cls, SUM(c) AS pred_n FROM conf GROUP BY 1),
    tp AS (
      SELECT lang AS cls, SUM(c) AS tp FROM conf
      WHERE lang = pred_lang GROUP BY 1
    )
    SELECT r.cls AS lang,
           CAST(r.gold_n AS BIGINT) AS gold_n,
           CAST(COALESCE(p.pred_n, 0) AS BIGINT) AS pred_n,
           CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
           CAST(FLOOR(1000000.0 * 2 * COALESCE(t.tp, 0)
                      / GREATEST(r.gold_n + COALESCE(p.pred_n, 0), 1) + 0.5)
                AS BIGINT) AS f1_ppm
    FROM rowm r
    LEFT JOIN colm p ON p.cls = r.cls
    LEFT JOIN tp t ON t.cls = r.cls
    """,
    doc="Per-class F1 of the language-ID heuristic against gold "
    "labels, localizing WHICH languages the router fails on (the "
    "companion relation to langid_cohens_kappa's single number). "
    "F1 = 2*tp / (gold_n + pred_n) — the harmonic mean in its "
    "denominators-multiplied-out integer form, one ppm flooring per "
    "class. One row per GOLD class (a class the heuristic never "
    "predicts still appears, with pred_n folded as 0). Same scale "
    "shape as the kappa: one corpus confusion aggregate, everything "
    "else on the K^2 relation.",
)
def langid_class_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    conf = _confusion(spark, sf_dir).localCheckpoint(eager=False)
    rowm = conf.groupBy(F.col("lang").alias("cls")).agg(
        F.sum("c").alias("gold_n")
    )
    colm = conf.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("c").alias("pred_n")
    )
    tp = (
        conf.filter(F.col("lang") == F.col("pred_lang"))
        .groupBy(F.col("lang").alias("cls"))
        .agg(F.sum("c").alias("tp"))
    )
    return (
        rowm.join(colm, "cls", "left")
        .join(tp, "cls", "left")
        .select(
            F.col("cls").alias("lang"),
            F.col("gold_n").cast("bigint").alias("gold_n"),
            F.coalesce(F.col("pred_n"), F.lit(0)).cast("bigint").alias("pred_n"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
            F.floor(
                F.lit(1000000.0)
                * 2
                * F.coalesce(F.col("tp"), F.lit(0))
                / F.greatest(
                    F.col("gold_n") + F.coalesce(F.col("pred_n"), F.lit(0)),
                    F.lit(1),
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("f1_ppm"),
        )
    )
