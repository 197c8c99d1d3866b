"""Filter-score calibration: exact isotonic regression (PAV) over
binned scores.

Completes the learned-filter calibration family
(``pipeline_classifier``): AUC says whether a score separates the
positive class at all, the precision/recall curve says where to put a
keep/drop threshold, and ISOTONIC REGRESSION turns the raw score into
a calibrated keep-probability — the standard monotone calibrator
(Zadrozny & Elkan, KDD'02) a data team fits before using a quality
classifier's score as a sampling weight rather than a hard cutoff.

Exactness strategy: the pool-adjacent-violators solution has a closed
minimax form — for ordered bins ``i``,

    iso(i) = max_{j<=i} min_{k>=i} weighted_mean(y[j..k])

so instead of the sequential stack algorithm (driver-side, not a
Spark plan) the fit is expressed declaratively: scores are bucketed
into at most ``ISO_BINS`` equal-width integer bins, per-bin (weight,
positives) aggregate exactly, and the j<=k grid over PRESENT bins
(<= ISO_BINS^2 = 65k rows — bin-relation-sized, never corpus-sized)
computes every interval mean from BIGINT prefix sums. Interval means
are single IEEE divisions of exact integers, so Spark and DuckDB
produce bit-identical doubles; MIN/MAX over identical doubles are
identical; ppm rounding happens once at the end.

Scale shape: one corpus-sized doc-score aggregation (the same
map-side-combined pass every calibration query makes), a 2-row
min/max broadcast, a per-bin aggregate, then ALL remaining work —
grid, suffix-min window, final max — lives on bin-count-sized
relations. At 100 TB only the first aggregation touches the corpus.

Reference scope note: the reference indexer (EkuboProtocol/
starknet-indexer) has no ML-calibration surface; this module is part
of the beyond-reference training-data pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import tokens_expr
from .pipeline_classifier import MICRO, PR_POS_LANG
from .registry import register

#: maximum number of equal-width score bins for the isotonic fit
ISO_BINS = 256

_ISO_SCORED_SQL = f"""
    SELECT doc_id,
           (lang = '{PR_POS_LANG}')::INT AS y,
           CAST(FLOOR({MICRO} * CAST(SUM(length(token)) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS score
    FROM (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(
                 regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                 x -> x <> '')) AS token
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
    )
    GROUP BY doc_id, lang
"""


_ISO_ORACLE = f"""
    WITH scored AS ({_ISO_SCORED_SQL}),
    ext AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM scored),
    binned AS (
      SELECT ((score - lo) * {ISO_BINS}) // (hi - lo + 1) AS bin, y
      FROM scored CROSS JOIN ext
    ),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS w,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM binned GROUP BY bin
    ),
    pre AS (
      SELECT bin, w, pos,
             SUM(w) OVER (ORDER BY bin) AS cw,
             SUM(pos) OVER (ORDER BY bin) AS cp
      FROM bins
    ),
    -- interval mean over [j..k] from exact prefix sums: one IEEE
    -- division of BIGINTs -> bit-identical across engines
    grid AS (
      SELECT j.bin AS jb, k.bin AS kb,
             CAST(k.cp - j.cp + j.pos AS DOUBLE)
               / CAST(k.cw - j.cw + j.w AS DOUBLE) AS m
      FROM pre j JOIN pre k ON j.bin <= k.bin
    ),
    -- smn(j, i) = min over k >= i of mean(j..k)
    smn AS (
      SELECT jb, kb AS ib,
             MIN(m) OVER (PARTITION BY jb ORDER BY kb DESC) AS mn
      FROM grid
    ),
    iso AS (
      SELECT ib AS bin, MAX(mn) AS iso
      FROM smn WHERE jb <= ib GROUP BY ib
    )
    SELECT b.bin, b.w AS n_docs, b.pos AS n_pos,
           CAST(FLOOR(1000000.0 * b.pos / b.w + 0.5) AS BIGINT) AS rate_ppm,
           CAST(FLOOR(1000000.0 * i.iso + 0.5) AS BIGINT) AS iso_ppm
    FROM bins b JOIN iso i ON i.bin = b.bin
    """


def doc_scores(docs: DataFrame) -> DataFrame:
    """(y, score): per-doc binary label (lang == PR_POS_LANG) and the
    mean-token-length score in micro units — the scored relation every
    calibration consumer (batch query, streaming state) derives from."""
    tok = docs.filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    ).select(
        "doc_id", "lang", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    return tok.groupBy("doc_id", "lang").agg(
        F.floor(
            F.lit(MICRO)
            * F.sum(F.length("token")).cast("double")
            / F.count(F.lit(1)).cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("score")
    ).select((F.col("lang") == PR_POS_LANG).cast("int").alias("y"), "score")


def score_counts(scored: DataFrame) -> DataFrame:
    """(score, w, pos): the DISTINCT-score sufficient statistic for the
    isotonic fit — purely additive, so it is also the streaming state
    shape (streaming/calibration.py)."""
    return scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sum("y").cast("bigint").alias("pos"),
    )


def isotonic_fit_from_score_counts(counts: DataFrame) -> DataFrame:
    """The binning + minimax-PAV plan over a (score, w, pos) relation
    — everything here is distinct-score- or bin-relation-sized."""
    ext = counts.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    binned = counts.crossJoin(F.broadcast(ext)).select(
        ((F.col("score") - F.col("lo")) * ISO_BINS).cast("bigint").alias("num"),
        (F.col("hi") - F.col("lo") + 1).alias("den"),
        "w",
        "pos",
    ).select(F.expr("num div den").alias("bin"), "w", "pos")
    bins = binned.groupBy("bin").agg(
        F.sum("w").cast("bigint").alias("w"),
        F.sum("pos").cast("bigint").alias("pos"),
    )
    # everything below is bin-relation-sized (<= ISO_BINS rows, grid
    # <= ISO_BINS^2); materialize once — bins feeds the grid twice
    # (both self-join sides) and the final output join
    bins = bins.localCheckpoint(eager=False)
    cum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "w",
        "pos",
        F.sum("w").over(cum).alias("cw"),
        F.sum("pos").over(cum).alias("cp"),
    )
    j, k = pre.alias("j"), pre.alias("k")
    grid = j.join(k, F.col("j.bin") <= F.col("k.bin")).select(
        F.col("j.bin").alias("jb"),
        F.col("k.bin").alias("kb"),
        (
            (F.col("k.cp") - F.col("j.cp") + F.col("j.pos")).cast("double")
            / (F.col("k.cw") - F.col("j.cw") + F.col("j.w")).cast("double")
        ).alias("m"),
    )
    sfx = W.partitionBy("jb").orderBy(F.col("kb").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    smn = grid.select(
        "jb", F.col("kb").alias("ib"), F.min("m").over(sfx).alias("mn")
    )
    iso = (
        smn.filter(F.col("jb") <= F.col("ib"))
        .groupBy(F.col("ib").alias("bin"))
        .agg(F.max("mn").alias("iso"))
    )
    return bins.join(iso, "bin").select(
        "bin",
        F.col("w").alias("n_docs"),
        F.col("pos").alias("n_pos"),
        F.floor(F.lit(1000000.0) * F.col("pos") / F.col("w") + F.lit(0.5))
        .cast("bigint")
        .alias("rate_ppm"),
        F.floor(F.lit(1000000.0) * F.col("iso") + F.lit(0.5))
        .cast("bigint")
        .alias("iso_ppm"),
    )


@register(
    "isotonic_calibration",
    oracle=_ISO_ORACLE,
    doc="Exact isotonic calibration (pool-adjacent-violators) of a "
    "filter score against the positive class: scores (mean token "
    f"length, the score filter_auc_by_lang audits) bucket into "
    f"<= {ISO_BINS} equal-width bins, and each bin's calibrated "
    "keep-probability is the PAV fit of the per-bin positive rates — "
    "computed through the closed minimax form iso(i) = max_{{j<=i}} "
    "min_{{k>=i}} wmean(y[j..k]) on the bin grid, so the whole fit is "
    "a declarative plan (no sequential driver-side stack). Interval "
    "means divide exact BIGINT prefix sums once, making every double "
    "bit-identical across engines; output ppm rounds once. Scale "
    "shape: one corpus doc-score pass; grid/windows live on "
    "bin-sized relations (<= 65k rows at any corpus size); the "
    "per-score sufficient statistic (score_counts) is additive and "
    "doubles as the streaming state (streaming/calibration.py). "
    "tests/test_pipeline_classifier.py pins the minimax plan against "
    "a pure-Python stack PAV and the monotonicity invariant.",
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return isotonic_fit_from_score_counts(score_counts(doc_scores(docs)))
