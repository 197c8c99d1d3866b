"""End-to-end corpus curation: the composed pretraining pipeline.

Every stage of a training-data curation pass exists in this repo as an
individually-verified operator; this module composes them into the
pipeline a data team actually runs, as ONE declarative plan with one
cross-engine oracle — proving the stages compose (same flags, same
dedup graph, same tie-breaks) rather than merely coexist:

    documents
      -> Gopher-style quality gate      (pipeline_corpus, map-only flags)
      -> exact dedup by md5(text)       (keep min doc_id per hash)
      -> near-dup clusters              (MinHash LSH pairs -> connected
                                         components, pipeline_dedup)
      -> representative selection       (min SURVIVING doc_id per cluster)
      -> per-(lang, outcome) accounting

Stage order is the standard one (cheap filters before expensive
dedup); a document is labeled by the FIRST stage that drops it
(quality > exact_dup > near_dup), and near-dup representatives are
chosen among the docs that survived the earlier stages — the detail
that makes composition different from running the stages
independently, and exactly what the oracle mirrors.

Scale shape: the quality gate is map-only flags fused into the scan;
exact dedup is one hash-keyed aggregation; the near-dup graph work
touches only the pair-node relation (never the corpus); the final
accounting is one small groupBy. No stage materializes an
intermediate corpus copy — outcomes are computed as columns and
aggregated once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .pipeline_corpus import (
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    gopher_quality_filter,
)
from .pipeline_dedup import _minhash_oracle, dedup_components
from .registry import register


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                         ' '), x -> x <> '') AS tokens
      FROM documents
    ),
    quality AS (
      SELECT doc_id,
             ((len(tokens) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
              AND (ROUND(CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE)
                         / GREATEST(len(tokens), 1), 6)
                   BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN})
              AND len(list_filter(tokens,
                    x -> list_contains({list(GOPHER_STOPWORDS)!r}, x)))
                  >= {GOPHER_MIN_STOPWORDS}
             ) AS q_keep
      FROM toks
    ),
    pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION ALL
      SELECT b_id AS u, a_id AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach(src, dst) AS (
      SELECT u, u FROM nodes
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
    staged AS (
      SELECT d.doc_id, d.lang, length(d.text) AS n_chars, q.q_keep,
             MIN(CASE WHEN q.q_keep THEN d.doc_id END)
               OVER (PARTITION BY md5(d.text)) AS exact_rep,
             c.component
      FROM documents d
      JOIN quality q ON q.doc_id = d.doc_id
      LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    decided AS (
      SELECT doc_id, lang, n_chars,
             CASE
               WHEN NOT q_keep THEN 'quality'
               WHEN doc_id <> exact_rep THEN 'exact_dup'
               WHEN component IS NOT NULL AND doc_id <> MIN(
                 CASE WHEN q_keep AND doc_id = exact_rep THEN doc_id END)
                 OVER (PARTITION BY component)
                 THEN 'near_dup'
               ELSE 'kept'
             END AS outcome
      FROM staged
    )
    SELECT lang, outcome,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM decided GROUP BY lang, outcome
    """,
    doc="The composed curation pipeline: Gopher quality gate -> exact "
    "dedup (min doc_id per md5(text) among quality survivors) -> "
    "near-dup clusters (MinHash LSH + connected components) with "
    "representatives chosen among docs that survived the earlier "
    "stages -> per-(lang, outcome) accounting. A document is labeled "
    "by the FIRST stage that drops it. Every stage reuses the "
    "already-verified operator (same flags, same pair graph, same "
    "tie-breaks), and the whole composition is one declarative plan "
    "value-hash-checked against a single DuckDB CTE mirror including "
    "the recursive transitive closure. The near-dup pair graph reads "
    "the materialized silver relations (via dedup_components -> "
    "minhash_lsh_dedup_silver) rather than re-shingling the corpus.",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", F.length("text").alias("n_chars")
    )
    quality = gopher_quality_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    comp = dedup_components(spark, sf_dir).select("doc_id", "component")

    staged = (
        docs.join(quality, "doc_id")
        .join(comp, "doc_id", "left")
        .withColumn(
            "exact_rep",
            F.min(F.when(F.col("q_keep"), F.col("doc_id"))).over(
                W.partitionBy(F.md5("text"))
            ),
        )
    )
    near_rep = F.min(
        F.when(F.col("q_keep") & (F.col("doc_id") == F.col("exact_rep")), F.col("doc_id"))
    ).over(W.partitionBy("component"))
    outcome = (
        F.when(~F.col("q_keep"), "quality")
        .when(F.col("doc_id") != F.col("exact_rep"), "exact_dup")
        .when(F.col("component").isNotNull() & (F.col("doc_id") != near_rep), "near_dup")
        .otherwise("kept")
    )
    return (
        staged.select("lang", outcome.alias("outcome"), "n_chars")
        .groupBy("lang", "outcome")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


def _drop_list_oracle() -> str:
    from .pipeline_setjoin import (
        CONTAINMENT_MIN_SET,
        _CT_DEN,
        _CT_NUM,
        _SETJOIN_EX_SQL,
    )

    return f"""
    WITH RECURSIVE {_SETJOIN_EX_SQL},
    sized AS (
      SELECT doc_id, token,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM ex
    ),
    cont_pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.n AS a_n, COUNT(*) AS inter
      FROM sized a JOIN sized b ON a.token = b.token
                 AND a.doc_id <> b.doc_id
      WHERE a.n >= {CONTAINMENT_MIN_SET}
      GROUP BY a.doc_id, b.doc_id, a.n
    ),
    contained_pairs AS (
      SELECT a_id AS doc_id, b_id AS container FROM cont_pairs
      WHERE inter * {_CT_DEN} >= a_n * {_CT_NUM}
    ),
    hashed AS (
      SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
    ),
    canon AS (SELECT h, MIN(doc_id) AS canonical_id FROM hashed GROUP BY h),
    exact_rel AS (
      SELECT hd.doc_id, c.canonical_id FROM hashed hd JOIN canon c ON hd.h = c.h
    ),
    pairs AS (
      {{minhash}}
    ),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION ALL
      SELECT b_id AS u, a_id AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach(src, dst) AS (
      SELECT u, u FROM nodes
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
    members AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             CAST(d.n_chars AS BIGINT) AS n_chars
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    surv AS (
      SELECT component,
             arg_max(doc_id, n_chars * 1000000000000
                             + (1000000000000 - doc_id)) AS survivor
      FROM members GROUP BY component
    ),
    near_rel AS (
      SELECT m.doc_id, s.survivor FROM members m JOIN surv s USING (component)
    ),
    -- containers restricted to stage-1/2 survivors: a doc contained
    -- ONLY by its own exact copies / near-dup casualties must not be
    -- dropped by them (they are dropped in its favor)
    contained_kept AS (
      SELECT c.doc_id, MIN(c.container) AS container
      FROM contained_pairs c
      JOIN exact_rel ce ON ce.doc_id = c.container
                       AND ce.canonical_id = c.container
      JOIN near_rel cn ON cn.doc_id = c.container
                      AND cn.survivor = c.container
      GROUP BY c.doc_id
    )
    SELECT e.doc_id,
           CASE WHEN e.canonical_id <> e.doc_id THEN 'exact_dup'
                WHEN n.survivor <> e.doc_id THEN 'near_dup'
                WHEN ct.container IS NOT NULL THEN 'contained'
                ELSE 'kept' END AS reason,
           (CASE WHEN e.canonical_id <> e.doc_id THEN 'exact_dup'
                 WHEN n.survivor <> e.doc_id THEN 'near_dup'
                 WHEN ct.container IS NOT NULL THEN 'contained'
                 ELSE 'kept' END) = 'kept' AS keep,
           CAST(CASE WHEN e.canonical_id <> e.doc_id THEN e.canonical_id
                     WHEN n.survivor <> e.doc_id THEN n.survivor
                     WHEN ct.container IS NOT NULL THEN ct.container
                     ELSE e.doc_id END AS BIGINT) AS kept_by
    FROM exact_rel e
    JOIN near_rel n USING (doc_id)
    LEFT JOIN contained_kept ct USING (doc_id)
    """.format(minhash=_minhash_oracle())


@register(
    "dedup_drop_list",
    oracle=_drop_list_oracle(),
    doc="Row-level dedup drop list: every document gets one decision "
    "row (doc_id, keep, reason, kept_by) from the THREE dedup evidence "
    "sources composed by priority — exact_dup (not the canonical min "
    "doc_id of its normalized-text md5 group) > near_dup (not the "
    "highest-quality survivor of its MinHash LSH connected component, "
    "dedup_survivors' longest-doc tie-break) > contained (>= 80% of "
    "its shingles inside a STAGE-1/2-SURVIVING doc; kept_by = the "
    "smallest such container — a doc contained only by its own exact "
    "copies or near-dup casualties is not dropped by them) > kept. "
    "This is the relation a curation run actually "
    "writes before dropping rows — the row-level twin of "
    "corpus_curation_pipeline's quality-gated per-(lang, outcome) "
    "accounting — and the kept_by pointer is what makes drops "
    "auditable (every dropped doc names the doc that subsumes it). "
    "Composition of three already-verified operators; the oracle "
    "mirrors all three derivations (exact hash groups, the recursive "
    "transitive closure over the LSH pair graph, the full "
    "inverted-index containment join) in one CTE chain. Scale shape: "
    "each evidence relation keeps its own verified plan (hash agg; "
    "pair-node label propagation; prefix-filtered containment); the "
    "composition adds only doc-keyed left joins.",
)
def dedup_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import drop_decision_exprs
    from .pipeline_dedup import dedup_survivors
    from .pipeline_setjoin import setjoin_containment
    from .pipeline_text import dedup_exact

    exact = dedup_exact(spark, sf_dir).select("doc_id", "canonical_id")
    surv = dedup_survivors(spark, sf_dir).select("doc_id", "component", "keep")
    survivor_of = surv.filter(F.col("keep")).select(
        "component", F.col("doc_id").alias("survivor")
    )
    near = surv.join(F.broadcast(survivor_of), "component").select(
        "doc_id", "survivor"
    )
    # stage12 feeds TWO branches (the keeper filter and the final
    # decision join) — one materialization, or the exact/near subtrees
    # execute twice (code-review r10)
    stage12 = exact.join(near, "doc_id").localCheckpoint(eager=False)
    # containers restricted to stage-1/2 survivors (see oracle note):
    # a doc contained only by its own exact copies / near-dup
    # casualties must not be dropped by them. The pair relation is the
    # small side — broadcast it against the keeper relation.
    keepers = stage12.filter(
        (F.col("canonical_id") == F.col("doc_id"))
        & (F.col("survivor") == F.col("doc_id"))
    ).select(F.col("doc_id").alias("container"))
    contained = (
        keepers.join(
            F.broadcast(
                setjoin_containment(spark, sf_dir).select(
                    F.col("a_id").alias("doc_id"),
                    F.col("b_id").alias("container"),
                )
            ),
            "container",
        )
        .groupBy("doc_id")
        .agg(F.min("container").alias("container"))
    )
    base = stage12.join(contained, "doc_id", "left")
    reason, kept_by = drop_decision_exprs(
        F.col("doc_id"),
        F.col("canonical_id"),
        F.col("survivor"),
        F.col("container"),
    )
    return base.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
        kept_by.cast("bigint").alias("kept_by"),
    )
