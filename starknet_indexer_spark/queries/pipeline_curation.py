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


def _drop_list_ctes() -> str:
    """The dedup_drop_list CTE chain ending in ``decisions`` (doc_id,
    reason, keep, kept_by) — shared by the base oracle and the
    span-composed oracle (dedup_drop_list_spans)."""
    from .pipeline_setjoin import (
        CONTAINMENT_MIN_SET,
        _CT_DEN,
        _CT_NUM,
        _SETJOIN_EX_SQL,
    )

    return f"""{_SETJOIN_EX_SQL},
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
    ),
    decisions AS (
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
    )""".format(minhash=_minhash_oracle())


def _drop_list_oracle() -> str:
    return (
        f"WITH RECURSIVE {_drop_list_ctes()}"
        " SELECT doc_id, reason, keep, kept_by FROM decisions"
    )


#: span-drop window (tokens) — narrower than the repeated_span_fraction
#: metric's SPAN_N=8: the drop stage asks "is this KEPT doc mostly
#: boilerplate shared with other kept docs", and at this corpus scale
#: kept docs share 4-grams, not 8-grams (same calibration argument as
#: SPAN_N itself vs Lee et al.'s ~50)
SPAN_DROP_N = 4
#: drop threshold: >= 20% of token positions covered by spans whose
#: first kept occurrence lies in another kept document
SPAN_DROP_PPM = 200_000


def _span_drop_ctes() -> str:
    """Keeper-restricted first-occurrence span evidence over the
    ``decisions`` CTE (sp_-prefixed to avoid collisions with the
    drop-list chain), ending in ``sp_drop`` (doc_id, ptr)."""
    from .pipeline_dedup import _OCC_KEY_BASE, _TOKS_SQL

    n = SPAN_DROP_N
    return f"""sp_toks AS (
      SELECT t.doc_id, t.tokens
      FROM ({_TOKS_SQL}) t
      JOIN decisions dk ON dk.doc_id = t.doc_id AND dk.reason = 'kept'
      WHERE len(t.tokens) >= {n}
    ),
    sp_occ AS (
      SELECT doc_id, t.i AS i,
             ('0x' || substr(md5(array_to_string(tokens[t.i:t.i + {n - 1}],
                                                 ' ')), 1, 15))::BIGINT AS gh
      FROM sp_toks, UNNEST(range(1, len(tokens) - {n - 2})) AS t(i)
    ),
    sp_firsts AS (
      SELECT gh, MIN(doc_id * {_OCC_KEY_BASE} + i) AS fk FROM sp_occ GROUP BY gh
    ),
    sp_ext AS (
      SELECT o.doc_id, o.i, f.fk // {_OCC_KEY_BASE} AS first_doc
      FROM sp_occ o JOIN sp_firsts f USING (gh)
      WHERE f.fk // {_OCC_KEY_BASE} <> o.doc_id
    ),
    sp_cov AS (
      SELECT DISTINCT e.doc_id, p.pos
      FROM sp_ext e, UNNEST(range(e.i, e.i + {n})) AS p(pos)
    ),
    sp_stats AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
      FROM sp_cov GROUP BY doc_id
    ),
    sp_ptr AS (
      SELECT doc_id, MIN(first_doc) AS ptr FROM sp_ext GROUP BY doc_id
    ),
    sp_drop AS (
      SELECT t.doc_id, p.ptr
      FROM sp_toks t
      JOIN sp_stats s USING (doc_id)
      JOIN sp_ptr p USING (doc_id)
      WHERE s.n_dup * 1000000 // len(t.tokens) >= {SPAN_DROP_PPM}
    )"""


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


def span_drop_evidence(
    decisions: DataFrame, occ: DataFrame, meta: DataFrame
) -> DataFrame:
    """(doc_id, ptr) — kept docs dropped by span evidence, from a
    (doc_id, reason, ...) decision relation, a (doc_id, i, gh)
    span-occurrence relation at the SPAN_DROP_N window, and a
    (doc_id, n_tokens) denominator relation. ONE definition shared by
    the batch composition below (occ/meta derived from raw text) and
    the streaming drop list (occ/meta read from the maintained span
    postings + meta states — streaming/span_index.py), so
    stream == batch holds by shared code.

    Semantics (the containment-stage precedent, applied to spans): a
    span counts as duplicated for doc d only when its FIRST occurrence
    — MIN over the (doc_id, i) fold, computed over KEPT docs only —
    lies in ANOTHER kept document. The doc that introduced a span
    never gets dropped by it (no casualty can drop its own survivor,
    no mutual keeper wipe-out of the earliest copy), and
    self-repetition is excluded (the repetition_score domain). A kept
    doc whose coverage under such spans reaches SPAN_DROP_PPM drops
    with reason span_dup; ptr = the earliest kept doc holding a first
    occurrence of one of its duplicated spans (the auditable
    kept_by)."""
    from .pipeline_dedup import _OCC_KEY_BASE

    keepers = decisions.filter(F.col("reason") == "kept").select("doc_id")
    occ = occ.join(keepers, "doc_id")
    okey = F.col("doc_id") * F.lit(_OCC_KEY_BASE) + F.col("i")
    firsts = occ.groupBy("gh").agg(F.min(okey).alias("fk"))
    first_doc = F.expr(f"fk DIV {_OCC_KEY_BASE}")
    ext = (
        occ.join(firsts, "gh")
        .withColumn("first_doc", first_doc)
        .filter(F.col("first_doc") != F.col("doc_id"))
    )
    # ext feeds TWO branches (coverage + pointer) — one materialization
    ext = ext.select("doc_id", "i", "first_doc").localCheckpoint(eager=False)
    covered = (
        ext.select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {SPAN_DROP_N - 1})")).alias(
                "pos"
            ),
        )
        .distinct()
    )
    stats = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup")
    )
    ptr = ext.groupBy("doc_id").agg(F.min("first_doc").alias("ptr"))
    return (
        meta.select("doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"))
        .join(stats, "doc_id")
        .join(ptr, "doc_id")
        .filter(
            F.expr(f"n_dup * 1000000 DIV n_tokens >= {SPAN_DROP_PPM}")
        )
        .select("doc_id", "ptr")
    )


@register(
    "dedup_drop_list_spans",
    oracle=f"""
    WITH RECURSIVE {{ctes}},
    {{span_ctes}}
    SELECT d.doc_id,
           CASE WHEN d.reason <> 'kept' THEN d.reason
                WHEN sd.doc_id IS NOT NULL THEN 'span_dup'
                ELSE 'kept' END AS reason,
           (CASE WHEN d.reason <> 'kept' THEN d.reason
                 WHEN sd.doc_id IS NOT NULL THEN 'span_dup'
                 ELSE 'kept' END) = 'kept' AS keep,
           CAST(CASE WHEN d.reason <> 'kept' THEN d.kept_by
                     WHEN sd.doc_id IS NOT NULL THEN sd.ptr
                     ELSE d.doc_id END AS BIGINT) AS kept_by
    FROM decisions d LEFT JOIN sp_drop sd USING (doc_id)
    """.format(ctes=_drop_list_ctes(), span_ctes=_span_drop_ctes()),
    doc="The dedup drop list composed with the FOURTH dedup evidence "
    "source — substring-span duplication (Lee et al. 2022), the "
    "fraction substring-level dedup cuts on. Priority: exact_dup > "
    "near_dup > contained > span_dup > kept. The span stage drops a "
    f"kept doc when >= {SPAN_DROP_PPM} ppm of its token positions are "
    f"covered by {SPAN_DROP_N}-token spans whose FIRST occurrence "
    "(min (doc_id, position) fold, computed over KEPT docs only — the "
    "containment stage's keeper-restriction precedent) lies in "
    "another kept document: the doc that introduced a span is never "
    "dropped by it, self-repetition is excluded, and near-dup "
    "casualties cannot drop their own survivor. kept_by = the "
    "earliest kept doc holding a first occurrence of one of the "
    "dropped doc's duplicated spans. Scale shape: the three base "
    "evidence relations keep their verified plans; the span stage "
    "adds one map-side span projection over keepers, a span-keyed "
    "first-occurrence agg, and a bounded x-window coverage explode — "
    "the repeated_span_fraction shape, keeper-filtered.",
)
def dedup_drop_list_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import token_relation
    from .pipeline_dedup import span_occurrences

    # decisions feeds TWO branches (keeper filter inside the span
    # stage + the final decision join); toks feeds occ AND meta; occ
    # feeds firsts AND the ext join — one materialization each, or the
    # corpus tokenize/span-explode pass executes ~3x (code-review r11)
    decisions = dedup_drop_list(spark, sf_dir).localCheckpoint(eager=False)
    toks = (
        token_relation(load(spark, sf_dir, "documents").select("doc_id", "text"))
        .filter(F.size("tokens") >= SPAN_DROP_N)
        .localCheckpoint(eager=False)
    )
    occ = span_occurrences(toks, SPAN_DROP_N).localCheckpoint(eager=False)
    meta = toks.select(
        "doc_id", F.size("tokens").cast("bigint").alias("n_tokens")
    )
    dropped = span_drop_evidence(decisions, occ, meta)
    return compose_span_decisions(decisions, dropped)


def compose_span_decisions(decisions: DataFrame, dropped: DataFrame) -> DataFrame:
    """Apply (doc_id, ptr) span drops to a decision relation at the
    lowest priority — shared by the batch query above and the
    streaming drop list. No broadcast hint on the dropped side: its
    size is corpus-dependent (any fraction of kept docs can cross the
    coverage threshold), so the join strategy is left to AQE instead
    of forcing an unbounded collect (code-review r11)."""
    return (
        decisions.join(
            dropped.withColumnRenamed("doc_id", "sd_id"),
            decisions["doc_id"] == F.col("sd_id"),
            "left",
        )
        .select(
            "doc_id",
            F.when(F.col("reason") != "kept", F.col("reason"))
            .when(F.col("sd_id").isNotNull(), F.lit("span_dup"))
            .otherwise(F.lit("kept"))
            .alias("reason2"),
            F.when(F.col("reason") != "kept", F.col("kept_by"))
            .when(F.col("sd_id").isNotNull(), F.col("ptr"))
            .otherwise(F.col("doc_id"))
            .cast("bigint")
            .alias("kept_by"),
        )
        .select(
            "doc_id",
            F.col("reason2").alias("reason"),
            (F.col("reason2") == "kept").alias("keep"),
            "kept_by",
        )
    )
