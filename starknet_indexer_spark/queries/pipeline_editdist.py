"""Character-level near-duplicate join: edit-distance with q-gram
prefix filtering (ED-Join style).

The token-set family (MinHash/SimHash/PPJoin) measures bag-of-words
overlap; edit distance catches a different duplicate class — small
character-level perturbations (typos, near-identical titles, template
fills) that can shift every token. This query joins the corpus's
distinct *key strings* (first 2 tokens of each document — the
shortest title-proxy that yields a non-trivial within-distance-2
pair set on this corpus) under Levenshtein distance <= D, with the classic
mismatch-based candidate filter (Xiao et al., "ED-Join", VLDB'08):

- an edit operation destroys at most Q positional q-grams, so two
  strings within distance D share at least one gram among the
  Q*D + 1 rarest gram occurrences of each (global rarity order);
- candidates therefore come from an inverted index over each key's
  7-gram prefix (Q=3, D=2), never the full gram lists;
- a length filter (abs(len_a - len_b) <= D) prunes inside the join
  condition, and exact `levenshtein()` verifies every candidate, so
  the output is exact regardless of filter tightness.

Like setjoin_prefix_jaccard, the join runs over DISTINCT keys (the
template corpus maps many docs onto one key; doc multiplicity comes
along as n_docs_*), so crowded keys cost one row, not a quadratic
pair blow-up. Scale path: the gram-frequency rank relation is
vocabulary-sized (broadcast); the prefix index is (Q*D+1) rows per
key; hot grams inherit the cap_hot_bands escalation if a natural
corpus crowds a gram bucket. Keys shorter than Q chars cannot
produce grams and are excluded by construction (the corpus's 2-token
keys are always longer; a general deployment adds the trivial
short-string all-pairs branch within length buckets).

`tests/test_operators.py::TestEditDistJoin` pins losslessness: the
prefix-filtered result equals the brute-force all-pairs join at
sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..operators.dedup import tokens_expr
from .registry import register

Q = 3  # gram width
MAX_DIST = 2  # Levenshtein threshold D
PREFIX_LEN = Q * MAX_DIST + 1  # 7: mismatch-based prefix (ED-Join)
# The q-gram count bound (shared grams >= lmax - Q + 1 - Q*D) is
# VACUOUS when the longer string has lmax <= Q*(D+1) - 1: two edits
# can destroy every trigram of an 8-char string, so such pairs can
# evade the prefix index entirely (observed: 3 of 56 true pairs at
# sf0.01). Keys at or under this length take the all-pairs branch —
# they are a bounded set (at most charset^8 strings, in practice a
# tiny fraction of distinct keys).
SHORT_MAX = Q * (MAX_DIST + 1) - 1  # 8
KEY_TOKENS = 2

# DuckDB mirror of the key construction (same tokenizer as
# pipeline_cleaning._TOKS, first KEY_TOKENS tokens joined by space)
_KEY_SQL = f"""
    SELECT MIN(doc_id) AS id, k, CAST(len(k) AS BIGINT) AS klen,
           COUNT(*) AS n_docs
    FROM (
      SELECT doc_id,
             array_to_string(
               (list_filter(string_split_regex(regexp_replace(lower(text),
                  '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> ''))[1:{KEY_TOKENS}],
               ' ') AS k
      FROM documents
    )
    WHERE len(k) >= {Q}
    GROUP BY k
"""


@register(
    "editdist_near_pairs",
    oracle=f"""
    WITH keys AS ({_KEY_SQL}),
    grams AS (
      SELECT id, CAST(i AS BIGINT) AS pos, substr(k, CAST(i AS INTEGER), {Q}) AS gram
      FROM keys, UNNEST(range(1, CAST(klen - {Q} + 2 AS BIGINT))) AS u(i)
    ),
    gfreq AS (
      SELECT gram, COUNT(*) AS freq FROM grams GROUP BY gram
    ),
    grank AS (
      SELECT gram, ROW_NUMBER() OVER (ORDER BY freq ASC, gram ASC) AS rnk
      FROM gfreq
    ),
    prefix AS (
      SELECT DISTINCT id, gram FROM (
        SELECT g.id, g.gram,
               ROW_NUMBER() OVER (PARTITION BY g.id
                                  ORDER BY r.rnk ASC, g.pos ASC) AS occ
        FROM grams g JOIN grank r USING (gram)
      ) WHERE occ <= {PREFIX_LEN}
    ),
    cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.id AS id_a, b.id AS id_b
        FROM prefix a JOIN prefix b
          ON a.gram = b.gram AND a.id < b.id
        UNION ALL
        SELECT a.id AS id_a, b.id AS id_b
        FROM keys a JOIN keys b
          ON a.id < b.id
         AND a.klen <= {SHORT_MAX} AND b.klen <= {SHORT_MAX}
      )
    )
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(ka.k, kb.k) AS BIGINT) AS dist,
           ka.n_docs AS n_docs_a, kb.n_docs AS n_docs_b
    FROM cand c
    JOIN keys ka ON ka.id = c.id_a
    JOIN keys kb ON kb.id = c.id_b
    WHERE abs(ka.klen - kb.klen) <= {MAX_DIST}
      AND levenshtein(ka.k, kb.k) <= {MAX_DIST}
    """,
    doc=f"Edit-distance near-dup join over distinct 2-token key "
    f"strings: Levenshtein <= {MAX_DIST} with ED-Join's mismatch-"
    f"based q-gram prefix filter (Q={Q}, prefix {PREFIX_LEN} rarest "
    "gram occurrences under a global rarity order) generating "
    "candidates from an inverted index, a length filter inside the "
    "verify join, and exact levenshtein() as the final arbiter. "
    "Candidates and verification touch key-level relations only "
    "(distinct keys, doc multiplicity as n_docs_*); the gram-rank "
    "relation is vocabulary-sized and broadcasts. Losslessness is "
    "pinned against the brute-force all-pairs join in pytest.",
)
def editdist_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keys feeds FIVE subtrees (grams, the short branch, both verify
    # sides, and — through grams — the frequency rank); without
    # materialization each consumer recomputes the tokenize->groupBy
    # chain from the corpus scan. Lazy local checkpoint = one
    # materialization, no eager extra job (same pattern as setjoin).
    keys = _distinct_keys(spark, sf_dir).localCheckpoint(eager=False)
    prefix = _gram_prefix(keys)
    # prefix feeds both candidate-join sides
    prefix = prefix.localCheckpoint(eager=False)
    gram_cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    # all-pairs branch for the vacuous-count-bound regime (see
    # SHORT_MAX note): short keys are a bounded set, broadcast side
    short = keys.filter(F.col("klen") <= SHORT_MAX).select("id")
    short_cand = (
        short.alias("a")
        .join(F.broadcast(short.alias("b")), F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cand = gram_cand.unionByName(short_cand).distinct()
    ka = keys.select(
        F.col("id").alias("id_a"), F.col("k").alias("ka"),
        F.col("klen").alias("la"), F.col("n_docs").alias("n_docs_a"),
    )
    kb = keys.select(
        F.col("id").alias("id_b"), F.col("k").alias("kb"),
        F.col("klen").alias("lb"), F.col("n_docs").alias("n_docs_b"),
    )
    dist = F.levenshtein(F.col("ka"), F.col("kb"))
    return (
        cand.join(F.broadcast(ka), "id_a")
        .join(F.broadcast(kb), "id_b")
        .filter(
            (F.abs(F.col("la") - F.col("lb")) <= MAX_DIST) & (dist <= MAX_DIST)
        )
        .select(
            "id_a", "id_b", dist.cast("long").alias("dist"), "n_docs_a", "n_docs_b"
        )
    )


def _distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, k, klen, n_docs): distinct first-KEY_TOKENS-token key
    strings with doc multiplicity; id = min doc_id of the key's
    documents."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(tokens_expr(F.col("text")), 1, KEY_TOKENS), " ").alias("k"),
    )
    return (
        docs.filter(F.length("k") >= Q)
        .groupBy("k")
        .agg(
            F.min("doc_id").alias("id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select("id", "k", F.length("k").cast("long").alias("klen"), "n_docs")
    )


def _gram_prefix(keys: DataFrame) -> DataFrame:
    """(id, gram): each key's PREFIX_LEN rarest positional q-gram
    occurrences under the global (freq ASC, gram ASC) rarity order,
    deduplicated to gram values."""
    grams = keys.select(
        "id",
        "k",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("klen") - Q + 1)).alias("pos"),
    ).select("id", F.expr(f"substring(k, pos, {Q})").alias("gram"), "pos")
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("freq"))
    # Global rarity rank: the gram vocabulary is tiny relative to the
    # corpus (it is bounded by charset^Q), so a single-partition
    # window is fine at any corpus size.
    grank = gfreq.select(
        "gram",
        F.row_number()
        .over(W.orderBy(F.col("freq").asc(), F.col("gram").asc()))
        .alias("rnk"),
    )
    occ = (
        grams.join(F.broadcast(grank), "gram")
        .withColumn(
            "occ",
            F.row_number().over(
                W.partitionBy("id").orderBy(F.col("rnk").asc(), F.col("pos").asc())
            ),
        )
        .filter(F.col("occ") <= PREFIX_LEN)
    )
    return occ.select("id", "gram").distinct()
