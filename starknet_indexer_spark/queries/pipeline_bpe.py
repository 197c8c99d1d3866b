"""Distributed BPE tokenizer training: iterative pair-merge over the
word-frequency relation.

Byte-pair-encoding merge training is the canonical tokenizer-building
job over a pretraining corpus (GPT-2/SentencePiece style): count
adjacent symbol pairs weighted by word frequency, merge the most
frequent pair everywhere, repeat. ``vocab_encode_ids`` covers applying
a FIXED vocabulary; this module covers LEARNING one — the remaining
tokenizer-side gap in the pipeline surface.

Exactness: symbols are exact strings and pair counts exact integer
sums, so each round's argmax (ties broken lexicographically on the
pair) is totally ordered and the whole iteration is value-hash
reproducible. The merge application is a left fold over each word's
symbol array — greedy left-to-right, non-overlapping, the standard
BPE semantics — expressed with ``F.aggregate`` on Spark and
``list_reduce`` on DuckDB (both fold left; DuckDB list slices are
INCLUSIVE, so drop-last is ``[:-2]``).

Scale shape: the corpus-sized work is ONE word-count aggregation
(map-side combined; the explode is the same tokenizer scan every text
query pays). Every merge round then touches only the DISTINCT-WORD
relation — vocabulary-sized, not corpus-sized (the standard trick
that makes BPE training tractable: Sennrich's dictionary-based
training). Per round: one pair explode + map-side-combined sum (pair
space is vocab-bounded), one ORDER BY ... LIMIT 1 (a top-1, not a
global sort at scale — Spark's TakeOrdered), and one map-only fold to
rewrite symbol arrays under the broadcast best pair. The word
relation is lazily localCheckpointed per round so round r+1 rebuilds
from materialized arrays instead of re-running r chained folds.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

BPE_MERGES = 4


def _oracle_with_block() -> str:
    """Shared WITH-prefix: word counts, w0..wR merge rounds, b1..bR
    argmax pairs, and the per-doc word stream (used by the encode
    query; DuckDB ignores unreferenced CTEs)."""
    rounds = []
    for r in range(1, BPE_MERGES + 1):
        rounds.append(
            f"""
    p{r} AS (
      SELECT w.syms[t.i] AS x, w.syms[t.i + 1] AS y, SUM(w.cnt) AS cnt
      FROM w{r - 1} w, UNNEST(range(1, len(w.syms))) AS t(i)
      GROUP BY 1, 2
    ),
    b{r} AS (SELECT x, y, cnt FROM p{r} ORDER BY cnt DESC, x, y LIMIT 1),
    w{r} AS (
      SELECT w.word, w.cnt,
             list_reduce(
               list_transform(w.syms, s -> [s]),
               (acc, e) -> CASE
                 WHEN acc[-1] = b.x AND e[1] = b.y
                 THEN acc[:-2] || [b.x || b.y]
                 ELSE acc || e
               END
             ) AS syms
      FROM w{r - 1} w CROSS JOIN b{r} b
    )"""
        )
    return f"""
    WITH docw AS (
      SELECT doc_id, t.w AS word
      FROM documents,
           UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS t(w)
    ),
    words AS (SELECT word, COUNT(*) AS cnt FROM docw GROUP BY 1),
    w0 AS (
      SELECT word, cnt, str_split(word, '') || ['</w>'] AS syms FROM words
    ),
    {",".join(rounds)}
    """


def _oracle() -> str:
    selects = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, x AS left_sym, y AS right_sym,"
        f" x || y AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return _oracle_with_block() + selects


def _fold_merge() -> F.Column:
    """Greedy left-to-right merge of the broadcast pair (bx, by) in
    the symbol array — a left fold whose accumulator is the rewritten
    prefix. Identical semantics to the oracle's ``list_reduce``."""
    return F.aggregate(
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        F.slice(F.col("syms"), 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.col("bx")) & (x == F.col("by")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.col("bx"), F.col("by"))),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


@register(
    "bpe_train_merges",
    oracle=_oracle(),
    doc=f"BPE tokenizer merge training: {BPE_MERGES} rounds of "
    "(count adjacent symbol pairs weighted by word frequency -> merge "
    "the argmax pair everywhere), Sennrich dictionary-style — the "
    "corpus is scanned ONCE for word counts and every round then "
    "operates on the vocabulary-sized word relation only. Pair counts "
    "are exact integer sums with lexicographic tie-break, and the "
    "merge application is the same greedy left fold on both engines "
    "(F.aggregate / list_reduce), so all four learned merge rules are "
    "value-hash checkable. Per round: map-side-combined pair agg, "
    "top-1 (TakeOrdered, no global sort), broadcast-pair map-only "
    "array rewrite.",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs, _w = _train(spark, sf_dir)
    return reduce(DataFrame.unionByName, outs)


def _train(spark: SparkSession, sf_dir: str):
    """(per-round merge DataFrames, final encoded distinct-word
    relation) — shared by merge training and corpus encoding."""
    docs = load(spark, sf_dir, "documents").select("text")
    words = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = words.select(
        "word",
        "cnt",
        F.concat(F.split("word", ""), F.array(F.lit("</w>"))).alias("syms"),
    ).localCheckpoint(eager=False)

    outs: list[DataFrame] = []
    for r in range(1, BPE_MERGES + 1):
        # size >= 2 guard: a word whose symbols collapsed to ONE token
        # contributes no pairs. DuckDB's range(1,1) is empty, but Spark's
        # sequence(1, 0) infers a NEGATIVE step and yields [1, 0], whose
        # element_at(syms, 0) then throws under ANSI — the filter makes
        # both engines see the same (empty) pair set.
        pairs = (
            w.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i ->"
                        " struct(element_at(syms, i) AS x,"
                        " element_at(syms, i + 1) AS y))"
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.x").alias("x"), F.col("pr.y").alias("y"))
            .agg(F.sum("cnt").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), "x", "y")
            .limit(1)
            .localCheckpoint(eager=False)  # consumed by output AND merge
        )
        outs.append(
            best.select(
                F.lit(r).alias("merge_rank"),
                F.col("x").alias("left_sym"),
                F.col("y").alias("right_sym"),
                F.concat("x", "y").alias("merged"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        w = (
            w.crossJoin(
                F.broadcast(
                    best.select(F.col("x").alias("bx"), F.col("y").alias("by"))
                )
            )
            .select("word", "cnt", _fold_merge().alias("syms"))
            .localCheckpoint(eager=False)
        )
    return outs, w


@register(
    "bpe_encode_stats",
    oracle=_oracle_with_block()
    + f"""
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(w.syms)) AS BIGINT) AS n_tokens,
           CAST(SUM(len(w.word)) * 1000000
                // SUM(len(w.syms)) AS BIGINT) AS chars_per_token_ppm
    FROM docw d JOIN w{BPE_MERGES} w USING (word)
    GROUP BY d.doc_id
    """,
    doc="BPE corpus encoding: tokenize every document with the "
    f"{BPE_MERGES}-merge vocabulary learned by bpe_train_merges (same "
    "shared training rounds) and report per-doc token counts plus "
    "compression fertility (chars per token, ppm). The encoding "
    "never refolds per occurrence: each DISTINCT word is encoded once "
    "in the vocabulary-sized relation, then broadcast-joined back onto "
    "the doc-word stream — at 100 TB the corpus is touched twice "
    "(word count + final join), everything else is vocab-sized. The "
    "per-doc token count is what a token-budgeted pretraining mix "
    "actually samples on.",
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _outs, w = _train(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    docw = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word"),
    )
    enc = w.select("word", F.size("syms").alias("n_syms"), F.length("word").alias("n_chars"))
    return (
        docw.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
            F.expr(
                "CAST(SUM(n_chars) * 1000000 DIV SUM(n_syms) AS BIGINT)"
            ).alias("chars_per_token_ppm"),
        )
    )
