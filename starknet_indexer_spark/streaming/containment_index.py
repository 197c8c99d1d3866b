"""Continuously-maintained containment (subsumption) index.

Operationalizes the incremental containment screen
(queries/pipeline_setjoin.containment_incremental — "is this newly
crawled page just a quote/wrapper of something we already have?") as a
long-running stream over ``state_table`` generations (VERDICT r9
mandate #4): every micro-batch of documents is split into probe docs
(the contained side, the ``doc_id % CONTAINMENT_NEW_MOD == 0``
convention) and container docs, and

1. the batch's probe prefixes probe the container token postings of
   everything so far (state postings ∪ the batch's own containers),
2. the maintained probe-prefix postings probe the batch's NEW
   container postings (so a container arriving after its prober is
   still found),
3. the batch folds into the index,

so each qualifying ordered pair (a contained-in b) is discovered
exactly once: at the batch where the LATER of the two docs arrives.
The union over all batches equals the full-corpus
``containment_incremental`` recompute (tests/test_containment_index.py).

Why freezing each probe's prefix at fold time is lossless: the
one-sided prefix theorem (see pipeline_setjoin.containment_pairs)
holds for ANY total order over the probe's OWN tokens — if
|A∩B| >= t|A|, the intersection cannot fit inside A's last
ceil(t|A|)-1 tokens, so at least one intersection token lies in A's
first |A|-ceil(t|A|)+1 under whatever order A was cut with; no
cross-document order consistency is required. The ascending-df order
is purely the performance heuristic (rare tokens -> short postings),
so the maintained df counts only steer posting sizes, never
correctness — which is what lets the corpus keep its frozen prefixes
while df drifts with every batch, instead of re-ranking the corpus.

State layout (all ``state_table`` generations, epoch-token guarded):

- ``index_dir/sets``:     (doc_id, hset, n, is_probe) — the verify
  side for both orientations; bucketed on xxhash64(doc_id). Folded
  LAST: the batch-novelty anti-join keys on it, so it is the commit
  point (the materialize_silver discipline — a crash between folds
  replays the batch as still-novel, and the already-folded states
  short-circuit on their token).
- ``index_dir/probe_prefix``: (doc_id, token, n) — probe docs'
  frozen prefix postings (only n >= CONTAINMENT_MIN_SET docs);
  bucketed on xxhash64(token) so a new container's tokens prune to
  their buckets.
- ``index_dir/postings``: (doc_id, token, n) — container docs' FULL
  token postings (containment has no upper size bound, so the
  container side is not prefix-prunable); bucketed on
  xxhash64(token).
- ``index_dir/dfc``:      (token, df) — additive document-frequency
  counts over every folded doc, read only to order NEW probes'
  prefixes by corpus-so-far rarity.
- discovered pairs land under ``pairs_dir/epoch=<token>/`` with
  overwrite (the dedup_index protocol): an at-least-once replay of a
  crashed epoch REWRITES its own pairs instead of appending
  duplicates.

Scale shape: a micro-batch probe is a broadcast of the (small) batch
prefix relation against token-bucket-pruned postings; the reverse
probe broadcasts the batch's container postings against the prefix
state's buckets; verification joins candidate PAIRS back to int64
hash arrays. Nothing re-ranks or re-scans the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingle_relation
from ..queries.pipeline_setjoin import (
    CONTAINMENT_MIN_SET,
    CONTAINMENT_NEW_MOD,
    CONTAINMENT_THRESHOLD,
    _t_frac,
)
from . import state_table

N_BUCKETS = 8

_SETS = "sets"
_PREFIX = "probe_prefix"
_POSTINGS = "postings"
_DFC = "dfc"
_SETS_DDL = (
    "doc_id bigint, hset array<bigint>, n int,"
    " is_probe boolean, is_container boolean"
)
_TOKREL_DDL = "doc_id bigint, token bigint, n int"
_DFC_DDL = "token bigint, df bigint"
_ALL_STATES = (_SETS, _PREFIX, _POSTINGS, _DFC)

#: default role split — the crawl-refresh convention of
#: containment_incremental: new-batch docs probe, the rest index.
#: Callers wanting the FULL containment join (every doc both probes
#: and indexes — the dedup_drop_list shape) pass lambda d: F.lit(True)
#: for both.
DEFAULT_PROBE_PRED = lambda d: d % CONTAINMENT_NEW_MOD == 0  # noqa: E731
DEFAULT_CONTAINER_PRED = lambda d: d % CONTAINMENT_NEW_MOD != 0  # noqa: E731


def _batch_sets(
    docs: DataFrame, probe_pred, container_pred,
    prepared: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, hset, n, is_probe, is_container) for one batch of
    (doc_id, text) rows — the same shingle -> 60-bit-hash -> distinct
    chain as silver doc_shingles + ranked_sets, so stream == batch by
    construction. Roles are independent flags: a doc may probe, index,
    or both (the full-join configuration). ``prepared`` is an optional
    pre-derived ``shingle_relation`` for the same batch (VERDICT r10
    mandate #4): when given, this module reads only its ``h`` column —
    one text pass shared across every index fold."""
    rel = prepared if prepared is not None else shingle_relation(docs)
    return rel.select(
        "doc_id",
        F.array_sort(F.array_distinct(F.col("h"))).alias("hset"),
    ).select(
        "doc_id",
        "hset",
        F.size("hset").cast("int").alias("n"),
        probe_pred(F.col("doc_id")).alias("is_probe"),
        container_pred(F.col("doc_id")).alias("is_container"),
    ).filter(F.col("n") > 0)


def _verified(cand: DataFrame, all_sets: DataFrame) -> DataFrame:
    """Exact containment verify of (a_id, b_id) candidates against the
    full hash sets; output matches containment_incremental."""
    num, den = _t_frac(CONTAINMENT_THRESHOLD)
    a = all_sets.select(
        F.col("doc_id").alias("a_id"),
        F.col("hset").alias("a_hs"),
        F.col("n").alias("a_n"),
    )
    b = all_sets.select(
        F.col("doc_id").alias("b_id"), F.col("hset").alias("b_hs")
    )
    inter = F.size(F.array_intersect("a_hs", "b_hs"))
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .filter(inter * F.lit(den) >= F.col("a_n") * F.lit(num))
        .select(
            "a_id",
            "b_id",
            F.col("a_n").cast("bigint").alias("a_n"),
            inter.cast("bigint").alias("inter"),
            F.round(inter / F.col("a_n"), 6).alias("containment"),
        )
    )


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame(
            [], "a_id bigint, b_id bigint, a_n bigint, inter bigint,"
            " containment double"
        )
    return spark.read.parquet(pairs_dir).select(
        "a_id", "b_id", "a_n", "inter", "containment"
    )


#: (state dir, live generation dir) pairs already confirmed on the
#: independent-roles schema — the migration probe (a parquet schema
#: read of the live generation) runs once per GENERATION, not once per
#: micro-batch. Keying on the generation (not the bare path, ADVICE
#: r10) means a legacy generation restored at an already-checked path,
#: or a temp dir reused for a different state, re-probes instead of
#: skipping the migration and failing on the missing is_container
#: column. A normal fold advances the generation, so the steady-state
#: cost is one schema read per commit — trivially cheap next to the
#: fold itself. A dict (latest confirmed generation per state dir),
#: not a set of pairs: a long-running stream advances the generation
#: every batch and an append-only memo would grow without bound.
_MIGRATION_CHECKED: dict[str, str] = {}


def _migrate_legacy_sets(spark: SparkSession, sets_dir: str) -> None:
    """One-shot legacy-state migration (code-review r10, the round-7
    OHLC precedent): ``sets`` generations written before the
    independent-roles schema carry only is_probe under the either/or
    convention — container == NOT probe. Commit a widened generation
    (same epoch token, so replay guards are unaffected) before any
    read/merge touches the missing column. Memoized per (state dir,
    live generation): a generation is immutable once committed, so one
    confirmation covers it for the process lifetime."""
    gen_dir = state_table.current_gen_dir(sets_dir)
    if gen_dir is None:
        return  # no state yet: first fold writes the new schema
    if _MIGRATION_CHECKED.get(sets_dir) == gen_dir:
        return
    if not any(e.startswith("bucket=") for e in os.listdir(gen_dir)):
        # zero-bucket generation (every key dropped) — nothing to
        # migrate, and spark.read.parquet would fail schema inference
        _MIGRATION_CHECKED[sets_dir] = gen_dir
        return
    raw = spark.read.parquet(gen_dir)
    if "is_container" not in raw.columns:
        migrated = raw.withColumn("is_container", ~F.col("is_probe"))
        affected = [
            r["bucket"] for r in migrated.select("bucket").distinct().collect()
        ]
        state_table.commit_generation(
            sets_dir,
            migrated,
            affected=affected,
            token=state_table.applied_token(sets_dir),
        )
        # the migration itself advanced the generation — memoize the
        # NEW live generation so the next fold skips the re-probe
        gen_dir = state_table.current_gen_dir(sets_dir)
        if gen_dir is None:
            return
    _MIGRATION_CHECKED[sets_dir] = gen_dir


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    epoch_token: str | None = None,
    probe_pred=DEFAULT_PROBE_PRED,
    container_pred=DEFAULT_CONTAINER_PRED,
    prepared: DataFrame | None = None,
) -> None:
    """Process one micro-batch: emit new containment pairs, then fold
    the batch into the index. Fold order (dfc, prefix, postings, sets)
    keeps ``sets`` the commit point — see module docstring.

    ``probe_pred`` / ``container_pred`` (doc_id Column -> boolean
    Column) assign roles; the defaults are the crawl-refresh split.
    Role predicates must be STABLE across batches for a given state
    dir (they are baked into the folded prefix/posting relations).
    ``prepared`` — optional pre-derived ``shingle_relation`` for the
    batch (see ``_batch_sets``)."""
    num, den = _t_frac(CONTAINMENT_THRESHOLD)
    paths = {s: os.path.join(index_dir, s) for s in _ALL_STATES}
    if epoch_token is not None and all(
        state_table.applied_token(paths[s]) == epoch_token for s in _ALL_STATES
    ):
        return

    _migrate_legacy_sets(spark, paths[_SETS])
    state_sets = state_table.read_state(spark, paths[_SETS], _SETS_DDL).select(
        "doc_id", "hset", "n", "is_probe", "is_container"
    )
    # novelty anti-join: a doc redelivered in a LATER epoch already
    # emitted its pairs and folded — absorb it here (sets rows are a
    # pure function of the text). cache + unpersist in finally (the
    # dedup_index discipline — a long-running stream must not leak
    # pinned blocks between context GCs).
    batch = (
        _batch_sets(docs, probe_pred, container_pred, prepared=prepared)
        .join(state_sets.select("doc_id"), "doc_id", "left_anti")
        .cache()  # feeds df counts, prefixes, postings, verify, 4 folds
    )

    # corpus-so-far df (state + batch contribution) orders NEW probes'
    # prefixes by rarity — heuristic only, so replay double-counts
    # after a mid-fold crash are harmless (any order is lossless)
    state_dfc = state_table.read_state(spark, paths[_DFC], _DFC_DDL).select(
        "token", "df"
    )
    batch_dfc = (
        batch.select("doc_id", F.explode("hset").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    dfc = (
        state_dfc.unionByName(batch_dfc)
        .groupBy("token")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )

    new_prefix = (
        batch.filter(F.col("is_probe") & (F.col("n") >= CONTAINMENT_MIN_SET))
        .select("doc_id", "n", F.explode("hset").alias("token"))
        .join(dfc, "token")
        .groupBy("doc_id", "n")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "token"))).alias(
                "ordered"
            )
        )
        .withColumn(
            "prefix_len",
            F.expr(f"n - ((n * {num} + {den - 1}) div {den}) + 1"),
        )
        .select(
            "doc_id",
            "n",
            F.explode(F.slice("ordered", 1, F.col("prefix_len"))).alias("p"),
        )
        .select("doc_id", F.col("p.token").alias("token"), "n")
        .cache()  # feeds the probe join + its fold
    )
    try:
        new_postings = batch.filter(F.col("is_container")).select(
            "doc_id", F.explode("hset").alias("token"), "n"
        )

        state_prefix = state_table.read_state(
            spark, paths[_PREFIX], _TOKREL_DDL
        ).select("doc_id", "token", "n")
        state_postings = state_table.read_state(
            spark, paths[_POSTINGS], _TOKREL_DDL
        ).select("doc_id", "token", "n")

        def candidates(prefix: DataFrame, postings: DataFrame) -> DataFrame:
            pa, fb = prefix.alias("pa"), postings.alias("fb")
            return pa.join(
                fb,
                (F.col("pa.token") == F.col("fb.token"))
                # self-pair guard: required when role predicates overlap
                # (a doc probing AND indexing must not contain itself)
                & (F.col("pa.doc_id") != F.col("fb.doc_id"))
                & (F.col("fb.n") * F.lit(den) >= F.col("pa.n") * F.lit(num)),
            ).select(
                F.col("pa.doc_id").alias("a_id"), F.col("fb.doc_id").alias("b_id")
            )

        # (1) new probes vs every container so far (replay overlap between
        # state and batch postings collapses in the DISTINCT); (2) frozen
        # corpus prefixes vs the batch's new containers. Exactly-once per
        # pair: (a,b) is found at the batch where the LATER doc arrives —
        # same-batch pairs only via (1) (the batch is not yet folded, so
        # (2) cannot see it); an earlier probe meets a later container
        # only via (2); an earlier container meets a later probe only via
        # (1).
        cand = (
            candidates(
                F.broadcast(new_prefix),
                state_postings.unionByName(new_postings),
            )
            .unionByName(candidates(state_prefix, F.broadcast(new_postings)))
            .distinct()
        )
        all_sets = (
            state_sets.unionByName(batch)
            .select("doc_id", "hset", "n")
            .dropDuplicates(["doc_id"])
        )
        out = _verified(cand, all_sets)

        state_table.write_epoch_pairs(out, pairs_dir, epoch_token)

        tok_bucket = F.pmod(F.xxhash64("token"), F.lit(N_BUCKETS)).cast("int")
        state_table.merge_batch(
            spark,
            paths[_DFC],
            batch_dfc,
            lambda df: df.groupBy("token").agg(
                F.sum("df").cast("bigint").alias("df")
            ),
            ["token"],
            ["df"],
            tok_bucket,
            _DFC_DDL,
            token=epoch_token,
        )
        state_table.merge_batch(
            spark,
            paths[_PREFIX],
            new_prefix,
            lambda df: df.dropDuplicates(["doc_id", "token"]),
            ["doc_id", "token"],
            ["n"],
            tok_bucket,
            _TOKREL_DDL,
            token=epoch_token,
        )
        state_table.merge_batch(
            spark,
            paths[_POSTINGS],
            new_postings,
            lambda df: df.dropDuplicates(["doc_id", "token"]),
            ["doc_id", "token"],
            ["n"],
            tok_bucket,
            _TOKREL_DDL,
            token=epoch_token,
        )
        state_table.merge_batch(
            spark,
            paths[_SETS],
            batch,
            lambda df: df.dropDuplicates(["doc_id"]),
            ["doc_id"],
            ["hset", "n", "is_probe", "is_container"],
            F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("int"),
            _SETS_DDL,
            token=epoch_token,
        )
    finally:
        batch.unpersist()
        new_prefix.unpersist()


def stream_containment_index(
    spark: SparkSession,
    feed_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
    probe_pred=DEFAULT_PROBE_PRED,
    container_pred=DEFAULT_CONTAINER_PRED,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` maintain the containment index per micro-batch;
    discovered pairs land in ``pairs_dir`` (epoch-keyed subdirs — read
    via ``read_pairs``)."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        index_dir,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark,
            batch_df,
            index_dir,
            pairs_dir,
            epoch_token=token,
            probe_pred=probe_pred,
            container_pred=container_pred,
        ),
        schema=schema,
        select_cols=["doc_id", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
