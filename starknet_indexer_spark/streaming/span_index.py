"""Continuously-maintained substring-span postings (VERDICT r10 #6).

The fourth dedup evidence source — substring-level duplication
(queries/pipeline_dedup.repeated_span_fraction and the Lee et al. 2022
rewrite) — had no maintained-state counterpart: the streaming drop
list composed only exact/near/containment evidence. This module folds
the SPAN-HASH POSTINGS per micro-batch so every substring-level
derivation is readable at any moment without re-tokenizing the corpus:

- ``root/postings``: (gh, doc_id, i) — one row per span-window
  occurrence, keyed by the full triple (occurrences are a pure
  function of the text, so redelivery merges to the identical rows —
  no novelty guard needed), bucketed by doc_id RANGE;
- ``root/meta``: (doc_id, n_tokens) — the per-doc denominator, same
  bucketing.

Bucketing rationale (code-review r11): the postings state is
O(total corpus tokens) — far larger than the per-doc states — and the
generation merge unions + rewrites every AFFECTED bucket. A hash
bucket key (gh or doc_id hash) makes any batch affect ALL buckets, so
every fold would rewrite the whole postings relation. doc_id-range
buckets align with how corpora actually arrive (crawl feeds assign
mostly increasing ids), so a micro-batch touches the one or two
ranges its ids fall in and the fold cost tracks the affected ranges,
not corpus history; untouched ranges carry forward as hardlinks. An
adversarially id-scattered batch degrades to the hash behavior —
documented, not hidden. Read-time derivations scan all postings
either way (the dup aggregate groups by gh), so nothing is lost on
the read side.

Fold order: postings BEFORE meta. Both merges are idempotent
(dedup-by-key), so a crash between them replays safely in either
order; postings-first keeps the invariant that any doc visible in
``meta`` has its postings committed (a read never sees a denominator
without its numerator evidence).

``span_fraction`` derives the registered ``repeated_span_fraction``
relation from state (same shared ``span_occurrences`` expression at
fold time, same dup/coverage algebra at read time) — the stream==batch
contract pinned in tests/test_span_index.py. The drop-list composition
(keeper-restricted first-occurrence evidence) reads ``read_postings``
/ ``read_meta`` directly — see streaming/drop_list.py.

The window width ``span_n`` parameterizes the index and is baked into
the folded postings — it must be STABLE across batches for a given
state dir (the role-predicate convention of containment_index).
ADVICE r11: that contract is now ENFORCED, not just documented — the
first fold persists ``span_n`` in a ``_span_n`` config file at the
state root, and every later fold or width-dependent read asserts it
matches (``check_span_n``); a mismatch (e.g. a drop-list composition
at SPAN_DROP_N reading a state folded at the default SPAN_N) raises
the same loud contract error as missing state instead of silently
expanding coverage with the wrong window.

Scale shape: the postings state is O(total tokens) rows of three
integers — the documented price of substring-level dedup (the
suffix-array equivalent for a fixed window). The fold shuffles the
batch once for the merge and rewrites only the doc_id ranges the
batch lands in (see bucketing rationale above); read-time derivations
shuffle the postings relation (ids and hashes, never text).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import token_relation
from ..queries.pipeline_dedup import SPAN_N, span_occurrences
from . import state_table

#: doc_ids per state bucket (non-negative ids assumed, the corpus
#: convention) — a crawl batch of sequential ids touches
#: ceil(batch/RANGE)+1 buckets; the fixture corpora (5e2-5e3 docs)
#: span a handful, exercising multi-bucket merges under test
BUCKET_RANGE = 2048

_POSTINGS = "postings"
_META = "span_meta"
_POSTINGS_DDL = "gh bigint, doc_id bigint, i int"
_META_DDL = "doc_id bigint, n_tokens bigint"
_SPAN_N_FILE = "_span_n"


def stored_span_n(root: str) -> int | None:
    """Window width the state at ``root`` was folded with; None when
    the state has never recorded one (no fold yet, or a pre-r12
    state — tolerated on read, stamped by the next fold)."""
    try:
        with open(os.path.join(root, _SPAN_N_FILE)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None
    except ValueError:
        raise RuntimeError(
            f"corrupt span-index width file {root}/{_SPAN_N_FILE}"
        ) from None


def check_span_n(root: str, span_n: int, stamp: bool = False) -> None:
    """Assert ``span_n`` matches the width baked into the state at
    ``root`` (ADVICE r11). ``stamp=True`` (fold path) records the
    width on first use — write-then-rename so a crash cannot leave a
    half-written file."""
    stored = stored_span_n(root)
    if stored is not None:
        if stored != span_n:
            raise RuntimeError(
                f"span index at {root!r} was folded with span_n={stored}"
                f" but span_n={span_n} was requested — the window width"
                " is baked into the postings; use a separate state dir"
                " per width."
            )
        return
    if stamp:
        os.makedirs(root, exist_ok=True)
        tmp = os.path.join(root, _SPAN_N_FILE + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(span_n))
        os.replace(tmp, os.path.join(root, _SPAN_N_FILE))

#: doc_id-range bucket expression (see module docstring)
def _bucket():
    return F.expr(f"CAST(doc_id DIV {BUCKET_RANGE} AS INT)")


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    epoch_token: str | None = None,
    span_n: int = SPAN_N,
    tokens: DataFrame | None = None,
) -> None:
    """Fold one (doc_id, text) micro-batch into the span postings.

    ``tokens`` — optional pre-derived ``token_relation`` for the same
    batch (the shared-derivation protocol of drop_list.apply_batch)."""
    check_span_n(root, span_n, stamp=True)
    postings_state = os.path.join(root, _POSTINGS)
    meta_state = os.path.join(root, _META)
    if epoch_token is not None and (
        state_table.applied_token(postings_state) == epoch_token
        and state_table.applied_token(meta_state) == epoch_token
    ):
        return

    toks = (
        (tokens if tokens is not None else token_relation(docs))
        .filter(F.size("tokens") >= span_n)
        .cache()
    )
    try:
        occ = span_occurrences(toks, span_n).select(
            "gh", "doc_id", F.col("i").cast("int").alias("i")
        )
        state_table.merge_batch(
            spark,
            postings_state,
            occ.dropDuplicates(["gh", "doc_id", "i"]),
            lambda df: df.dropDuplicates(["gh", "doc_id", "i"]),
            ["gh", "doc_id", "i"],
            [],
            _bucket(),
            _POSTINGS_DDL,
            token=epoch_token,
        )
        meta = toks.select(
            "doc_id", F.size("tokens").cast("bigint").alias("n_tokens")
        )
        state_table.merge_batch(
            spark,
            meta_state,
            meta.dropDuplicates(["doc_id"]),
            lambda df: df.dropDuplicates(["doc_id"]),
            ["doc_id"],
            ["n_tokens"],
            _bucket(),
            _META_DDL,
            token=epoch_token,
        )
    finally:
        toks.unpersist()


def read_postings(spark: SparkSession, root: str) -> DataFrame:
    """Current (gh, doc_id, i) occurrence relation."""
    return state_table.read_state(
        spark, os.path.join(root, _POSTINGS), _POSTINGS_DDL
    ).select("gh", "doc_id", "i")


def read_meta(spark: SparkSession, root: str) -> DataFrame:
    """Current (doc_id, n_tokens) relation (docs >= span_n tokens)."""
    return state_table.read_state(
        spark, os.path.join(root, _META), _META_DDL
    ).select("doc_id", "n_tokens")


def span_fraction(spark: SparkSession, root: str, span_n: int = SPAN_N) -> DataFrame:
    """Current (doc_id, n_tokens, n_dup_tokens, dup_ppm) relation —
    the registered ``repeated_span_fraction`` semantics derived from
    maintained state: a span is duplicated when it occurs in >= 2
    distinct documents; coverage is the distinct token positions under
    duplicated spans."""
    check_span_n(root, span_n)
    occ = read_postings(spark, root)
    dup = (
        occ.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    covered = (
        occ.join(dup, "gh")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {span_n - 1})")).alias("pos"),
        )
        .distinct()
    )
    perdoc = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_tokens")
    )
    return (
        read_meta(spark, root)
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_dup_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_tokens"),
            F.expr(
                "CAST(COALESCE(n_dup_tokens, 0) * 1000000"
                " DIV n_tokens AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


def stream_span_index(
    spark: SparkSession,
    feed_dir: str,
    root: str,
    checkpoint_dir: str,
    schema=None,
    span_n: int = SPAN_N,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` maintain the span postings per micro-batch."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        root,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(
            spark, batch_df, root, epoch_token=token, span_n=span_n
        ),
        schema=schema,
        select_cols=["doc_id", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
