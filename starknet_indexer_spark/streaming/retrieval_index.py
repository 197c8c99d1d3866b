"""Continuously-maintained inverted (BM25) retrieval index.

Extends the maintained-state family (dedup pairs, containment, spans,
CDC ledger, media) to RETRIEVAL: a document feed folds into a
segment-log inverted index, and BM25 ranking over any query-term set
is readable at any moment without re-tokenizing the corpus — the
maintained counterpart of the registered ``bm25_topk`` batch query.

Layout — the Lucene shape, built from this package's own primitives:

- ``root/segments``: per-epoch IMMUTABLE posting segments
  (``epoch=<token>/term_bucket=<b>/``, via the shared epoch-keyed
  writer). Each row is (term, doc_id, tf, dl) for the epoch's NOVEL
  documents over the FULL vocabulary (an index answers any query, not
  a fixed term list). A replayed epoch overwrites ITS OWN segment —
  never touches others — so the fold cost is strictly batch-sized:
  no generation-merge rewrite of O(corpus-tokens) state (the failure
  mode the span index's doc_id-range buckets mitigate is absent here
  by construction). ``term_bucket = pmod(xxhash64(term), N)`` makes a
  query probe prune to its terms' sub-partitions of every segment.
- ``root/doc_len``: (doc_id, dl) generation state (doc_id-range
  buckets) — the novelty guard AND the corpus stats (N, total_dl)
  source. tf counts are additive across redeliveries, so novel docs
  are established by anti-join against this state before a segment is
  written (the CDC-ledger protocol).

Fold order: segment write BEFORE the doc_len fold. A crash between the
two replays safely — the segment rewrite is idempotent per epoch and
``novel`` still excludes nothing new (doc_len unchanged); the reverse
order would lose the segment with no self-heal (docs marked seen whose
postings never landed). Same-epoch full replays short-circuit on the
doc_len token.

Read consistency (code-review r11): the segment log and the doc_len
generation are TWO stores with no cross-store commit point, so a probe
racing a fold can score an epoch's new postings against stats that
still exclude those docs. Probes are snapshot-consistent BETWEEN
folds — the single-writer + between-commits-reader contract every
maintained state here documents; a deployment needing mid-fold probes
adds a Lucene-style commit-point file naming the visible (segments,
doc_len generation) pair.

Equality contract (tests/test_retrieval_index.py): after any batch
split of the corpus, ``bm25_topk_from_index`` == the registered batch
``bm25_topk`` on the same corpus — the scoring/ranking algebra is
literally the same function (queries.retrieval.bm25_rank_postings).

Scale shape: the fold tokenizes only the batch (one map pass + one
posting aggregate); segments accumulate like any log-structured index
and compact via ``compact_segments`` — a manifest-guarded rewrite of
all epochs into one segment (the bucket-swap recovery pattern of
maintenance.py, applied to the segment log; small-file growth is
bounded by the compaction cadence). A probe reads only the queried
term buckets of each segment (partition pruning on term_bucket), the
df/stats sides are tiny broadcasts, and ranking shuffles posting-
list-sized relations only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens_expr
from ..queries.retrieval import TOP_K, bm25_rank_postings, bm25_topk_projection
from . import state_table

#: term-hash sub-partitions per segment (probe pruning unit)
N_TERM_BUCKETS = 16
#: doc_ids per doc_len state bucket (the span_index convention)
BUCKET_RANGE = 2048

_SEGMENTS = "segments"
_DOC_LEN = "doc_len"
_DOC_LEN_DDL = "doc_id bigint, dl bigint"


def _term_bucket():
    return F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")


def apply_batch(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    epoch_token: str | None = None,
) -> None:
    """Fold one (doc_id, text) micro-batch into the index."""
    recover_compaction(root)  # writer-entry resume of a crashed compaction
    seg_dir = os.path.join(root, _SEGMENTS)
    dl_state = os.path.join(root, _DOC_LEN)
    if epoch_token is not None and state_table.applied_token(dl_state) == epoch_token:
        return  # fully committed epoch (segment landed before the fold)

    seen = state_table.read_state(spark, dl_state, _DOC_LEN_DDL).select("doc_id")
    novel = (
        docs.select("doc_id", "text")
        .dropDuplicates(["doc_id"])
        .join(seen, "doc_id", "left_anti")
        .select("doc_id", tokens_expr(F.col("text")).alias("t"))
        .select("doc_id", F.size("t").cast("long").alias("dl"), F.col("t"))
        .cache()
    )
    try:
        postings = (
            novel.select(
                "doc_id", "dl", F.explode("t").alias("term")
            )
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
            .withColumn("term_bucket", _term_bucket())
        )
        state_table.write_epoch_pairs(
            postings, seg_dir, epoch_token, partition_by=["term_bucket"]
        )
        state_table.merge_batch(
            spark,
            dl_state,
            novel.select("doc_id", "dl"),
            lambda df: df.dropDuplicates(["doc_id"]),
            ["doc_id"],
            ["dl"],
            F.expr(f"CAST(doc_id DIV {BUCKET_RANGE} AS INT)"),
            _DOC_LEN_DDL,
            token=epoch_token,
        )
    finally:
        novel.unpersist()


def read_postings(
    spark: SparkSession, root: str, terms: list[str] | None = None
) -> DataFrame:
    """(doc_id, term, tf, dl) postings; typed-empty when no segment
    has landed yet. ``terms`` prunes the read to those terms'
    term_bucket sub-partitions (partition pruning before any data is
    read) — the bucket ids come from one control-plane evaluation of
    the SAME Spark-side hash the fold used (len(terms) rows; xxhash64
    has no driver-side twin here)."""
    seg_dir = os.path.join(root, _SEGMENTS)
    if not os.path.isdir(seg_dir):
        return spark.createDataFrame(
            [], "doc_id bigint, term string, tf bigint, dl bigint"
        )
    base = spark.read.option("basePath", seg_dir).parquet(seg_dir)
    if terms is not None:
        buckets = [
            r["b"]
            for r in spark.createDataFrame([(t,) for t in terms], "term string")
            .select(_term_bucket().alias("b"))
            .distinct()
            .collect()
        ]
        base = base.filter(F.col("term_bucket").isin(buckets)).filter(
            F.col("term").isin(terms)
        )
    return base.select("doc_id", "term", "tf", "dl")


def bm25_topk_from_index(
    spark: SparkSession,
    root: str,
    query_terms: list[tuple[int, str]],
    top_k: int = TOP_K,
) -> DataFrame:
    """BM25 top-k per query from the maintained index — the registered
    ``bm25_topk`` output shape, any term set."""
    terms = sorted({t for _, t in query_terms})
    tf = read_postings(spark, root, terms=terms)
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = state_table.read_state(
        spark, os.path.join(root, _DOC_LEN), _DOC_LEN_DDL
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    qt = spark.createDataFrame(list(query_terms), "query_id bigint, term string")
    return bm25_topk_projection(bm25_rank_postings(tf, dfq, qt, stats), top_k)


_COMPACT_MANIFEST = "_compact_manifest.json"


def recover_compaction(root: str) -> None:
    """Resume a crashed ``compact_segments`` — idempotent, cheap when
    there is nothing to do. Every crash point leaves either the old
    epochs or the compacted segment (or, transiently, both) readable;
    this replays the remaining steps in order."""
    import json
    import shutil

    seg_dir = os.path.join(root, _SEGMENTS)
    mpath = os.path.join(seg_dir, _COMPACT_MANIFEST)
    if not os.path.exists(mpath):
        # orphan tmp dirs from a crash BEFORE the manifest landed are
        # invisible to readers (dot-prefixed) — sweep them
        if os.path.isdir(seg_dir):
            for e in os.listdir(seg_dir):
                if e.startswith(".compact-"):
                    shutil.rmtree(os.path.join(seg_dir, e), ignore_errors=True)
        return
    with open(mpath) as f:
        m = json.load(f)
    tmp = os.path.join(seg_dir, m["tmp"])
    final = os.path.join(seg_dir, m["final"])
    if not os.path.isdir(final):
        if os.path.isdir(tmp):
            os.replace(tmp, final)
        else:  # manifest from a cycle whose data never landed — abort it
            os.remove(mpath)
            return
    for old in m["old"]:
        shutil.rmtree(os.path.join(seg_dir, old), ignore_errors=True)
    os.remove(mpath)


def compact_segments(spark: SparkSession, root: str) -> int:
    """Rewrite every epoch segment into ONE compacted segment (same
    term_bucket layout) — the log-structured index's small-file
    remedy. Returns the number of epoch dirs compacted away.

    SINGLE-WRITER, BETWEEN FOLDS: call from the fold owner (e.g. a
    maintenance tick), never while an epoch is mid-fold — at that
    point the last epoch's doc_len token is committed, so a replay of
    it short-circuits instead of re-writing a segment the compaction
    already absorbed. Crash protocol (the manifest pattern): 1. write
    the merged postings to an invisible ``.compact-<id>`` dir; 2.
    fsync a manifest naming (tmp, final, old dirs); 3. rename tmp ->
    ``epoch=compacted-<id>``; 4. delete the old epoch dirs; 5. delete
    the manifest. ``recover_compaction`` resumes from any crash point;
    readers between steps 3 and 4 transiently see duplicates — the
    same between-commits reader contract as the fold itself."""
    import json

    recover_compaction(root)
    seg_dir = os.path.join(root, _SEGMENTS)
    if not os.path.isdir(seg_dir):
        return 0
    old = sorted(
        e for e in os.listdir(seg_dir)
        if e.startswith("epoch=") and os.path.isdir(os.path.join(seg_dir, e))
    )
    if len(old) <= 1:
        return 0
    cid = os.urandom(8).hex()
    tmp_name, final_name = f".compact-{cid}", f"epoch=compacted-{cid}"
    merged = (
        spark.read.option("basePath", seg_dir)
        .parquet(seg_dir)
        .select("doc_id", "term", "tf", "dl", "term_bucket")
        # cluster on the partition key so the compacted segment holds
        # ~one file per term bucket (the silver repartition("gh")
        # convention) instead of shuffle-partitions x buckets shards
        .repartition("term_bucket")
    )
    merged.write.mode("overwrite").partitionBy("term_bucket").parquet(
        os.path.join(seg_dir, tmp_name)
    )
    mpath = os.path.join(seg_dir, _COMPACT_MANIFEST)
    tmp_m = mpath + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump({"tmp": tmp_name, "final": final_name, "old": old}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_m, mpath)
    recover_compaction(root)  # steps 3-5 shared with crash recovery
    return len(old)


def stream_retrieval_index(
    spark: SparkSession,
    feed_dir: str,
    root: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` maintain the inverted index per micro-batch."""
    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        root,
        checkpoint_dir,
        lambda batch_df, token: apply_batch(spark, batch_df, root, epoch_token=token),
        schema=schema,
        select_cols=["doc_id", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
