"""Silver-layer materialization: shingle / minhash-band relations
computed once at ingest, reused by every dedup consumer.

The near-dup stack (minhash_lsh_dedup and friends) re-derives the
tokenize → shingle → hash → signature → band chain from raw text on
every run — self-contained for correctness checking, but at deployment
scale that chain is ingest work: you pay it once per NEW document, not
once per query. This module is that deployment path:

- ``build_silver_relations``  — the one definition of the chain (the
  exact operators the queries use, so silver == recompute by
  construction);
- ``materialize_silver``      — write/extend ``doc_shingles`` and
  ``minhash_bands`` under a silver root; ``incremental=True``
  anti-joins on doc_id so re-ingesting a corpus only processes novel
  documents (the batch twin of streaming/dedup_index's maintained LSH
  index);
- ``ensure_silver``           — content-keyed cache for the query
  layer: the ``*_silver`` driver queries call it and read the
  materialized relations instead of raw text.

Scale notes: ``minhash_bands`` is written repartitioned by
``band_key`` so the candidate self-join co-locates each bucket in one
partition file cluster; ``doc_shingles`` stays doc_id-clustered for
the verify joins. At 100 TB the silver tables are the dedup indexes —
queries touch raw text only through them.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import (
    md5_hash60_expr,
    minhash_bands,
    minhash_signature_exprs,
    shingle_relation,
    tokens_expr,
    word_ngrams_expr,
)

SILVER_VERSION = "v3"  # bump when any silver derivation changes
#: n-gram width of the decontamination relation — the single
#: definition (queries.pipeline_dedup imports it)
DECONTAM_N = 5
#: /tmp cache root for test-corpus silver builds (ONE definition —
#: bench.py clears it via clear_cache(); a drifting literal there would
#: silently reintroduce stale cold timings)
SILVER_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_silver")


def clear_cache() -> None:
    """Remove every cached test-corpus silver build (cold-timing reset)."""
    shutil.rmtree(SILVER_CACHE_ROOT, ignore_errors=True)


def spread(df: DataFrame) -> DataFrame:
    """Rebalance a NARROW scan to the session's default parallelism
    before one wide map pass — a no-op when the input is already at
    least that parallel.

    The bulk silver build runs its expensive tokenize/shingle pass
    straight off a table scan, and the test corpora are SINGLE
    parquet files with one row group — one task, one of 32 cores. A
    corpus-sized shuffle ahead of ONE wide map pass is a measured win
    there (~20% off the warm build). It is NOT free: skip it when the
    scan is already parallel (many-file deployment inputs), and never
    use it ahead of a chain of small shuffling jobs (k-means/PQ
    training) or inside micro-batch folds — both measured as net
    losses (SCALE.md 6t). Build outputs are set-semantics relations
    with integer-exact arithmetic, so results are partitioning-
    invariant (pinned by the cached-vs-retrained equality tests).
    Registered QUERY plans never call this — their fingerprints
    measure the declared plan, not build plumbing."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def build_decontam_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, source, gh): each document's DISTINCT hashed
    {DECONTAM_N}-word n-grams — the relation decontamination probes
    (train side = every non-eval source, eval side = the held-out
    split). ONE definition shared by the self-contained queries and
    the materialized silver table."""
    toks = docs.select(
        "doc_id", "source", tokens_expr(F.col("text")).alias("tokens")
    )
    return (
        toks.filter(F.size("tokens") >= DECONTAM_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(word_ngrams_expr(F.col("tokens"), DECONTAM_N))
            ).alias("gram"),
        )
        .select("doc_id", "source", md5_hash60_expr(F.col("gram")).alias("gh"))
    )


def build_silver_relations(
    docs: DataFrame, materialize_bands: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(doc_shingles, minhash_bands) for a batch of raw documents.

    doc_shingles: (doc_id, shingles array<string>, h array<bigint>) —
    verify-join side; ``h`` is the 60-bit hash array the signature
    derivation already computes (md5_hash60 per shingle, positionally
    aligned with ``shingles``), stored so hash-set consumers (the
    setjoin ranked build) never re-run the md5 pass at query time
    (r12, guide §2.4 — don't recompute at query time what ingest
    already computed).
    minhash_bands: (doc_id, band, band_key) — LSH bucketing relation.
    The shared ``shingle_relation`` feeds both outputs (one tokenize ->
    shingle -> hash chain repo-wide); the lazy localCheckpoint pins it
    to one evaluation.

    ``materialize_bands=True`` (r12): the band relation feeds BOTH
    sides of the LSH candidate self-join, and one side comes back as a
    broadcast — no exchange reuse fires, so the 16-permutation
    signature projection (array_min over a transform per permutation,
    the heavy interpreted pass) executes twice. One lazy
    localCheckpoint pins it to one evaluation. The re-deriving batch
    dedup queries opt in; the silver materializer keeps the default
    (its single consumer is the write — a checkpoint would be pure
    overhead)."""
    rel = shingle_relation(docs).localCheckpoint(eager=False)
    sh = rel.select("doc_id", "shingles", "h")
    sigs = rel.select("doc_id", *minhash_signature_exprs(F.col("h")))
    bands = minhash_bands(sigs)
    if materialize_bands:
        bands = bands.localCheckpoint(eager=False)
    return sh, bands


def materialize_silver(
    spark: SparkSession,
    docs: DataFrame,
    silver_dir: str,
    incremental: bool = True,
    rebalance: bool = True,
) -> dict[str, int]:
    """Write (or incrementally extend) the silver relations.

    ``incremental=True`` is the ingest-time maintenance mode: documents
    whose doc_id is already present in ``doc_shingles`` are skipped, so
    appending a feed batch costs one anti-join plus the derivation of
    only the NOVEL documents. Returns rows written per table.
    ``rebalance=False`` skips the bulk-build spread() — the right mode
    for micro-batch folds, where a per-batch shuffle measured as a net
    loss (SCALE.md 6t; stream_materialize passes it)."""
    sh_path = os.path.join(silver_dir, "doc_shingles")
    bands_path = os.path.join(silver_dir, "minhash_bands")
    grams_path = os.path.join(silver_dir, "decontam_grams")
    if incremental and os.path.isdir(sh_path):
        existing = spark.read.parquet(sh_path).select("doc_id")
        docs = docs.join(existing, "doc_id", "left_anti")
    # spread() BEFORE the checkpoint: the corpus arrives as one scan
    # task (single-file test corpus) and the shingle/gram derivations
    # are the expensive pass — materialize them across all cores
    if rebalance:
        docs = spread(docs)
    docs = docs.localCheckpoint(eager=False)  # feeds two derivations
    # sh is already lazily checkpointed inside build_silver_relations,
    # so the count, the write, and the band derivation all read one
    # materialization
    sh, bands = build_silver_relations(docs)
    n_sh = sh.count()
    if n_sh == 0:
        return {"doc_shingles": 0, "minhash_bands": 0}
    # WRITE ORDER IS THE CRASH CONTRACT: the incremental anti-join
    # keys on doc_shingles, so doc_shingles is the commit point and
    # must land LAST. Bands-first means a crash between the two
    # appends leaves band rows whose doc re-derives (and re-appends
    # bands) on retry — duplicate band rows, which the candidate join
    # dedupes (lsh_candidate_pairs is DISTINCT over pairs). The
    # reverse order would lose band rows with no self-heal: docs
    # classified as present while their buckets never materialized.
    # Cluster the band relation on its join key so every LSH bucket is
    # physically co-located for the candidate self-join.
    # decontam_grams rides the same contract: written BEFORE the
    # doc_shingles commit point, so a crash-retry can only leave
    # duplicate gram rows — absorbed by the consumers' DISTINCT (train
    # side dedups; the eval side of the silver-backed query dedups
    # explicitly). Clustered on the probe join key. NOTE: a doc with
    # 3-4 tokens has shingles but no 5-grams, and the anti-join keys
    # on doc_shingles — so gram coverage follows shingle coverage
    # exactly (tokens >= 5 implies tokens >= 3).
    build_decontam_grams(docs).repartition("gh").write.mode("append").parquet(
        grams_path
    )
    bands.repartition("band_key").write.mode("append").parquet(bands_path)
    sh.write.mode("append").parquet(sh_path)
    # band rows written this call = docs written x N_BANDS (each doc
    # emits exactly one row per band) — no extra job needed
    from .operators.dedup import N_BANDS

    return {"doc_shingles": n_sh, "minhash_bands": n_sh * N_BANDS}


def _corpus_digest(path: str) -> str:
    """Content digest of documents.parquet (file or part-file dir).

    The cache key must be CONTENT-derived (ADVICE r6): a replaced
    corpus with identical mtime/size must miss, and a bench 'cold'
    run must not silently reuse a previous invocation's build for a
    byte-identical corpus only when the bytes really are identical.
    Test corpora are MBs, so a full streaming hash is cheap; this
    helper is test-scope — at production scale silver is materialized
    at ingest (materialize_silver), not cached in /tmp."""
    h = hashlib.sha256()
    files = (
        sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        h.update(os.path.basename(fp).encode())
        with open(fp, "rb") as f:
            while chunk := f.read(1 << 20):
                h.update(chunk)
    return h.hexdigest()


def artifact_cache_key(tag: str, digest: str, params: str) -> str:
    """The ONE content-keyed training-artifact key derivation —
    md5("tag:digest:params")[:16]. Production callers and the key
    tests share this function verbatim (r8 ADVICE: a test re-deriving
    the key with its own field order pins nothing)."""
    return hashlib.md5(f"{tag}:{digest}:{params}".encode()).hexdigest()[:16]


def artifact_dir(src_path: str, tag: str, params: str) -> str:
    """Cache location for an offline training artifact derived from
    ``src_path`` (a parquet file/dir) under ``params``."""
    key = artifact_cache_key(tag, _corpus_digest(src_path), params)
    return os.path.join(SILVER_CACHE_ROOT, f"{tag}_{key}")


def ensure_artifact(src_path: str, tag: str, params: str, writer) -> str:
    """Content-keyed artifact cache for offline training outputs
    (k-means centroids, PQ/IVF-PQ codebooks). At deployment scale
    model training is an OFFLINE artifact — a sampled fit persisted
    alongside the index and refreshed when the corpus drifts — not
    part of every search plan. Key = content digest of ``src_path`` +
    every training hyperparameter + a derivation version (callers
    fold these into ``params``); a _READY sentinel makes a crashed
    half-write rebuild. Lives under SILVER_CACHE_ROOT so bench's
    clear_cache() cold-timing reset covers it too."""
    d = artifact_dir(src_path, tag, params)
    ready = os.path.join(d, "_READY")
    if not os.path.exists(ready):
        shutil.rmtree(d, ignore_errors=True)
        writer(d)
        with open(ready, "w") as f:
            f.write("ok")
    return d


def _silver_cache_dir(sf_dir: str) -> str:
    """Content-keyed cache location for a test-corpus silver build:
    sha256(documents.parquet bytes) + derivation version."""
    digest = _corpus_digest(os.path.join(sf_dir, "documents.parquet"))
    key = hashlib.md5(f"{digest}:{SILVER_VERSION}".encode()).hexdigest()[:16]
    return os.path.join(SILVER_CACHE_ROOT, key)


def ensure_silver(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) and return the silver root for a corpus dir.
    A _SILVER_READY sentinel written after a complete build makes a
    crashed half-build rebuild rather than serve partial relations."""
    from .catalog import load

    d = _silver_cache_dir(sf_dir)
    ready = os.path.join(d, "_SILVER_READY")
    if not os.path.exists(ready):
        shutil.rmtree(d, ignore_errors=True)
        docs = load(spark, sf_dir, "documents")
        materialize_silver(spark, docs, d, incremental=False)
        with open(ready, "w") as f:
            f.write("ok")
    return d


def stream_materialize(
    spark: SparkSession,
    feed_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = 1,
):
    """Structured Streaming driver: document rows arriving in
    ``feed_dir`` maintain the silver relations per micro-batch —
    "built once at ingest" as a RUNNING stream, not just a batch call.

    Idempotence is layered: the shared epoch-marker guard
    (state_table.stream_maintain_with) short-circuits replayed
    micro-batches, and materialize_silver's doc_id anti-join absorbs
    any redelivered documents that slip past it (e.g. the same doc in
    two feed files), so the relations hold one row set per document
    regardless of delivery count."""
    from .streaming import state_table

    return state_table.stream_maintain_with(
        spark,
        feed_dir,
        silver_dir,
        checkpoint_dir,
        lambda batch_df, _token: materialize_silver(
            spark, batch_df, silver_dir, incremental=True, rebalance=False
        ),
        schema=schema,
        select_cols=["doc_id", "source", "text"],
        max_files_per_trigger=max_files_per_trigger,
    )
