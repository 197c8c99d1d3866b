"""Unit tests for the dedup/similarity operators beyond oracle parity:
planted near-duplicates are found, SimHash byte-band blocking is
*exact* (== brute force) for hamming < n_bands, LSH buckets are
well-formed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.operators.dedup import (
    N_BANDS,
    SIMHASH_N_BANDS,
    lsh_candidate_pairs,
    md5_hash60_expr,
    minhash_bands,
    minhash_signature_exprs,
    simhash_fingerprint,
    simhash_near_pairs,
    tokens_expr,
    word_shingles_expr,
)
from starknet_indexer_spark.operators.similarity import N_PLANES, with_bucket

SF_DIR = "/root/testdata/sf0.001"

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions under a pale winter moon near the old stone bridge"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE.replace("winter", "summer")),  # near-dup of 1
        (3, "completely unrelated text about distributed query engines "
            "partitioning shuffles broadcast joins and columnar storage formats"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _minhash_pairs(docs):
    toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
    sh = toks.filter(F.size("tokens") >= 3).select(
        "doc_id", word_shingles_expr(F.col("tokens")).alias("shingles")
    )
    hs = sh.select("doc_id", F.transform("shingles", md5_hash60_expr).alias("h"))
    sigs = hs.select("doc_id", *minhash_signature_exprs(F.col("h")))
    return lsh_candidate_pairs(minhash_bands(sigs))


class TestMinHash:
    def test_planted_near_dup_found(self, spark):
        pairs = {(r["a_id"], r["b_id"]) for r in _minhash_pairs(_docs(spark)).collect()}
        assert (1, 2) in pairs

    def test_identical_docs_always_candidates(self, spark):
        docs = spark.createDataFrame([(1, BASE), (2, BASE)], "doc_id long, text string")
        pairs = _minhash_pairs(docs).collect()
        assert [(r["a_id"], r["b_id"]) for r in pairs] == [(1, 2)]

    def test_signature_width(self, spark):
        docs = _docs(spark)
        toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        sh = toks.select("doc_id", word_shingles_expr(F.col("tokens")).alias("shingles"))
        hs = sh.select("doc_id", F.transform("shingles", md5_hash60_expr).alias("h"))
        sigs = hs.select("doc_id", *minhash_signature_exprs(F.col("h")))
        bands = minhash_bands(sigs)
        assert bands.count() == 3 * N_BANDS


class TestHotBandCap:
    def _bands(self, docs):
        toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        sh = toks.filter(F.size("tokens") >= 3).select(
            "doc_id", word_shingles_expr(F.col("tokens")).alias("shingles")
        )
        hs = sh.select("doc_id", F.transform("shingles", md5_hash60_expr).alias("h"))
        return minhash_bands(hs.select("doc_id", *minhash_signature_exprs(F.col("h"))))

    def test_passthrough_below_cap(self, spark):
        """No bucket above the cap -> identical pairs (the common case
        must not change results)."""
        from starknet_indexer_spark.operators.dedup import cap_hot_bands

        bands = self._bands(_docs(spark))
        uncapped = {
            (r["a_id"], r["b_id"]) for r in lsh_candidate_pairs(bands).collect()
        }
        capped = {
            (r["a_id"], r["b_id"])
            for r in lsh_candidate_pairs(cap_hot_bands(bands, 100)).collect()
        }
        assert capped == uncapped

    def test_capped_pairs_are_subset_and_bounded(self, spark):
        """A planted boilerplate mega-group: every doc shares the same
        text, so all collapse into the same band buckets. With cap=c
        the mega-bucket is dropped entirely; pairs from cooler buckets
        survive. Output must be a subset of the uncapped output, and
        the mega-group's quadratic pair set must be gone."""
        from starknet_indexer_spark.operators.dedup import cap_hot_bands

        boiler = [(100 + i, BASE) for i in range(20)]  # 20 identical docs
        distinct_pair = [
            (1, BASE.replace("winter", "summer") + " unique tail marker one"),
            (2, BASE.replace("winter", "summer") + " unique tail marker one"),
        ]
        docs = spark.createDataFrame(
            boiler + distinct_pair, "doc_id long, text string"
        )
        bands = self._bands(docs)
        uncapped = {
            (r["a_id"], r["b_id"]) for r in lsh_candidate_pairs(bands).collect()
        }
        capped = {
            (r["a_id"], r["b_id"])
            for r in lsh_candidate_pairs(cap_hot_bands(bands, 8)).collect()
        }
        assert capped <= uncapped
        # the 20-doc mega-group (190 quadratic pairs) is capped away...
        assert not any(a >= 100 and b >= 100 for a, b in capped)
        # ...while the small near-dup pair in its own cool bucket survives
        assert (1, 2) in capped

    def test_cap_bites_on_corpus(self, spark):
        """At sf0.001 the cap must actually drop buckets (otherwise the
        registered query only ever exercises the passthrough path and
        the driver row proves nothing about capping)."""
        from starknet_indexer_spark.catalog import load
        from starknet_indexer_spark.queries.pipeline_dedup import BAND_CAP

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        bands = self._bands(docs)
        hot = (
            bands.groupBy("band", "band_key")
            .count()
            .filter(F.col("count") > BAND_CAP)
            .count()
        )
        assert hot > 0


class TestSimHash:
    def test_banding_is_exact_for_small_hamming(self, spark):
        """Banded candidate pairs == brute-force pairs for hamming <
        SIMHASH_N_BANDS (pigeonhole) on real corpus data."""
        docs = load(spark, SF_DIR, "documents")
        fps = simhash_fingerprint(docs).cache()
        max_h = SIMHASH_N_BANDS - 1

        banded = {
            (r["a_id"], r["b_id"], r["hamming"])
            for r in simhash_near_pairs(fps, max_h).collect()
        }
        a = fps.select(F.col("doc_id").alias("a_id"), F.col("fingerprint").alias("a_fp"))
        b = fps.select(F.col("doc_id").alias("b_id"), F.col("fingerprint").alias("b_fp"))
        brute = {
            (r["a_id"], r["b_id"], r["hamming"])
            for r in a.join(b, F.col("a_id") < F.col("b_id"))
            .select(
                "a_id", "b_id",
                F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp"))).alias("hamming"),
            )
            .filter(F.col("hamming") <= max_h)
            .collect()
        }
        fps.unpersist()
        assert banded == brute
        assert len(brute) > 0  # corpus contains near-dups; test is non-vacuous


class TestLshAnn:
    def test_bucket_range_and_coverage(self, spark):
        emb = load(spark, SF_DIR, "embeddings")
        vb = with_bucket(emb)
        stats = vb.agg(
            F.min("bucket").alias("lo"),
            F.max("bucket").alias("hi"),
            F.countDistinct("bucket").alias("n"),
        ).collect()[0]
        assert 0 <= stats["lo"] and stats["hi"] < (1 << N_PLANES)
        assert stats["n"] > 1  # hyperplanes actually split the corpus


class TestAsofJoin:
    def test_semantics(self, spark):
        from starknet_indexer_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, 10, "a"), (1, 15, "b"), (1, 20, "c"), (2, 5, "d")],
            "k long, ts long, tag string",
        )
        right = spark.createDataFrame(
            [(1, 10, 100.0), (1, 18, 180.0), (3, 1, 999.0)],
            "k long, ts long, v double",
        )
        got = {
            (r["k"], r["ts"], r["tag"], r["v"])
            for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()
        }
        assert got == {
            (1, 10, "a", 100.0),   # tie: right row at t matches left at t
            (1, 15, "b", 100.0),   # most recent at-or-before
            (1, 20, "c", 180.0),
            (2, 5, "d", None),     # no right row for key -> null
        }
