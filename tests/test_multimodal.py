"""Multimodal plumbing tests: mapInPandas schema/batch correctness and
exact equivalence of the feature stub against a pure-python reference
(the rows-only query's replacement for a SQL oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.functions.multimodal import (
    MAX_SAMPLED_FRAMES,
    N_FEATURES,
    decode_real,
    extract_features,
    media_expr,
    sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


def _media_df(spark):
    docs = load(spark, SF_DIR, "documents")
    return docs.select(
        "doc_id",
        "text",
        media_expr(F.col("text")).alias("media"),
        (1 + F.octet_length(media_expr(F.col("text"))) % 16).cast("bigint").alias("n_frames"),
    )


class TestFrameSample:
    def test_counts_and_bounds(self, spark):
        df = _media_df(spark)
        frames = sample_frames(df.select("doc_id", "media", "n_frames"))
        per_doc = frames.groupBy("doc_id").count()
        joined = df.join(per_doc, "doc_id").select(
            "doc_id", "n_frames", "count"
        )
        for r in joined.collect():
            assert r["count"] == min(r["n_frames"], MAX_SAMPLED_FRAMES), r

    def test_fingerprint_matches_python(self, spark):
        import hashlib

        df = _media_df(spark).limit(5)
        frames = {
            (r["doc_id"], r["frame_idx"]): r["frame_md5"]
            for r in sample_frames(df.select("doc_id", "media", "n_frames")).collect()
        }
        for r in df.collect():
            b = bytes(r["media"])
            hx = b.hex().upper()
            n_frames = r["n_frames"]
            flen = max(len(b) // n_frames, 1)
            n_samp = min(n_frames, MAX_SAMPLED_FRAMES)
            for k in range(n_samp):
                idx = (k * n_frames) // n_samp
                chunk = hx[idx * flen * 2 : (idx * flen + flen) * 2]
                assert frames[(r["doc_id"], idx)] == hashlib.md5(chunk.encode()).hexdigest()


class TestFeatures:
    def test_matches_pure_python(self, spark):
        df = _media_df(spark)
        got = {r["doc_id"]: r for r in extract_features(df.select("doc_id", "media")).collect()}
        for r in df.collect():
            b = bytes(r["media"])
            step = max(len(b) // N_FEATURES, 1)
            want = []
            for i in range(N_FEATURES):
                chunk = b[i * step : (i + 1) * step]
                want.append(round(sum(chunk) / (255.0 * len(chunk)), 6) if chunk else 0.0)
            g = got[r["doc_id"]]
            assert g["n_bytes"] == len(b)
            assert [round(x, 6) for x in g["features"]] == want

    def test_feature_schema(self, spark):
        df = extract_features(_media_df(spark).select("doc_id", "media"))
        assert [f.name for f in df.schema.fields] == ["doc_id", "n_bytes", "features"]
        assert df.schema["features"].dataType.simpleString() == "array<double>"


def test_real_decoder_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError):
        decode_real(_media_df(spark), "image")


class TestPhash:
    def _ref_fp(self, payload: bytes) -> int:
        """Pure-Python pHash mirror (no numpy) of phash_fingerprints."""
        import math

        n = len(payload)
        img = [[payload[(r * 32 + c) % n] for c in range(32)] for r in range(32)]
        pooled = [
            [
                sum(img[4 * r + dr][4 * c + dc] for dr in range(4) for dc in range(4))
                for c in range(8)
            ]
            for r in range(8)
        ]
        B = [
            [round(1_000_000 * math.cos((2 * r + 1) * u * math.pi / 16)) for r in range(8)]
            for u in range(8)
        ]
        coef = [
            [
                sum(B[u][r] * pooled[r][c] * B[v][c] for r in range(8) for c in range(8))
                for v in range(8)
            ]
            for u in range(8)
        ]
        ac = [coef[u][v] for u in range(8) for v in range(8)][1:]
        med = sorted(ac)[31]
        return sum((1 << i) for i, x in enumerate(ac) if x > med)

    def test_matches_pure_python_reference(self, spark):
        from starknet_indexer_spark.queries.pipeline_multimodal import (
            phash_fingerprints,
        )

        docs = load(spark, SF_DIR, "documents").limit(25)
        got = {r["doc_id"]: r["fingerprint"] for r in phash_fingerprints(docs).collect()}
        src = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert got
        for doc_id, text in src.items():
            payload = text.encode("utf-8")
            if not payload:
                assert doc_id not in got
                continue
            assert got[doc_id] == self._ref_fp(payload), doc_id

    def test_planted_near_identical_payloads_pair_up(self, spark):
        """Two long documents differing by one character must land
        within the Hamming budget (perceptual robustness), and an
        unrelated doc must not pair with either."""
        from starknet_indexer_spark.queries.pipeline_multimodal import (
            PHASH_MAX_HAMMING,
            phash_fingerprints,
        )
        from pyspark.sql import functions as F

        base = ("the quick brown fox jumps over the lazy dog " * 40).strip()
        tweaked = base[:-1] + "!"
        other = "".join(chr(97 + (i * 7) % 26) for i in range(1800))
        docs = spark.createDataFrame(
            [(1, base), (2, tweaked), (3, other)], ["doc_id", "text"]
        )
        fps = {r["doc_id"]: r["fingerprint"] for r in phash_fingerprints(docs).collect()}
        ham = bin(fps[1] ^ fps[2]).count("1")
        assert ham <= PHASH_MAX_HAMMING, ham
        assert bin(fps[1] ^ fps[3]).count("1") > PHASH_MAX_HAMMING
