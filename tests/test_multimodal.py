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
