"""Property tests for the round-3 layout/sketch operators: randomized
inputs, engine output compared against an independent pure-Python
reference (SURVEY §5.2 property-test row, extended).

One Spark job per property: all randomized cases batch into a single
DataFrame.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from starknet_indexer_spark.operators.layout import zorder_key_expr

SEED = 0x20ADE3
N_CASES = 300


def _py_zorder(dims: list[int], bits: int) -> int:
    n = len(dims)
    out = 0
    for i, d in enumerate(dims):
        v = d & ((1 << bits) - 1)
        for j in range(bits):
            out |= ((v >> j) & 1) << (j * n + i)
    return out


class TestZorderKeyProperties:
    def test_matches_pure_python_reference(self, spark):
        rng = random.Random(SEED)
        rows = [
            (i, rng.randint(0, (1 << 16) - 1), rng.randint(0, (1 << 16) - 1),
             rng.randint(0, (1 << 10) - 1))
            for i in range(N_CASES)
        ]
        df = spark.createDataFrame(rows, "i long, a long, b long, c long")
        got2 = {
            r["i"]: r["z"]
            for r in df.select(
                "i", zorder_key_expr([F.col("a"), F.col("b")], 16).alias("z")
            ).collect()
        }
        got3 = {
            r["i"]: r["z"]
            for r in df.select(
                "i",
                zorder_key_expr(
                    [F.col("a"), F.col("b"), F.col("c")], 10
                ).alias("z"),
            ).collect()
        }
        for i, a, b, c in rows:
            assert got2[i] == _py_zorder([a, b], 16), (i, a, b)
            assert got3[i] == _py_zorder([a, b, c], 10), (i, a, b, c)

    def test_bijective_on_dim_tuples(self, spark):
        """Distinct (a, b) tuples within the bit budget must map to
        distinct keys — interleaving is information-preserving, the
        property range-partitioning by key relies on."""
        rng = random.Random(SEED + 1)
        tuples = {(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(N_CASES)}
        keys = {_py_zorder(list(t), 16) for t in tuples}
        assert len(keys) == len(tuples)

    def test_prefix_is_coarse_cell(self):
        """Dropping 2k low key bits = dropping k low bits of EACH dim:
        a key-prefix range is an axis-aligned cell, which is why
        prefix grouping measures locality in both dims at once."""
        rng = random.Random(SEED + 2)
        for _ in range(100):
            a = rng.randint(0, 65535)
            b = rng.randint(0, 65535)
            z = _py_zorder([a, b], 16)
            for k in (2, 4, 6):
                assert z >> (2 * k) == _py_zorder([a >> k, b >> k], 16 - k)


class TestCapHotBandsProperty:
    def test_subset_and_passthrough_on_random_corpora(self, spark):
        """For random corpora: capped candidate pairs are always a
        subset of uncapped, and a cap >= max bucket size is an exact
        passthrough."""
        from starknet_indexer_spark.operators.dedup import (
            cap_hot_bands,
            lsh_candidate_pairs,
            md5_hash60_expr,
            minhash_bands,
            minhash_signature_exprs,
            tokens_expr,
            word_shingles_expr,
        )

        rng = random.Random(SEED + 3)
        vocab = [f"w{i}" for i in range(40)]
        docs = []
        for i in range(120):
            if rng.random() < 0.3 and docs:
                # near-dup of an earlier doc: copy + small mutation
                base = docs[rng.randrange(len(docs))][1].split()
                if base:
                    base[rng.randrange(len(base))] = rng.choice(vocab)
                docs.append((i, " ".join(base)))
            else:
                docs.append(
                    (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30))))
                )
        df = spark.createDataFrame(docs, "doc_id long, text string")
        toks = df.select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        sh = toks.filter(F.size("tokens") >= 3).select(
            "doc_id", word_shingles_expr(F.col("tokens")).alias("shingles")
        )
        hs = sh.select("doc_id", F.transform("shingles", md5_hash60_expr).alias("h"))
        bands = minhash_bands(hs.select("doc_id", *minhash_signature_exprs(F.col("h"))))

        uncapped = {
            (r["a_id"], r["b_id"]) for r in lsh_candidate_pairs(bands).collect()
        }
        max_bucket = (
            bands.groupBy("band", "band_key").count().agg(F.max("count")).collect()[0][0]
        )
        for cap in (1, 2, 4, max_bucket):
            capped = {
                (r["a_id"], r["b_id"])
                for r in lsh_candidate_pairs(cap_hot_bands(bands, cap)).collect()
            }
            assert capped <= uncapped, cap
        passthrough = {
            (r["a_id"], r["b_id"])
            for r in lsh_candidate_pairs(cap_hot_bands(bands, max_bucket)).collect()
        }
        assert passthrough == uncapped
