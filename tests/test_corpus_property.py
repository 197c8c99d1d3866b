"""Property-style tests for the corpus operators: each checks an
engine output against an independent pure-Python model (SURVEY §5.2 —
the reference's own oracle pattern: incremental table vs from-scratch
view, src/dao.ts:510-515, generalized to randomized inputs).

One Spark job per property — randomized cases batch into a single
DataFrame.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.operators.dedup import tokens_expr, word_ngrams_expr
from starknet_indexer_spark.queries.pipeline_corpus import SESSION_GAP_S
from starknet_indexer_spark.queries.pipeline_text import (
    WINNOW_B,
    WINNOW_K,
    WINNOW_P,
    WINNOW_W,
)
from starknet_indexer_spark.queries.registry import REGISTRY

SEED = 0xC0FFEE
SF_DIR = "/root/testdata/sf0.001"


class TestWordNgrams:
    def test_matches_python_model(self, spark):
        rng = random.Random(SEED)
        vocab = ["a", "bb", "ccc", "dd0", "e", "ff", "g9"]
        cases = [
            [rng.choice(vocab) for _ in range(rng.randint(0, 12))] for _ in range(200)
        ]
        df = spark.createDataFrame(
            [(i, toks) for i, toks in enumerate(cases)], "i INT, tokens ARRAY<STRING>"
        )
        for n in (2, 3):
            got = {
                r["i"]: r["ng"]
                for r in df.select(
                    "i", word_ngrams_expr(F.col("tokens"), n).alias("ng")
                ).collect()
            }
            for i, toks in enumerate(cases):
                want = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
                assert got[i] == want, (n, toks)

    def test_tokenizer_matches_python_model(self, spark):
        rng = random.Random(SEED + 1)
        alphabet = "abcZ019 .,!-_\t\n"
        cases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))) for _ in range(200)]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], "i INT, text STRING")
        got = {
            r["i"]: r["toks"]
            for r in df.select("i", tokens_expr(F.col("text")).alias("toks")).collect()
        }
        for i, text in enumerate(cases):
            want = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
            assert got[i] == want, repr(text)


class TestSessionizeInvariants:
    """Structural invariants of gap sessionization, checked against the
    raw event stream: sessions tile each user's timeline (counts sum),
    intra-session gaps <= threshold, inter-session gaps > threshold."""

    def test_invariants_on_corpus(self, spark):
        sessions = REGISTRY["sessionize_events"].fn(spark, SF_DIR).collect()
        # go through catalog.load so this model shares the catalog's
        # timestamp normalization (nanos->us / NTZ->TZ) with the query
        ev = (
            load(spark, SF_DIR, "events")
            .selectExpr("user_id", "event_id", "unix_timestamp(ts) as ts_s")
            .collect()
        )
        by_user: dict[int, list[tuple[int, int]]] = {}
        for r in ev:
            by_user.setdefault(r["user_id"], []).append((r["event_id"], r["ts_s"]))
        # python model: sort by event_id, split on gap > threshold
        want: dict[tuple[int, int], tuple[int, int, int]] = {}
        for u, rows in by_user.items():
            rows.sort()
            seq, start, prev, n = 0, None, None, 0
            for _, t in rows:
                if prev is None or t - prev > SESSION_GAP_S:
                    if start is not None:
                        want[(u, seq)] = (n, start, prev)
                    seq += 1
                    start, n = t, 0
                n += 1
                prev = t
            want[(u, seq)] = (n, start, prev)
        got = {
            (r["user_id"], r["session_seq"]): (
                r["n_events"],
                r["session_start"],
                r["session_end"],
            )
            for r in sessions
        }
        assert got == want
        for r in sessions:
            assert r["duration_s"] == r["session_end"] - r["session_start"] >= 0


class TestIncrementalDedupEquivalence:
    """The incremental (new-batch-vs-corpus) MinHash query equals the
    full-corpus recompute restricted to cross-split pairs — the
    reference's own incremental-table-vs-view oracle (src/dao.ts:
    510-515) applied to the dedup pipeline."""

    def test_matches_full_recompute(self, spark):
        from starknet_indexer_spark.queries.pipeline_dedup import NEW_BATCH_MOD

        full = REGISTRY["minhash_lsh_dedup"].fn(spark, SF_DIR).collect()
        inc = REGISTRY["minhash_dedup_incremental"].fn(spark, SF_DIR).collect()
        want = {
            (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"])): (r["inter"], r["jaccard"])
            for r in full
            if (r["a_id"] % NEW_BATCH_MOD == 0) != (r["b_id"] % NEW_BATCH_MOD == 0)
        }
        got = {
            (min(r["corpus_id"], r["new_id"]), max(r["corpus_id"], r["new_id"])): (
                r["inter"],
                r["jaccard"],
            )
            for r in inc
        }
        assert got == want
        assert len(inc) > 0  # the property is vacuous on an empty result


class TestKMeansModel:
    """The k-means query equals an independent pure-Python Lloyd
    implementation on the real embeddings — quantization, integer
    distances, floor-mean updates, and tie-breaks all reproduced."""

    def test_matches_python_model(self, spark):
        import math

        from starknet_indexer_spark.queries.pipeline_clustering import (
            KMEANS_K,
            KMEANS_UPDATES,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
        qv = {
            r["vec_id"]: [math.floor(float(x) * 1e6 + 0.5) for x in r["embedding"]]
            for r in emb
        }

        def assign(cents):
            out = {}
            for vid, v in qv.items():
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(v, cv)), cid)
                    for cid, cv in cents.items()
                )
                out[vid] = (best[1], best[0])
            return out

        cents = {vid: qv[vid] for vid in range(KMEANS_K)}
        for _ in range(KMEANS_UPDATES):
            a = assign(cents)
            groups: dict[int, list[int]] = {}
            for vid, (cid, _) in a.items():
                groups.setdefault(cid, []).append(vid)
            cents = {
                cid: [
                    math.floor(sum(qv[v][k] for v in vs) / len(vs))
                    for k in range(len(next(iter(qv.values()))))
                ]
                for cid, vs in groups.items()
            }
        want = assign(cents)
        got = {
            r["vec_id"]: (r["cluster"], r["d2"])
            for r in REGISTRY["kmeans_cluster_assign"].fn(spark, SF_DIR).collect()
        }
        assert got == want
        assert len({c for c, _ in got.values()}) > 1  # non-degenerate


class TestWinnowingModel:
    """The winnowing query equals an independent Python implementation
    of Schleimer-style fingerprinting (k-gram polynomial rolling hash,
    per-window minima, distinct-sorted) on every corpus document."""

    @staticmethod
    def _python_fp(text: str) -> list[int]:
        cs = [ord(c) for c in re.sub(r"[^a-zA-Z0-9]+", " ", text.lower())]
        if len(cs) < WINNOW_K:
            return []
        hs = []
        for i in range(len(cs) - WINNOW_K + 1):
            acc = 0
            for c in cs[i : i + WINNOW_K]:
                acc = (acc * WINNOW_B + c) % WINNOW_P
            hs.append(acc)
        if len(hs) < WINNOW_W:
            return []
        fps = {min(hs[j : j + WINNOW_W]) for j in range(len(hs) - WINNOW_W + 1)}
        return sorted(fps)

    def test_matches_python_model(self, spark):
        got = {
            r["doc_id"]: (r["n_fingerprints"], r["min_fingerprint"])
            for r in REGISTRY["winnowing_fingerprint"].fn(spark, SF_DIR).collect()
        }
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        checked = 0
        for d in docs:
            fp = self._python_fp(d["text"])
            if not fp:
                assert d["doc_id"] not in got
                continue
            assert got[d["doc_id"]] == (len(fp), fp[0]), d["doc_id"]
            checked += 1
        assert checked > 0


class TestSubstringDedupRewrite:
    def test_planted_duplication_removed_first_kept(self, spark):
        """Planted corpus: doc 1 carries an 8-token span; doc 2 embeds
        the same span inside fresh text; doc 3 repeats a span within
        itself. The rewrite keeps every globally-first occurrence
        (doc 1 untouched), strips the repeat from doc 2, and strips
        doc 3's self-repetition."""
        from starknet_indexer_spark.queries import pipeline_dedup as mod
        from starknet_indexer_spark.queries.pipeline_dedup import (
            SPAN_N,
            substring_dedup_rewrite,
        )

        assert SPAN_N == 8  # the planted spans below are 8 tokens
        span = "alpha bravo charlie delta echo foxtrot golf hotel"
        self_rep = "one two three four five six seven eight"
        rows = [
            (1, f"prefix words here {span} suffix words"),
            (2, f"totally different opening {span} and a different close"),
            (3, f"{self_rep} middle filler {self_rep}"),
            (4, "short doc"),  # below the window: passes through
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        orig = mod.load
        try:
            mod.load = lambda _s, _d, _n: df
            got = {
                r["doc_id"]: r
                for r in substring_dedup_rewrite(spark, "unused").collect()
            }
        finally:
            mod.load = orig

        # doc 1: first occurrence of the span — untouched
        assert got[1]["n_removed"] == 0
        assert got[1]["text_dedup"] == f"prefix words here {span} suffix words"
        # doc 2: the 8 span positions are covered and removed
        assert got[2]["n_removed"] == 8
        assert (
            got[2]["text_dedup"]
            == "totally different opening and a different close"
        )
        # doc 3: self-repetition — the SECOND occurrence is removed
        # (plus any bridging spans that also repeat; here none bridge
        # because the filler breaks them)
        assert got[3]["text_dedup"].startswith(self_rep)
        assert got[3]["n_removed"] == 8
        assert got[3]["text_dedup"] == f"{self_rep} middle filler"
        # doc 4: shorter than the window — unchanged
        assert got[4]["n_removed"] == 0 and got[4]["text_dedup"] == "short doc"
        # token accounting holds everywhere
        for r in got.values():
            kept = len(r["text_dedup"].split()) if r["text_dedup"] else 0
            assert kept == r["n_tokens"] - r["n_removed"]


class TestBucketedPacking:
    def test_bin_math_and_fill_invariants(self, spark):
        """slots_per_bin * bucket <= capacity, n_bins = ceil(n_docs /
        slots), content fits capacity, fill <= 1."""
        import math

        from starknet_indexer_spark.queries.pipeline_corpus import (
            PACK_CAP,
            bucketed_sequence_packing,
        )

        rows = bucketed_sequence_packing(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r["bucket"] * r["slots_per_bin"] <= PACK_CAP
            assert r["slots_per_bin"] == PACK_CAP // r["bucket"]
            assert r["n_bins"] == math.ceil(r["n_docs"] / r["slots_per_bin"])
            assert r["content_tokens"] <= r["capacity_tokens"]
            assert 0 < r["fill_ppm"] <= 1_000_000
            # within-bucket padding bound: every doc is > bucket/2 tokens
            # (else it would be in a smaller bucket), so content >
            # half the occupied slot capacity of all FULL bins
            if r["n_docs"] >= r["slots_per_bin"]:  # at least one full bin
                assert r["content_tokens"] * 2 > (
                    (r["n_docs"] // r["slots_per_bin"])
                    * r["slots_per_bin"]
                    * (r["bucket"] // 2)
                )

    def test_planted_exact_packing(self, spark):
        """Docs of exactly 2^k tokens pack with zero internal padding:
        fill of a full bin of 64 16-token docs is 1024/1024."""
        from starknet_indexer_spark.queries.pipeline_corpus import (
            bucketed_sequence_packing,
        )
        # build a tiny parquet corpus: 64 docs x 16 tokens, 2 docs x 1024
        import os

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * 16), "en", "s", 16) for i in range(64)]
            + [(100 + i, " ".join(["w"] * 1024), "en", "s", 1024) for i in range(2)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        import tempfile

        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["bucket"]: r
            for r in bucketed_sequence_packing(spark, d).collect()
        }
        assert got[16]["n_bins"] == 1 and got[16]["fill_ppm"] == 1_000_000
        assert got[1024]["n_bins"] == 2 and got[1024]["fill_ppm"] == 1_000_000
