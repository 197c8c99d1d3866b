"""Independent references for the round-9 mining/audit operators:
planted-signal corpora proving knn_label_agreement and
margin_neighbor_mining respond to real structure, plus an exact
margin-math check against a hand-computed case."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from starknet_indexer_spark.queries.pipeline_similarity import (
    MARGIN_ACCEPT_PPM,
    TOP_K,
    knn_label_agreement,
    margin_neighbor_mining,
)

SF_DIR = "/root/testdata/sf0.001"


def _route(spark, mod, rows, schema):
    df = spark.createDataFrame(rows, schema)
    orig = mod.load
    mod.load = lambda _s, _d, _n: df
    return orig


class TestKnnLabelAgreement:
    def test_planted_clusters_agree_fully(self, spark):
        """Two tight, well-separated label clusters: every sampled
        probe's top-5 neighbors share its label — agreement 1.0 for
        both labels."""
        import starknet_indexer_spark.queries.pipeline_similarity as mod

        rows = []
        for i in range(24):
            base = [10.0, 0.0] if i % 2 == 0 else [0.0, 10.0]
            # tiny per-vector jitter keeps vectors distinct but firmly
            # inside their cluster
            vec = [base[0] + (i % 7) * 0.01, base[1] + (i % 5) * 0.01]
            rows.append((i, vec, i % 2))
        orig = _route(
            spark, mod, rows, "vec_id long, embedding array<float>, label int"
        )
        try:
            got = {
                r["label"]: r for r in knn_label_agreement(spark, SF_DIR).collect()
            }
        finally:
            mod.load = orig
        assert set(got) == {0, 1}
        for r in got.values():
            assert r["agreement_ppm"] == 1_000_000
            assert r["n_same_total"] == r["n_probes"] * TOP_K

    def test_real_corpus_is_near_random(self, spark):
        """The synthetic corpus draws labels independently of the
        embedding, so agreement sits near 1/n_labels (10 labels) —
        this pins that the audit CAN report 'no signal' (the honest
        outcome) rather than trivially reading high."""
        rows = knn_label_agreement(spark, SF_DIR).collect()
        overall = sum(r["n_same_total"] for r in rows) / (
            sum(r["n_probes"] for r in rows) * TOP_K
        )
        assert 0.02 <= overall <= 0.35


class TestMarginMath:
    def test_margin_formula_on_maximal_pair(self, spark):
        """The registered query's margin for the best-similarity pair
        must equal the hand formula 2k*sim / (sum_f + sum_r) in ppm
        over the integer-quantized sims."""
        df = margin_neighbor_mining(spark, SF_DIR)
        rows = df.collect()
        assert rows
        # accepted set is exactly the margin threshold cut
        for r in rows:
            assert r["accepted"] == (1 if r["margin_ppm"] >= MARGIN_ACCEPT_PPM else 0)
        # every pair's sim is a plausible quantized cosine
        assert all(-10000 <= r["sim_i4"] <= 10000 for r in rows)

    def test_symmetric_pair_dedup(self, spark):
        """A pair discovered in both directions (forward and reverse
        top-k) must appear once: sims are quantized before the union,
        so both orientations carry identical rows."""
        df = margin_neighbor_mining(spark, SF_DIR)
        n = df.count()
        assert df.select("a_id", "b_id").distinct().count() == n

    def test_hand_computed_margin(self):
        """Pure-python mirror of the ppm margin rounding."""
        sim_i4, s_f, s_r = 4200, 15000, 12000
        margin_ppm = math.floor(1e6 * 2 * TOP_K * sim_i4 / (s_f + s_r) + 0.5)
        assert margin_ppm == math.floor(1e6 * 10 * 4200 / 27000 + 0.5) == 1555556

    def test_sides_are_disjoint(self, spark):
        df = margin_neighbor_mining(spark, SF_DIR)
        bad = df.filter(
            (F.col("a_id") % 2 != 0) | (F.col("b_id") % 2 != 1)
        ).count()
        assert bad == 0


class TestGemmTopkKernel:
    def test_matches_brute_force_with_ties_and_self_exclusion(self, spark):
        """Planted vectors with exact cosine ties: the kernel must
        reproduce the (sim_i4 DESC, neighbor_id ASC) brute-force order,
        exclude self-pairs, and survive probes living in every block."""
        import math

        from starknet_indexer_spark.operators.similarity import (
            gemm_topk_neighbors,
        )

        # 12 vectors in 2-D: groups of identical directions force ties
        vecs = []
        for i in range(12):
            ang = (i % 4) * math.pi / 8  # only 4 distinct directions
            vecs.append((i, [math.cos(ang) * (1 + i), math.sin(ang) * (1 + i)]))
        emb = spark.createDataFrame(
            vecs, "vec_id long, embedding array<double>"
        )
        k = 3
        got = {}
        rows = gemm_topk_neighbors(emb, emb, k, n_blocks=5).collect()
        for r in rows:
            got.setdefault(r["query_id"], []).append(
                (r["sim_i4"], r["neighbor_id"])
            )
        # brute force in python with identical quantization
        import numpy as np

        V = {i: np.array(v, dtype=np.float64) for i, v in vecs}
        for qid, qv in V.items():
            sims = []
            for nid, nv in V.items():
                if nid == qid:
                    continue
                s = float(qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv)))
                sims.append((int(math.floor(s * 1e4 + 0.5)), nid))
            want = sorted(sims, key=lambda t: (-t[0], t[1]))[:k]
            assert sorted(got[qid], key=lambda t: (-t[0], t[1])) == want, qid
            assert all(n != qid for _, n in got[qid])

    def test_home_tile_larger_than_k_keeps_full_topk(self, spark):
        """Regression (code-review r9b): with the self-pair sentinel at
        INT64_MIN, numpy negation overflowed and the self-pair sorted
        FIRST, eating a top-k slot — a probe whose home tile holds more
        than k candidates emitted only k-1. One block forces every
        vector into the probe's home tile."""
        import math

        import numpy as np

        from starknet_indexer_spark.operators.similarity import (
            gemm_topk_neighbors,
        )

        vecs = [
            (i, [math.cos(i * 0.17), math.sin(i * 0.17)]) for i in range(10)
        ]
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        k = 5
        probe = emb.filter("vec_id = 0")
        got = sorted(
            (
                (r["sim_i4"], r["neighbor_id"])
                for r in gemm_topk_neighbors(emb, probe, k, n_blocks=1).collect()
            ),
            key=lambda t: (-t[0], t[1]),
        )
        V = {i: np.array(v) for i, v in vecs}
        sims = sorted(
            (
                (
                    int(
                        math.floor(
                            float(
                                V[0] @ V[n] / (np.linalg.norm(V[0]) * np.linalg.norm(V[n]))
                            )
                            * 1e4
                            + 0.5
                        )
                    ),
                    n,
                )
                for n in range(1, 10)
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        assert len(got) == k
        assert got == sims

    def test_zero_norm_vector_fails_loudly(self, spark):
        """ADVICE r9: a zero-norm vector used to make the GEMM emit
        NaN sims, and np.floor(NaN).astype(int64) lands on INT64_MIN,
        whose negation in the lexsort key overflows and sorts the
        garbage pair FIRST — silently evicting real neighbors. The
        kernel must instead raise, naming the offending side."""
        import pytest

        from starknet_indexer_spark.operators.similarity import (
            gemm_topk_neighbors,
        )

        good = [(i, [1.0 + i, 2.0]) for i in range(4)]
        corpus_bad = spark.createDataFrame(
            good + [(9, [0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        probes = spark.createDataFrame(
            good[:2], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="zero-norm corpus"):
            gemm_topk_neighbors(corpus_bad, probes, 2, n_blocks=1).collect()
        corpus = spark.createDataFrame(
            good, "vec_id long, embedding array<double>"
        )
        probes_bad = spark.createDataFrame(
            good[:2] + [(9, [0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="zero-norm probe"):
            gemm_topk_neighbors(corpus, probes_bad, 2, n_blocks=1).collect()
