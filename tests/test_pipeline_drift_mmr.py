"""Beyond-oracle-parity checks for the drift + MMR additions: both
queries are re-derived from the raw parquet with independent
numpy/pure-Python reference implementations (the oracle test proves
Spark==DuckDB; these prove the shared algorithm is the INTENDED one).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from starknet_indexer_spark.queries.pipeline_drift import (
    ks_drift_by_source,
    tvd_drift_by_source,
)
from starknet_indexer_spark.queries.scd import scd2_user_state
from starknet_indexer_spark.queries.pipeline_mmr import (
    MMR_K,
    MMR_LAMBDA_TENTHS,
    MMR_SHORT_N,
    mmr_diverse_topk,
)
from starknet_indexer_spark.queries.pipeline_similarity import N_QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """Spark/DuckDB ROUND(x, 0): half away from zero (numpy rounds
    half to even)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


class TestKsReference:
    def test_matches_numpy_two_sample_ks(self, spark):
        out = (
            ks_drift_by_source(spark, SF_DIR)
            .toPandas()
            .set_index("source")
            .sort_index()
        )
        docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
        xs = np.sort(docs["n_chars"].unique())
        n = len(docs)
        for src, grp in docs.groupby("source"):
            v = grp["n_chars"].to_numpy()
            n_s = len(v)
            n_r = n - n_s
            cum_s = np.searchsorted(np.sort(v), xs, side="right")
            cum_g = np.searchsorted(
                np.sort(docs["n_chars"].to_numpy()), xs, side="right"
            )
            d = np.abs(
                cum_s.astype(object) * n_r - (cum_g - cum_s).astype(object) * n_s
            )
            d_num = int(max(d))
            ks_at = int(xs[np.argmax(d == d_num)])
            row = out.loc[src]
            assert int(row["n_source"]) == n_s
            assert int(row["n_rest"]) == n_r
            assert int(row["d_num"]) == d_num, src
            assert int(row["ks_at"]) == ks_at, src
            assert int(row["d_ppm"]) == d_num * 1_000_000 // (n_s * n_r)


class TestTvdReference:
    def test_matches_numpy_total_variation(self, spark):
        out = (
            tvd_drift_by_source(spark, SF_DIR)
            .toPandas()
            .set_index("source")
            .sort_index()
        )
        docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
        n = len(docs)
        langs = sorted(docs["lang"].unique())
        for src, grp in docs.groupby("source"):
            n_s = len(grp)
            n_r = n - n_s
            tvd_num = 0
            for lg in langs:
                c = int((grp["lang"] == lg).sum())
                cg = int((docs["lang"] == lg).sum())
                tvd_num += abs(c * n_r - (cg - c) * n_s)
            row = out.loc[src]
            assert int(row["tvd_num"]) == tvd_num, src
            assert int(row["tvd_ppm"]) == tvd_num * 1_000_000 // (2 * n_s * n_r)
            # TVD in [0, 1]: tvd_num <= 2 * n_s * n_r
            assert 0 <= int(row["tvd_ppm"]) <= 1_000_000


class TestDriftNullLangCell:
    def test_null_lang_mass_counts_in_grid(self, spark):
        """ADVICE r9: the sources x langs grid join must be NULL-SAFE —
        a NULL lang category appears in the langs dimension, and a
        plain equi-join zeroed its per-source cells, excluding each
        source's own NULL-lang mass from p_s while still counting it
        in the rest. Hand-computed TVD on a corpus whose ONLY drift is
        in the NULL-lang counts: A = {en:4, NULL:6}, B = {en:8,
        NULL:2}. Correct tvd_num per source = |4*10-8*10| +
        |6*10-2*10| = 80 (TVD 0.4); the buggy join produced 120."""
        from starknet_indexer_spark.queries.pipeline_drift import (
            psi_from_counts,
            tvd_from_counts,
        )

        cnt = spark.createDataFrame(
            [("A", "en", 4), ("A", None, 6), ("B", "en", 8), ("B", None, 2)],
            "source string, lang string, c long",
        )
        rows = {r["source"]: r for r in tvd_from_counts(cnt).collect()}
        assert rows["A"]["tvd_num"] == 80, rows["A"]
        assert rows["B"]["tvd_num"] == 80, rows["B"]
        assert rows["A"]["tvd_ppm"] == 80 * 1_000_000 // (2 * 10 * 10)

        # PSI on the same counts, vs the pure-python definition with
        # Laplace smoothing over K=2 categories (en, NULL)
        import math

        psi = {r["source"]: r for r in psi_from_counts(cnt).collect()}
        # per-source cells as (c, c_rest = cg - c): cg(en)=12, cg(NULL)=8
        for src, cells in (("A", [(4, 8), (6, 2)]), ("B", [(8, 4), (2, 6)])):
            want = 0
            for c, c_rest in cells:
                # mirror the engine formula exactly: one IEEE division
                # per share, the log ratio one division of two products
                p_s = (c + 1) / (10 + 2)
                p_r = (c_rest + 1) / (10 + 2)
                ratio = ((c + 1) * (10 + 2)) / ((c_rest + 1) * (10 + 2))
                want += math.floor(
                    1e6 * (p_s - p_r) * math.log(ratio) + 0.5
                )
            assert psi[src]["psi_micro"] == want, (src, psi[src], want)


class TestDriftSingleSourceGuard:
    def test_single_source_yields_zero_ppm_not_division_error(self, spark):
        """n_rest = 0 (one source holds every row) must produce tvd_ppm
        = 0, not DIVIDE_BY_ZERO — the streaming monitor hits this on an
        early single-source feed."""
        from starknet_indexer_spark.queries.pipeline_drift import tvd_from_counts

        cnt = spark.createDataFrame(
            [("only_src", "en", 7), ("only_src", "fr", 3)],
            "source string, lang string, c long",
        )
        rows = tvd_from_counts(cnt).collect()
        assert len(rows) == 1
        assert rows[0]["n_rest"] == 0
        assert rows[0]["tvd_num"] == 0
        assert rows[0]["tvd_ppm"] == 0


class TestScd2Invariants:
    def test_intervals_partition_history(self, spark):
        out = scd2_user_state(spark, SF_DIR).toPandas()
        ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
        for uid, grp in out.groupby("user_id"):
            grp = grp.sort_values("valid_from").reset_index(drop=True)
            # exactly one open (current) interval, and it is the last
            assert int(grp["is_current"].sum()) == 1
            assert bool(grp["is_current"].iloc[-1])
            # intervals chain: each valid_to equals the next valid_from
            assert (
                grp["valid_to"].iloc[:-1].to_numpy()
                == grp["valid_from"].iloc[1:].to_numpy()
            ).all()
            # adjacent versions actually change state
            assert (
                grp["event_type"].iloc[:-1].to_numpy()
                != grp["event_type"].iloc[1:].to_numpy()
            ).all()
            # replaying the raw history through the intervals gives the
            # same state at every event of this user
            h = ev[ev["user_id"] == uid].sort_values("event_id")
            idx = grp["valid_from"].searchsorted(h["event_id"], side="right") - 1
            assert (
                grp["event_type"].to_numpy()[idx] == h["event_type"].to_numpy()
            ).all()


class TestMmrReference:
    def test_matches_greedy_reference(self, spark):
        out = mmr_diverse_topk(spark, SF_DIR).toPandas()
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
        ids = emb["vec_id"].to_numpy()
        X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sim4 = _round_half_up(Xn @ Xn.T * 10_000).astype(np.int64)
        lam, com = MMR_LAMBDA_TENTHS, 10 - MMR_LAMBDA_TENTHS
        expected: list[tuple[int, int, int, int, int]] = []
        for qi in np.where(ids < N_QUERIES)[0]:
            qid = int(ids[qi])
            cands = [(int(-sim4[qi, j]), int(ids[j]), j) for j in range(len(ids)) if j != qi]
            short = sorted(cands)[:MMR_SHORT_N]
            rel = {j: sim4[qi, j] for _, _, j in short}
            remaining = [j for _, _, j in short]
            selected: list[int] = []
            for r in range(1, MMR_K + 1):
                best = None
                for j in remaining:
                    ms = max(int(sim4[j, s]) for s in selected) if selected else 0
                    score = lam * int(rel[j]) - (com * ms if selected else 0)
                    key = (-score, int(ids[j]))
                    if best is None or key < best[0]:
                        best = (key, j, score)
                _, j, score = best
                selected.append(j)
                remaining.remove(j)
                expected.append((qid, int(ids[j]), r, int(rel[j]), score))
        got = sorted(
            (
                int(r["query_id"]),
                int(r["neighbor_id"]),
                int(r["mmr_rank"]),
                int(r["rel4"]),
                int(r["score"]),
            )
            for _, r in out.iterrows()
        )
        assert got == sorted(expected)

    def test_selection_is_diverse_or_equal(self, spark):
        # The MMR set per query is exactly MMR_K unique neighbors.
        out = mmr_diverse_topk(spark, SF_DIR).toPandas()
        g = out.groupby("query_id")["neighbor_id"]
        assert (g.nunique() == MMR_K).all()
        assert (g.count() == MMR_K).all()


class TestPsiReference:
    def test_matches_pure_python_definition(self, spark):
        """Recompute PSI from raw counts in pure Python (Laplace
        smoothing, per-term micro flooring) — independent of the SQL
        grid construction."""
        import collections
        import math

        from starknet_indexer_spark.catalog import load
        from starknet_indexer_spark.queries.pipeline_drift import (
            PSI_ALERT_MICRO,
            psi_drift_by_source,
        )

        sf = "/root/testdata/sf0.001"
        rows = load(spark, sf, "documents").select("source", "lang").collect()
        cnt = collections.Counter((r["source"], r["lang"]) for r in rows)
        langs = sorted({l for _, l in cnt})
        srcs = sorted({s for s, _ in cnt})
        n_s = {s: sum(c for (s2, _), c in cnt.items() if s2 == s) for s in srcs}
        n = sum(n_s.values())
        K = len(langs)
        want = {}
        for s in srcs:
            total = 0
            for l in langs:
                c = cnt.get((s, l), 0)
                cg = sum(cnt.get((s2, l), 0) for s2 in srcs)
                n_r = n - n_s[s]
                p_s = (c + 1) / (n_s[s] + K)
                p_r = (cg - c + 1) / (n_r + K)
                ratio = ((c + 1) * (n_r + K)) / ((cg - c + 1) * (n_s[s] + K))
                total += math.floor(1e6 * (p_s - p_r) * math.log(ratio) + 0.5)
            want[s] = total
        got = {r["source"]: r for r in psi_drift_by_source(spark, sf).collect()}
        assert set(got) == set(want)
        for s in srcs:
            assert got[s]["psi_micro"] == want[s], s
            assert got[s]["alert"] == int(want[s] >= PSI_ALERT_MICRO)
            assert got[s]["psi_micro"] >= 0  # PSI terms are nonnegative
