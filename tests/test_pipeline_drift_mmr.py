"""Beyond-oracle-parity checks for the drift + MMR additions: both
queries are re-derived from the raw parquet with independent
numpy/pure-Python reference implementations (the oracle test proves
Spark==DuckDB; these prove the shared algorithm is the INTENDED one).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from starknet_indexer_spark.queries.pipeline_drift import ks_drift_by_source
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
