"""Independent pure-Python references for the round-7 selection /
graph / time-series operators — cross-checks that do not share a line
of logic with either engine (the DuckDB oracles mirror the derivation;
these re-derive it from the raw parquet with python/numpy semantics).
"""

from __future__ import annotations

import collections
import hashlib
import math
import re

import pyarrow.parquet as pq

from starknet_indexer_spark.queries.olap import EWMA_K, ewma_hourly_close
from starknet_indexer_spark.queries.pipeline_graph import (
    TRI_K,
    TRI_NODES,
    knn_graph_triangles,
)
from starknet_indexer_spark.queries.pipeline_selection import (
    MICRO,
    N_FEATURES,
    SELECT_N,
    TARGET_SOURCE,
    dsir_importance_weights,
)

SF_DIR = "/root/testdata/sf0.001"


def _round_half_away(x: float) -> int:
    """Mirror Spark/DuckDB ROUND (half away from zero); Python's
    built-in round() is half-to-even and diverges on exact .5 values
    (e.g. value 0.125 -> 12.5 cents)."""
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _floor_half_up(x: float) -> int:
    """Mirror the engines' FLOOR(x + 0.5) micro-unit quantization (the
    cross-engine-safe idiom — ADVICE r7 moved ewma/dsir onto it; it
    rounds halves toward +inf, unlike ROUND's away-from-zero)."""
    return int(math.floor(x + 0.5))


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestDsirReference:
    def test_matches_pure_python_importance(self, spark):
        # mirror the query's null semantics: explode drops null token
        # arrays, the raw-pool filter drops null sources
        docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas().dropna(
            subset=["text", "source"]
        )
        feats = {}  # doc_id -> list of feature ids
        srcs = {}
        for _, r in docs.iterrows():
            feats[r["doc_id"]] = [
                _hash60(t) % N_FEATURES for t in _tokens(r["text"])
            ]
            srcs[r["doc_id"]] = r["source"]
        tgt = collections.Counter(
            f for d, fs in feats.items() if srcs[d] == TARGET_SOURCE for f in fs
        )
        raw = collections.Counter(
            f for d, fs in feats.items() if srcs[d] != TARGET_SOURCE for f in fs
        )
        tt, tr = sum(tgt.values()), sum(raw.values())
        w = {
            f: _floor_half_up(
                MICRO
                * (
                    math.log((tgt.get(f, 0) + 1) / (tt + N_FEATURES))
                    - math.log((raw.get(f, 0) + 1) / (tr + N_FEATURES))
                )
            )
            for f in set(tgt) | set(raw)
        }
        scores = {
            d: (sum(w[f] for f in fs), len(fs))
            for d, fs in feats.items()
            if srcs[d] != TARGET_SOURCE
        }
        want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:SELECT_N]

        got = (
            dsir_importance_weights(spark, SF_DIR)
            .toPandas()
            .sort_values(["importance_micro", "doc_id"], ascending=[False, True])
        )
        assert len(got) == len(want)
        for (doc, (imp, ntok)), (_, row) in zip(want, got.iterrows()):
            assert row["doc_id"] == doc
            assert row["importance_micro"] == imp
            assert row["n_tokens"] == ntok


class TestTriangleReference:
    def test_matches_brute_force_adjacency_intersection(self, spark):
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
        emb = emb[emb["vec_id"] < TRI_NODES]
        vecs = {
            int(r["vec_id"]): list(map(float, r["embedding"]))
            for _, r in emb.iterrows()
        }
        norms = {v: math.sqrt(sum(x * x for x in vec)) for v, vec in vecs.items()}

        def cos(a, b):
            num = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            return _round_half_away(num / (norms[a] * norms[b]) * 10_000) / 10_000

        edges = set()
        ids = sorted(vecs)
        for u in ids:
            sims = sorted(
                ((cos(u, v), -v) for v in ids if v != u), reverse=True
            )[:TRI_K]
            for _, neg_v in sims:
                v = -neg_v
                edges.add((min(u, v), max(u, v)))
        adj = collections.defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        tri_count = collections.Counter()
        for a, b in edges:
            for c in adj[a] & adj[b]:
                if c > b:  # a < b < c exactly once
                    tri_count[a] += 1
                    tri_count[b] += 1
                    tri_count[c] += 1
        got = {
            int(r["node"]): (int(r["n_triangles"]), int(r["degree"]))
            for r in knn_graph_triangles(spark, SF_DIR).collect()
        }
        want = {
            n: (c, len(adj[n])) for n, c in tri_count.items()
        }
        assert got == want


class TestEwmaReference:
    def test_matches_pure_python_recurrence(self, spark):
        """The truncated dyadic EWMA equals the directly-computed
        weighted mean over each row's trailing K+1 ticks."""
        ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
        ev = ev.dropna(subset=["value", "event_type", "ts"])
        # events.parquet stores ns timestamps as int64 (see catalog.load)
        out = {}
        for etype, grp in ev.groupby("event_type"):
            grp = grp.sort_values(["ts", "event_id"])
            cents = [_round_half_away(v * 100) for v in grp["value"]]
            ts_ns = list(grp["ts"])
            eids = list(grp["event_id"])
            for i in range(len(cents)):
                lo = max(0, i - EWMA_K)
                num = sum(
                    c * 2 ** (EWMA_K - (i - j))
                    for j, c in enumerate(cents[lo : i + 1], start=lo)
                )
                den = sum(
                    2 ** (EWMA_K - (i - j)) for j in range(lo, i + 1)
                )
                em = _floor_half_up(1_000_000 * (num / den))
                t = ts_ns[i]  # pandas Timestamp (ns)
                hour = t.floor("h")
                key = (etype, hour.to_pydatetime())
                off = (t.value - hour.value) // 1000  # micros, like Spark
                prev = out.get(key)
                if prev is None or (off, eids[i]) > prev[0]:
                    out[key] = ((off, eids[i]), em, (prev[2] + 1 if prev else 1))
                else:
                    out[key] = (prev[0], prev[1], prev[2] + 1)
        got = {
            (r["event_type"], r["hour"]): (
                int(r["close_ewma_micro"]),
                int(r["n_rows"]),
            )
            for r in ewma_hourly_close(spark, SF_DIR).collect()
        }
        want = {k: (v[1], v[2]) for k, v in out.items()}
        assert got == want
