"""Beyond-oracle-parity checks for the round-5 ML additions:

- the BPE merge fold implements greedy left-to-right non-overlapping
  merging (reference Python implementation, overlapping-run cases),
- the integer power-iteration PCA actually converges to the float
  eigensolver's dominant direction (numpy cross-check),
- the weighted WOR sample is biased toward heavy items.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from starknet_indexer_spark.queries.pipeline_bpe import _fold_merge
from starknet_indexer_spark.queries.pipeline_corpus import weighted_sample_topk
from starknet_indexer_spark.queries.pipeline_pca import (
    PCA_QUANT,
    between_class_pca,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_merge(syms: list[str], x: str, y: str) -> list[str]:
    """Reference greedy left-to-right BPE merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


class TestBpeFold:
    CASES = [
        (["a", "b", "c"], "a", "b"),
        (["a", "a", "a"], "a", "a"),  # overlapping run: greedy -> aa, a
        (["a", "a", "a", "a"], "a", "a"),  # -> aa, aa
        (["a", "b", "a", "b"], "a", "b"),  # consecutive occurrences
        (["x", "a", "b", "a", "b", "y"], "a", "b"),
        (["a", "b"], "a", "b"),  # pair at the very start
        (["q", "z"], "a", "b"),  # no occurrence
    ]

    def test_fold_matches_reference(self, spark):
        rows = [(i, syms, x, y) for i, (syms, x, y) in enumerate(self.CASES)]
        df = spark.createDataFrame(
            rows, "id long, syms array<string>, bx string, by string"
        )
        got = {
            r["id"]: r["m"]
            for r in df.select("id", _fold_merge().alias("m")).collect()
        }
        for i, (syms, x, y) in enumerate(self.CASES):
            assert got[i] == _ref_merge(syms, x, y), (syms, x, y)


class TestBpeSingleSymbolWords:
    def test_collapsed_word_does_not_crash_pair_explode(self, spark, tmp_path):
        """A word whose symbols merge down to ONE token must contribute
        no pairs: Spark's sequence(1, 0) yields [1, 0] (negative-step
        inference), and without the size>=2 guard element_at(syms, 0)
        throws under ANSI. Corpus engineered so ('a', '</w>') wins the
        first merge, collapsing the word 'a' to a 1-element array."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq_w

        from starknet_indexer_spark.queries.pipeline_bpe import bpe_train_merges

        docs = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": ["a a a a a a a a b"] * 4,
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [17] * 4,
            }
        )
        pq_w.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
        out = bpe_train_merges(spark, str(tmp_path)).collect()
        got = {r["merge_rank"]: (r["left_sym"], r["right_sym"]) for r in out}
        assert got[1] == ("a", "</w>")  # collapses 'a' to one symbol
        # round 2 still runs on the collapsed vocabulary (no crash);
        # rounds 3-4 have no pairs left and emit nothing — the same
        # merges-exhausted behavior as the DuckDB oracle (empty bN).
        assert got == {1: ("a", "</w>"), 2: ("b", "</w>")}


class TestPcaDirection:
    def test_matches_numpy_dominant_eigenvector(self, spark):
        out = between_class_pca(spark, SF_DIR).toPandas()
        v = (
            out.sort_values("dim")["loading"].to_numpy().astype(np.float64)
        )
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
        X = np.floor(
            np.stack(emb["embedding"].to_numpy()).astype(np.float64) * PCA_QUANT
            + 0.5
        )
        lab = emb["label"].to_numpy()
        n = len(X)
        S = X.sum(axis=0)
        B = np.zeros((X.shape[1], X.shape[1]))
        for c in sorted(set(lab)):
            nc = int((lab == c).sum())
            u = n * X[lab == c].sum(axis=0) - nc * S
            u = np.trunc(u * 1_000_000 / max(np.abs(u).max(), 1))
            B += np.outer(u, u)
        evals, evecs = np.linalg.eigh(B)
        top = evecs[:, np.argmax(evals)]
        cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
        # 6 matrix squarings raise the between-class eigenvalue gap
        # to the 64th power: the integer result must be collinear
        # with the float eigensolver's dominant direction.
        assert cos > 0.999, cos


class TestWeightedSampleBias:
    def test_sample_overweights_long_docs(self, spark):
        sample = weighted_sample_topk(spark, SF_DIR).toPandas()
        docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
        corpus_mean_w = (1 + np.minimum(docs["n_chars"] // 80, 7)).mean()
        assert len(sample) == 100
        assert sample["doc_id"].is_unique  # without replacement
        # E-S keys: heavier docs get max-of-more draws, so the sampled
        # mean weight must exceed the corpus mean.
        assert sample["weight"].mean() > corpus_mean_w
