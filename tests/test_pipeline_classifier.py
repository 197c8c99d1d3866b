"""Independent references for the classifier / calibration operators:
a planted-signal corpus proving the NB classifier separates classes
when the text actually carries the label, and pure-Python mirrors of
the exact integer math for both queries on real test data.
"""

from __future__ import annotations

import collections
import hashlib
import math
import re

import pyarrow.parquet as pq

from starknet_indexer_spark.queries.pipeline_classifier import (
    MICRO,
    NB_FEATURES,
    filter_auc_by_lang,
    nb_confusion_from_counts,
    nb_count_partials,
    nb_features,
    nb_lang_classifier,
)

SF_DIR = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _floor_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def _nb_confusion(rows: list[tuple[int, str, str]]) -> dict:
    """Pure-Python mirror of nb_lang_classifier's exact integer math.
    rows = (doc_id, lang, text)."""
    feats: dict[int, list[int]] = {}
    langs: dict[int, str] = {}
    for doc_id, lang, text in rows:
        fs = [_hash60(t) % NB_FEATURES for t in _tokens(text)]
        if not fs:
            continue
        feats[doc_id] = fs
        langs[doc_id] = lang
    classes = sorted({v for v in langs.values()})
    n_docs = collections.Counter(langs.values())
    n_tok = collections.Counter()
    cf: dict[tuple[str, int], int] = collections.Counter()
    global_f = set()
    for d, fs in feats.items():
        n_tok[langs[d]] += len(fs)
        for f in fs:
            cf[(langs[d], f)] += 1
            global_f.add(f)
    n = sum(n_docs.values())
    w = {
        (c, f): _floor_half_up(
            MICRO * math.log((cf.get((c, f), 0) + 1) / (n_tok[c] + NB_FEATURES))
        )
        for c in classes
        for f in global_f
    }
    prior = {
        c: _floor_half_up(MICRO * math.log(n_docs[c] / n)) for c in classes
    }
    confusion = collections.Counter()
    for d, fs in feats.items():
        tf = collections.Counter(fs)
        best = max(
            classes,
            key=lambda c: (
                prior[c] + sum(k * w[(c, f)] for f, k in tf.items()),
                # score desc, class asc: max() keys need class reversed
                tuple(-ord(ch) for ch in c),
            ),
        )
        confusion[(langs[d], best)] += 1
    return dict(confusion)


class TestNbClassifier:
    def test_planted_vocabulary_separates(self, spark):
        """When text carries the label (class-specific vocabulary +
        shared noise), the confusion matrix is diagonal — the
        classifier demonstrably learns; on the real synthetic corpus
        (labels independent of text) it correctly collapses to the
        majority prior, which this test distinguishes from 'broken'."""
        rows = []
        vocab = {
            "aa": "alpha beta gamma delta",
            "bb": "epsilon zeta eta theta",
            "cc": "iota kappa lambda mu",
        }
        noise = "common shared words everywhere"
        i = 0
        for lang, words in vocab.items():
            for k in range(12):
                rows.append((i, lang, f"{words} {noise} {words} tail{k % 3}"))
                i += 1
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        import starknet_indexer_spark.queries.pipeline_classifier as mod
        from starknet_indexer_spark import catalog

        orig = catalog.load
        try:
            # route the query's load() to the planted frame
            mod.load = lambda _s, _d, _n: df
            got = {
                (r["lang"], r["predicted"]): r["n_docs"]
                for r in nb_lang_classifier(spark, SF_DIR).collect()
            }
        finally:
            mod.load = orig
        assert got == {("aa", "aa"): 12, ("bb", "bb"): 12, ("cc", "cc"): 12}
        # and the pure-Python mirror agrees on the planted corpus too
        assert _nb_confusion(rows) == got

    def test_matches_pure_python_on_corpus(self, spark):
        docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas().dropna(
            subset=["text", "lang"]
        )
        rows = [
            (int(r["doc_id"]), r["lang"], r["text"]) for _, r in docs.iterrows()
        ]
        want = _nb_confusion(rows)
        got = {
            (r["lang"], r["predicted"]): r["n_docs"]
            for r in nb_lang_classifier(spark, SF_DIR).collect()
        }
        assert got == want



    def test_unseen_features_get_smoothed_floor_weight(self, spark):
        """r8 ADVICE: scoring docs whose tokens hash to features absent
        from the training support must apply the add-one-smoothed
        zero-count weight ln(1/(n_tok_c + NB_FEATURES)) per class, not
        silently drop the tokens (which skews posteriors toward the
        class with fewer unseen features). Pinned against a pure-Python
        mirror that scores train/test splits explicitly."""
        train_rows = [
            # class "aa" has a much larger token mass than "bb", so the
            # unseen-feature floor ln(1/(n_tok+F)) differs per class —
            # dropping unseen tokens vs flooring them flips predictions
            (0, "aa", "alpha beta gamma delta " * 6),
            (1, "aa", "alpha beta gamma delta epsilon " * 6),
            (2, "bb", "zeta eta"),
            (3, "bb", "zeta theta"),
        ]
        score_rows = [
            # mostly tokens unseen in training + one "bb" token: with
            # the floor, the unseen mass penalizes token-rich "aa" more
            (10, "aa", "novel unseen tokens everywhere zeta"),
            (11, "bb", "zeta fresh vocabulary again"),
        ]
        train_df = spark.createDataFrame(
            train_rows, "doc_id long, lang string, text string"
        )
        score_df = spark.createDataFrame(
            score_rows, "doc_id long, lang string, text string"
        )
        counts = nb_count_partials(nb_features(train_df))
        got = {
            (r["lang"], r["predicted"]): r["n_docs"]
            for r in nb_confusion_from_counts(
                counts, nb_features(score_df)
            ).collect()
        }

        # pure-Python mirror with explicit train/score split
        feats = lambda text: [_hash60(t) % NB_FEATURES for t in _tokens(text)]
        langs = {d: l for d, l, _ in train_rows}
        n_docs = collections.Counter(langs.values())
        n_tok = collections.Counter()
        cf = collections.Counter()
        for d, l, text in train_rows:
            fs = feats(text)
            n_tok[l] += len(fs)
            for f in fs:
                cf[(l, f)] += 1
        classes = sorted(n_docs)
        n = sum(n_docs.values())
        prior = {c: _floor_half_up(MICRO * math.log(n_docs[c] / n)) for c in classes}

        def weight(c, f):
            return _floor_half_up(
                MICRO * math.log((cf.get((c, f), 0) + 1) / (n_tok[c] + NB_FEATURES))
            )

        want = collections.Counter()
        for d, l, text in score_rows:
            tf = collections.Counter(feats(text))
            best = max(
                classes,
                key=lambda c: (
                    prior[c] + sum(k * weight(c, f) for f, k in tf.items()),
                    tuple(-ord(ch) for ch in c),
                ),
            )
            want[(l, best)] += 1
        assert got == dict(want)
        # the scenario actually exercises unseen features
        trained_f = {f for (_, f) in cf}
        assert any(
            f not in trained_f for _, _, t in score_rows for f in feats(t)
        )


class TestAucReference:
    def test_matches_pairwise_definition(self, spark):
        """The rank-sum AUC must equal the O(n^2) pairwise definition
        (P(score_pos > score_neg) + 0.5*P(tie)) on the real corpus."""
        docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas().dropna(
            subset=["text", "lang"]
        )
        scores, langs = [], []
        for _, r in docs.iterrows():
            toks = _tokens(r["text"])
            if not toks:
                continue
            scores.append(
                _floor_half_up(MICRO * sum(len(t) for t in toks) / len(toks))
            )
            langs.append(r["lang"])
        got = {
            r["lang"]: (r["n_pos"], r["n_neg"], r["auc_ppm"])
            for r in filter_auc_by_lang(spark, SF_DIR).collect()
        }
        for cls in sorted(set(langs)):
            pos = [s for s, la in zip(scores, langs) if la == cls]
            neg = [s for s, la in zip(scores, langs) if la != cls]
            wins = sum(1 for p in pos for q in neg if p > q)
            ties = sum(1 for p in pos for q in neg if p == q)
            auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
            assert got[cls] == (
                len(pos),
                len(neg),
                _floor_half_up(MICRO * auc),
            ), cls


class TestTemperatureMix:
    def test_budget_exact_and_quota_respected(self, spark):
        """Largest-remainder apportionment invariants: allocations sum
        EXACTLY to the budget, and every source receives floor(share)
        or ceil(share) of it (the quota property)."""
        from starknet_indexer_spark.queries.pipeline_quality import (
            MIX_BUDGET,
            temperature_mix_allocation,
        )

        rows = temperature_mix_allocation(spark, SF_DIR).collect()
        assert sum(r["budget_tokens"] for r in rows) == MIX_BUDGET
        wq = {r["source"]: _floor_half_up(1e6 * math.sqrt(r["n_tokens"]))
              for r in rows}
        tw = sum(wq.values())
        for r in rows:
            exact = MIX_BUDGET * wq[r["source"]] / tw
            assert math.floor(exact) <= r["budget_tokens"] <= math.ceil(exact), (
                r["source"]
            )
        # alpha=0.5 flattens: the max/min weight ratio must be strictly
        # below the raw token-count ratio (the point of temperature)
        n = {r["source"]: r["n_tokens"] for r in rows}
        if max(n.values()) > min(n.values()):
            flat = max(wq.values()) / min(wq.values())
            raw = max(n.values()) / min(n.values())
            assert flat < raw


class TestAriFormula:
    def test_output_row_satisfies_ari_definition(self, spark):
        """Recompute ARI in pure Python from the emitted pair counts —
        validates the rational-expression + ppm-rounding path (the
        counting itself is validated by the 3-scale DuckDB hash)."""
        from starknet_indexer_spark.queries.pipeline_clustering import (
            clustering_agreement_ari,
        )

        r = clustering_agreement_ari(spark, SF_DIR).collect()[0]
        c = r["n"] * (r["n"] - 1) / 2
        exp = r["pairs_a"] * r["pairs_b"] / c
        ari = (r["pairs_both"] - exp) / ((r["pairs_a"] + r["pairs_b"]) / 2 - exp)
        assert r["ari_ppm"] == _floor_half_up(1e6 * ari)
        assert -1_000_000 <= r["ari_ppm"] <= 1_000_000


def _pav(points: list[tuple[int, int, int]]) -> dict[int, float]:
    """Classic stack PAV over (bin, weight, positives) sorted by bin —
    the sequential algorithm the minimax plan must reproduce."""
    stack: list[list[float]] = []  # [w, pos, first_bin_idx]
    bins = sorted(points)
    for _, w, pos in bins:
        stack.append([w, pos])
        while len(stack) >= 2 and (
            stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):
            w2, p2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += p2
    out: dict[int, float] = {}
    it = iter(bins)
    for w_blk, p_blk in stack:
        consumed = 0
        while consumed < w_blk:
            b, w, _ = next(it)
            out[b] = p_blk / w_blk
            consumed += w
    return out


class TestIsotonicCalibration:
    def test_minimax_plan_equals_stack_pav(self, spark):
        """The declarative max-min-mean fit must equal the sequential
        pool-adjacent-violators algorithm bin for bin (ppm-exact)."""
        from starknet_indexer_spark.queries.pipeline_calibration import (
            isotonic_calibration,
        )

        rows = isotonic_calibration(spark, SF_DIR).collect()
        assert rows, "empty calibration output"
        ref = _pav([(r["bin"], r["n_docs"], r["n_pos"]) for r in rows])
        for r in rows:
            assert r["iso_ppm"] == _floor_half_up(1e6 * ref[r["bin"]]), r["bin"]

    def test_fit_is_monotone_and_probability(self, spark):
        from starknet_indexer_spark.queries.pipeline_calibration import (
            isotonic_calibration,
        )

        rows = sorted(
            isotonic_calibration(spark, SF_DIR).collect(), key=lambda r: r["bin"]
        )
        isos = [r["iso_ppm"] for r in rows]
        assert all(a <= b for a, b in zip(isos, isos[1:]))
        assert all(0 <= v <= 1_000_000 for v in isos)
        # the fit preserves total positive mass (a PAV invariant):
        # sum over bins of w * iso == total positives (up to ppm rounding)
        tot_pos = sum(r["n_pos"] for r in rows)
        fit_mass = sum(r["n_docs"] * r["iso_ppm"] / 1e6 for r in rows)
        assert abs(fit_mass - tot_pos) < 1e-3 * tot_pos + 1


class TestCcnetBuckets:
    def test_tercile_invariants(self, spark):
        """Bucket sizes are balanced up to score-tie granularity, every
        doc lands in exactly one bucket, and bucket score ranges are
        disjoint and ordered (head < middle < tail)."""
        from starknet_indexer_spark.queries.pipeline_quality import (
            ccnet_perplexity_buckets,
        )

        rows = ccnet_perplexity_buckets(spark, SF_DIR).collect()
        assert rows
        by_lang: dict[str, list] = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rs in by_lang.items():
            rs = sorted(rs, key=lambda r: r["bucket"])
            assert [r["bucket"] for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 3
            # disjoint, ordered score ranges
            for a, b in zip(rs, rs[1:]):
                assert a["hi_micro"] < b["lo_micro"], lang
            # bucket populations within one tie-cluster of n/3: with
            # distinct scores only, |bucket| - n/3 is bounded by the
            # largest single-score tie group, which itself is <= bucket
            n = sum(r["n_docs"] for r in rs)
            if len(rs) == 3:
                for r in rs:
                    assert r["n_docs"] >= 1
                    assert abs(r["n_docs"] - n / 3) < n / 3 + 1, (lang, r)
