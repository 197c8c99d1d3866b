"""Maintained segment-log BM25 index: ranking derived from the index
== the registered bm25_topk batch query under any batch split;
redelivery (same-epoch replay, cross-epoch resend, crash between the
segment write and the doc_len fold) never double-counts; stream
restart is a no-op; term_bucket pruning reaches the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.retrieval import _QUERY_TERMS, bm25_topk
from starknet_indexer_spark.streaming import retrieval_index as ri
from starknet_indexer_spark.streaming import state_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text")


def _want(spark):
    return _rows(bm25_topk(spark, SF))


def _got(spark, root):
    return _rows(ri.bm25_topk_from_index(spark, root, _QUERY_TERMS))


class TestIndexEqualsBatch:
    def test_sequential_batches_equal_batch_query(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            ri.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        got = _got(spark, root)
        want = _want(spark)
        assert got == want
        assert want  # fixture queries actually match documents

    def test_cross_epoch_redelivery_absorbed(self, spark, tmp_path):
        """tf/df are additive — the doc_len novelty guard must absorb
        documents redelivered in a LATER epoch."""
        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
        ri.apply_batch(spark, docs, root)  # evens redelivered
        assert _got(spark, root) == _want(spark)

    def test_same_epoch_replay_short_circuits(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs, root, epoch_token="ns:0")
        gen = state_table.current_gen(f"{root}/{ri._DOC_LEN}")
        ri.apply_batch(spark, docs, root, epoch_token="ns:0")
        assert state_table.current_gen(f"{root}/{ri._DOC_LEN}") == gen
        assert _got(spark, root) == _want(spark)

    def test_crash_between_segment_and_fold_replay_is_exact(
        self, spark, tmp_path, monkeypatch
    ):
        """Crash AFTER the segment write, BEFORE the doc_len fold: the
        replayed epoch must REWRITE its own segment (idempotent) and
        complete the fold — no duplicate postings, no lost segment."""
        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root,
                       epoch_token="ns:0")

        real = state_table.merge_batch

        def crashing(*a, **kw):
            raise RuntimeError("injected crash before doc_len fold")

        monkeypatch.setattr(state_table, "merge_batch", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            ri.apply_batch(spark, docs, root, epoch_token="ns:1")
        monkeypatch.setattr(state_table, "merge_batch", real)

        ri.apply_batch(spark, docs, root, epoch_token="ns:1")  # replay
        assert _got(spark, root) == _want(spark)
        # a later full resend is absorbed by the now-complete guard
        ri.apply_batch(spark, docs, root, epoch_token="ns:2")
        assert _got(spark, root) == _want(spark)

    def test_term_bucket_pruning_reaches_scan(self, spark, tmp_path):
        """The probe's term_bucket filter must prune segment
        sub-partitions — PartitionFilters in the scan node."""
        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs, root)
        plan = ri.bm25_topk_from_index(
            spark, root, _QUERY_TERMS
        )._jdf.queryExecution().executedPlan().toString()
        # the filter must reach the scan as a PARTITION filter (directory
        # pruning), not a post-scan data filter that merely mentions the
        # column (code-review r11)
        import re

        m = re.search(r"PartitionFilters: \[[^\]]*term_bucket", plan)
        assert m, plan[:2000]

    def test_probe_on_empty_index_returns_typed_empty(self, spark, tmp_path):
        """A probe before the first fold must degrade to an empty
        top-k, not raise PATH_NOT_FOUND (code-review r11)."""
        out = ri.bm25_topk_from_index(
            spark, str(tmp_path / "nothing"), _QUERY_TERMS
        )
        assert out.count() == 0
        assert set(out.columns) == {
            "query_id", "doc_id", "rank", "n_terms_matched", "score"
        }


class TestCompaction:
    def test_compaction_preserves_ranking_and_bounds_segments(
        self, spark, tmp_path
    ):
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            ri.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        want = _want(spark)
        assert _got(spark, root) == want
        n = ri.compact_segments(spark, root)
        assert n == 3
        seg_dir = os.path.join(root, ri._SEGMENTS)
        epochs = [e for e in os.listdir(seg_dir) if e.startswith("epoch=")]
        assert len(epochs) == 1 and epochs[0].startswith("epoch=compacted-")
        assert _got(spark, root) == want
        # compacting a compacted index is a no-op
        assert ri.compact_segments(spark, root) == 0
        # ... and later folds append fresh segments next to it: a
        # post-compaction epoch must not double-count on replay
        ri.apply_batch(spark, docs, root, epoch_token="ns:9")
        ri.apply_batch(spark, docs, root, epoch_token="ns:9")
        assert _got(spark, root) == want

    def test_crashed_compaction_recovers_at_writer_entry(
        self, spark, tmp_path, monkeypatch
    ):
        """Crash after the manifest lands but before the rename/deletes:
        the next writer entry (a fold) must resume the compaction —
        rename the tmp segment, drop the old epochs, remove the
        manifest — with ranking unchanged."""
        import json
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(2):
            ri.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == i), root)
        want = _want(spark)
        seg_dir = os.path.join(root, ri._SEGMENTS)
        originals = {
            e for e in os.listdir(seg_dir) if e.startswith("epoch=")
        }

        # run compaction steps 1-2 only (crash before rename)
        real = ri.recover_compaction
        calls = {"n": 0}

        def crash_after_manifest(r):
            calls["n"] += 1
            if calls["n"] == 2:  # the post-manifest resume inside compact
                raise RuntimeError("injected crash before rename")
            return real(r)

        monkeypatch.setattr(ri, "recover_compaction", crash_after_manifest)
        with pytest.raises(RuntimeError, match="injected crash"):
            ri.compact_segments(spark, root)
        monkeypatch.setattr(ri, "recover_compaction", real)

        assert os.path.exists(os.path.join(seg_dir, ri._COMPACT_MANIFEST))
        # next fold resumes the compaction at entry (an all-seen/empty
        # batch writes NO segment of its own — ADVICE r11)
        ri.apply_batch(spark, docs.limit(0), root)
        assert not os.path.exists(os.path.join(seg_dir, ri._COMPACT_MANIFEST))
        epochs = {e for e in os.listdir(seg_dir) if e.startswith("epoch=")}
        assert not (epochs & originals)  # pre-compaction segments gone
        assert any(e.startswith("epoch=compacted-") for e in epochs)
        assert _got(spark, root) == want


class TestStreaming:
    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        root = str(tmp_path / "root")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = ri.stream_retrieval_index(
            spark, feed, root, ck, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _want(spark)
        assert _got(spark, root) == want
        q2 = ri.stream_retrieval_index(
            spark, feed, root, ck, max_files_per_trigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _got(spark, root) == want


class TestPositionalIndex:
    """VERDICT r11 mandate #3: the segment log carries positional
    postings, so phrase queries run off the maintained index — pinned
    equal to the registered batch phrase_match, compaction preserving
    positional ranking."""

    def _phrase_want(self, spark):
        from starknet_indexer_spark.queries.retrieval import phrase_match

        return _rows(phrase_match(spark, SF))

    def _phrase_got(self, spark, root):
        from starknet_indexer_spark.queries.retrieval import _PHRASES

        return _rows(ri.phrase_match_from_index(spark, root, _PHRASES))

    def test_phrase_from_index_equals_batch(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            ri.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        want = self._phrase_want(spark)
        assert self._phrase_got(spark, root) == want
        assert want  # fixture phrases actually match documents

    def test_compaction_preserves_positional_ranking(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            ri.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        want = self._phrase_want(spark)
        assert ri.compact_segments(spark, root) == 3
        assert self._phrase_got(spark, root) == want
        # BM25 equality holds over the same compacted positional schema
        assert _got(spark, root) == _want(spark)

    def test_proximity_same_term_pair_excludes_self_pairs(self, spark):
        """code-review r12: a t1 == t2 pair (repeated-term proximity)
        must not pair an occurrence with itself — a doc with ONE
        occurrence has no pair at all, and min_dist is the real gap,
        never 0."""
        from starknet_indexer_spark.queries.retrieval import (
            proximity_match_from_positions,
        )

        px = spark.createDataFrame(
            # doc 1: 'x' once; doc 2: 'x' at 1 and 4 (gap 3)
            [(1, 1, "x"), (2, 1, "x"), (2, 4, "x")],
            "doc_id bigint, pos int, term string",
        )
        pq = spark.createDataFrame(
            [(1, "x", "x", 5)], "pair_id long, t1 string, t2 string, w int"
        )
        rows = {
            (r["doc_id"], r["n_pairs"], r["min_dist"])
            for r in proximity_match_from_positions(px, pq).collect()
        }
        # doc 1 absent; doc 2's two occurrences pair in both ordered
        # role assignments with min_dist 3
        assert rows == {(2, 2, 3)}

    def test_proximity_from_index_equals_batch(self, spark, tmp_path):
        """Windowed co-occurrence off the maintained positional
        postings == the batch proximity_match, across a batch split
        AND a compaction (shared proximity_match_from_positions)."""
        from starknet_indexer_spark.queries.retrieval import (
            _PROX_PAIRS,
            proximity_match,
        )

        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            ri.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        want = _rows(proximity_match(spark, SF))
        assert want  # fixture pairs actually match documents
        got = _rows(ri.proximity_match_from_index(spark, root, _PROX_PAIRS))
        assert got == want
        assert ri.compact_segments(spark, root) == 3
        assert _rows(ri.proximity_match_from_index(spark, root, _PROX_PAIRS)) == want


class TestCommitGatedCompaction:
    """ADVICE r11 (medium): compaction must not absorb the segment of
    a fold that crashed before its doc_len commit — the replay would
    re-write the same postings next to the compacted copy and
    permanently inflate tf/df."""

    def test_crashed_fold_segment_not_absorbed(
        self, spark, tmp_path, monkeypatch
    ):
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root,
                       epoch_token="ns:0")

        real = state_table.merge_batch

        def crashing(*a, **kw):
            raise RuntimeError("injected crash before doc_len fold")

        monkeypatch.setattr(state_table, "merge_batch", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            ri.apply_batch(spark, docs, root, epoch_token="ns:1")
        monkeypatch.setattr(state_table, "merge_batch", real)

        seg_dir = os.path.join(root, ri._SEGMENTS)
        # the crashed epoch's segment exists but is NOT committed
        assert os.path.isdir(os.path.join(seg_dir, "epoch=ns%3A1"))
        assert not os.path.exists(
            os.path.join(seg_dir, "epoch=ns%3A1", ri._COMMITTED)
        )
        # a maintenance tick between the crash and the replay: only
        # the committed epoch is eligible — nothing to merge
        assert ri.compact_segments(spark, root) == 0
        assert os.path.isdir(os.path.join(seg_dir, "epoch=ns%3A1"))

        # the replay completes the fold; ranking is exact (no double
        # count), and compaction may now absorb both epochs
        ri.apply_batch(spark, docs, root, epoch_token="ns:1")
        assert _got(spark, root) == _want(spark)
        assert ri.compact_segments(spark, root) == 2
        assert _got(spark, root) == _want(spark)

    def test_crashed_fold_segment_invisible_to_probes(
        self, spark, tmp_path, monkeypatch
    ):
        """code-review r12: a probe between the crash and the replay
        must see the index exactly as if the crashed fold never
        happened — its docs are absent from the corpus stats, so
        scoring the orphan postings would rank them against stats that
        exclude them (indefinitely, while the stream stays down)."""
        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root,
                       epoch_token="ns:0")
        before = _got(spark, root)

        real = state_table.merge_batch

        def crashing(*a, **kw):
            raise RuntimeError("injected crash before doc_len fold")

        monkeypatch.setattr(state_table, "merge_batch", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            ri.apply_batch(spark, docs, root, epoch_token="ns:1")
        monkeypatch.setattr(state_table, "merge_batch", real)

        # the uncommitted segment is on disk but the probe's snapshot
        # is identical to the pre-crash index
        assert _got(spark, root) == before
        ri.apply_batch(spark, docs, root, epoch_token="ns:1")  # replay
        assert _got(spark, root) == _want(spark)

    def test_token_rule_heals_lost_marker(self, spark, tmp_path):
        """A marker lost to power loss AFTER the fold committed: the
        epoch token at-or-below the doc_len applied token (same
        namespace) proves the commit, so compaction still absorbs."""
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root,
                       epoch_token="ns:0")
        ri.apply_batch(spark, docs, root, epoch_token="ns:1")
        seg_dir = os.path.join(root, ri._SEGMENTS)
        os.remove(os.path.join(seg_dir, "epoch=ns%3A0", ri._COMMITTED))
        os.remove(os.path.join(seg_dir, "epoch=ns%3A1", ri._COMMITTED))
        want = _want(spark)
        assert ri.compact_segments(spark, root) == 2
        assert _got(spark, root) == want

    def test_short_circuit_replay_heals_lost_marker(self, spark, tmp_path):
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs, root, epoch_token="ns:0")
        seg_dir = os.path.join(root, ri._SEGMENTS)
        marker = os.path.join(seg_dir, "epoch=ns%3A0", ri._COMMITTED)
        os.remove(marker)
        ri.apply_batch(spark, docs, root, epoch_token="ns:0")  # replay
        assert os.path.exists(marker)


class TestLayoutContract:
    """code-review r12: the segment schema (positions column) and the
    fan-out constants are baked into the persisted log, so a foreign
    or pre-stamp layout must be refused loudly — the alternatives are
    an AnalysisException crash-loop inside the stream's compaction
    cadence, or old docs' positions silently nulled (and then baked
    into a compacted segment) under mixed-schema footer picks."""

    def test_mismatched_stamp_refused_everywhere(self, spark, tmp_path):
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs, root)
        with open(os.path.join(root, ri._LAYOUT_FILE), "w") as f:
            f.write("positional-v1:tb=8:dr=2048")
        with pytest.raises(RuntimeError, match="layout"):
            ri.bm25_topk_from_index(spark, root, _QUERY_TERMS)
        with pytest.raises(RuntimeError, match="layout"):
            ri.apply_batch(spark, docs, root)
        with pytest.raises(RuntimeError, match="layout"):
            ri.compact_segments(spark, root)

    def test_pre_stamp_log_refused(self, spark, tmp_path):
        """A root holding segments but no stamp is a pre-contract
        (possibly pre-positional) log — refuse, don't guess."""
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs, root)
        os.remove(os.path.join(root, ri._LAYOUT_FILE))
        with pytest.raises(RuntimeError, match="predates the layout"):
            ri.bm25_topk_from_index(spark, root, _QUERY_TERMS)
        with pytest.raises(RuntimeError, match="predates the layout"):
            ri.apply_batch(spark, docs, root)


class TestTieredCompaction:
    """VERDICT r11 mandate #4: with a tier threshold, only small
    segments merge into the next tier — the big compacted segment is
    untouched, bounding steady-state compaction work by new-data
    volume, not corpus size."""

    def test_tier_leaves_big_segment_untouched(self, spark, tmp_path):
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        # a "big" tier: most of the corpus, major-compacted once
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 4 != 0), root,
                       epoch_token="ns:0")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 8 == 0), root,
                       epoch_token="ns:1")
        assert ri.compact_segments(spark, root) == 2
        seg_dir = os.path.join(root, ri._SEGMENTS)
        big = [e for e in os.listdir(seg_dir) if e.startswith("epoch=")]
        assert len(big) == 1
        big_bytes = ri._dir_bytes(os.path.join(seg_dir, big[0]))

        # two small fresh epochs land next to it (disjoint from the
        # big tier AND each other — %16 splits of the %8==4 residue)
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 16 == 4), root,
                       epoch_token="ns:2")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 16 == 12), root,
                       epoch_token="ns:3")
        # the tiered pass absorbs ONLY the two small epochs
        n = ri.compact_segments(spark, root, tier_max_bytes=big_bytes - 1)
        assert n == 2
        after = {e for e in os.listdir(seg_dir) if e.startswith("epoch=")}
        assert big[0] in after and len(after) == 2
        # a full resend is entirely absorbed (corpus now complete);
        # ranking over (big tier + new tier) is exact
        ri.apply_batch(spark, docs, root, epoch_token="ns:4")
        assert _got(spark, root) == _want(spark)

    def test_compaction_id_is_deterministic(self, spark, tmp_path):
        import hashlib
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root,
                       epoch_token="ns:0")
        ri.apply_batch(spark, docs, root, epoch_token="ns:1")
        seg_dir = os.path.join(root, ri._SEGMENTS)
        absorb = sorted(
            e for e in os.listdir(seg_dir) if e.startswith("epoch=")
        )
        expect = hashlib.sha256("\n".join(absorb).encode()).hexdigest()[:16]
        assert ri.compact_segments(spark, root) == 2
        names = [e for e in os.listdir(seg_dir) if e.startswith("epoch=")]
        assert names == [f"epoch=compacted-{expect}"]


class TestEmptyBatches:
    def test_all_seen_batch_writes_no_segment(self, spark, tmp_path):
        """ADVICE r11: an entirely already-seen batch must not leave an
        empty epoch dir (it broke schema inference); the epoch token
        still commits so the replay short-circuits."""
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        ri.apply_batch(spark, docs, root, epoch_token="ns:0")
        ri.apply_batch(spark, docs, root, epoch_token="ns:1")  # all seen
        seg_dir = os.path.join(root, ri._SEGMENTS)
        assert not os.path.isdir(os.path.join(seg_dir, "epoch=ns%3A1"))
        assert state_table.applied_token(
            os.path.join(root, ri._DOC_LEN)
        ) == "ns:1"
        assert _got(spark, root) == _want(spark)

    def test_probe_over_doc_len_only_state_is_typed_empty(
        self, spark, tmp_path
    ):
        """segments/ without any epoch dir (possible transiently on a
        fresh root) degrades to typed-empty, not AnalysisException."""
        import os

        root = str(tmp_path / "root")
        os.makedirs(os.path.join(root, ri._SEGMENTS))
        out = ri.bm25_topk_from_index(spark, root, _QUERY_TERMS)
        assert out.count() == 0


class TestStreamingCompactionCadence:
    def test_tiered_compaction_rides_the_fold_cadence(self, spark, tmp_path):
        """VERDICT r11 mandate #4: compaction is wired to the stream's
        own cadence (single-writer safe — inside the fold callback),
        not a manual call: 5 micro-batches at compact_every_batches=2
        leave fewer segment dirs than epochs, with ranking exact."""
        import os

        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        root = str(tmp_path / "root")
        ck = str(tmp_path / "ck")
        for i in range(5):
            docs.filter(F.col("doc_id") % 5 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = ri.stream_retrieval_index(
            spark, feed, root, ck,
            max_files_per_trigger=1,
            compact_every_batches=2,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        seg_dir = os.path.join(root, ri._SEGMENTS)
        epochs = [e for e in os.listdir(seg_dir) if e.startswith("epoch=")]
        # epochs 2 and 4 each ran a tiered pass: {0,1,2}->c1, {c1,3,4}->c2
        assert len(epochs) < 5
        assert any(e.startswith("epoch=compacted-") for e in epochs)
        assert _got(spark, root) == _want(spark)
