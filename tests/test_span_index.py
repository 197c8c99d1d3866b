"""Maintained substring-span postings (VERDICT r10 mandate #6): the
read-time span_fraction == the registered repeated_span_fraction batch
query under any batch split; redelivery is absorbed (postings are a
pure function of text); stream restart is a no-op; the drop list's
with_spans composition == the batch dedup_drop_list_spans query."""

from __future__ import annotations

from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import load
from starknet_indexer_spark.queries.pipeline_curation import (
    dedup_drop_list_spans,
)
from starknet_indexer_spark.queries.pipeline_dedup import (
    repeated_span_fraction,
)
from starknet_indexer_spark.streaming import drop_list as dl
from starknet_indexer_spark.streaming import span_index as si

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def _docs(spark):
    return load(spark, SF, "documents").select("doc_id", "text")


class TestSpanFractionEqualsBatch:
    def test_sequential_batches_equal_batch_query(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(3):
            si.apply_batch(spark, docs.filter(F.col("doc_id") % 3 == i), root)
        got = _rows(si.span_fraction(spark, root))
        want = _rows(repeated_span_fraction(spark, SF))
        assert got == want
        # sanity: duplicated spans exist in the fixture
        assert (
            si.span_fraction(spark, root).filter(F.col("dup_ppm") > 0).count()
            > 0
        )

    def test_redelivery_absorbed(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        si.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
        si.apply_batch(spark, docs, root)  # evens redelivered
        assert _rows(si.span_fraction(spark, root)) == _rows(
            repeated_span_fraction(spark, SF)
        )

    def test_stream_equals_batch_and_replay_noop(self, spark, tmp_path):
        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        root = str(tmp_path / "root")
        ck = str(tmp_path / "ck")
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
        q = si.stream_span_index(spark, feed, root, ck, max_files_per_trigger=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        want = _rows(repeated_span_fraction(spark, SF))
        assert _rows(si.span_fraction(spark, root)) == want
        # restart over the same checkpoint: no new files, no change
        q2 = si.stream_span_index(spark, feed, root, ck, max_files_per_trigger=1)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert _rows(si.span_fraction(spark, root)) == want


class TestDropListWithSpans:
    def test_composed_decisions_equal_batch_query(self, spark, tmp_path):
        """The four-source streaming drop list == the registered
        dedup_drop_list_spans composition, and the span stage actually
        fires on this corpus (span_dup decisions exist)."""
        docs = _docs(spark)
        root = str(tmp_path / "root")
        for i in range(2):
            dl.apply_batch(
                spark,
                docs.filter(F.col("doc_id") % 2 == i),
                root,
                with_spans=True,
            )
        got = dl.drop_list(spark, root, with_spans=True)
        want = dedup_drop_list_spans(spark, SF)
        assert _rows(got) == _rows(want)
        reasons = {r["reason"] for r in got.collect()}
        assert "span_dup" in reasons
        # the three-source read over the same state is still the base
        # batch query (the span fold does not perturb it)
        from starknet_indexer_spark.queries.pipeline_curation import (
            dedup_drop_list,
        )

        assert _rows(dl.drop_list(spark, root)) == _rows(
            dedup_drop_list(spark, SF)
        )


class TestSpanWidthContract:
    """ADVICE r11: span_n is persisted at first fold and asserted at
    fold and width-dependent read time."""

    def test_fold_width_mismatch_raises(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        si.apply_batch(spark, docs, root, span_n=8)
        assert si.stored_span_n(root) == 8
        import pytest

        with pytest.raises(RuntimeError, match="span_n=8"):
            si.apply_batch(spark, docs, root, span_n=4)

    def test_read_width_mismatch_raises(self, spark, tmp_path):
        docs = _docs(spark)
        root = str(tmp_path / "root")
        si.apply_batch(spark, docs, root, span_n=8)
        import pytest

        with pytest.raises(RuntimeError, match="span_n=8"):
            si.span_fraction(spark, root, span_n=4)

    def test_drop_list_rejects_foreign_width_state(self, spark, tmp_path):
        """The exact ADVICE scenario: a span state maintained at the
        default SPAN_N=8 passes the existence check, but the drop-list
        composition (SPAN_DROP_N=4) must refuse it loudly instead of
        expanding coverage with the wrong window."""
        import os

        import pytest

        from starknet_indexer_spark.queries.pipeline_curation import SPAN_DROP_N

        assert SPAN_DROP_N != 8  # the scenario requires distinct widths
        docs = _docs(spark)
        root = str(tmp_path / "root")
        # base three-source state via the drop-list fold (no spans) ...
        dl.apply_batch(spark, docs, root, with_spans=False)
        # ... plus a span state folded at the WRONG width under the
        # drop list's own span subdir
        si.apply_batch(spark, docs, os.path.join(root, dl._SPAN_IDX), span_n=8)
        with pytest.raises(RuntimeError, match="span_n=8"):
            dl.drop_list(spark, root, with_spans=True)

    def test_legacy_state_without_width_file_is_stamped(self, spark, tmp_path):
        """A pre-r12 state (postings but no _span_n file) is tolerated
        on read and stamped by the next fold."""
        import os

        docs = _docs(spark)
        root = str(tmp_path / "root")
        si.apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), root, span_n=4)
        os.remove(os.path.join(root, si._SPAN_N_FILE))
        assert si.stored_span_n(root) is None
        si.span_fraction(spark, root, span_n=4)  # read tolerated
        si.apply_batch(spark, docs, root, span_n=4)  # fold stamps
        assert si.stored_span_n(root) == 4
