"""Schema contract between the driver testdata and catalog.load.

Round-1 post-mortem: the corpus changed encoding (TIMESTAMP(NANOS)
epoch-longs -> timestamp[us] without isAdjustedToUTC, i.e.
TIMESTAMP_NTZ) and the queries loader didn't normalize, so three
queries and the whole bench died on DATATYPE_MISMATCH at driver time.
This test pins the contract: whatever the corpus stores, every column
that leaves catalog.load is a plain session-TZ type that epoch
functions accept, and every registered query at least analyzes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.catalog import TABLES, load
from starknet_indexer_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# types that must never escape the catalog: NTZ breaks unix_micros &
# friends; raw bigint-nanos silently misinterprets as seconds
FORBIDDEN = {"timestamp_ntz"}


@pytest.mark.parametrize("table", TABLES)
def test_no_forbidden_dtypes(spark, table):
    df = load(spark, SF_DIR, table)
    bad = {c: t for c, t in df.dtypes if t in FORBIDDEN}
    assert not bad, f"{table}: forbidden dtypes escaped catalog.load: {bad}"
    # the legacy nanos encoding must have been converted, not passed through
    if table == "events":
        assert dict(df.dtypes)["ts"] == "timestamp"


def test_events_epoch_functions_resolve(spark):
    """unix_micros/unix_timestamp must analyze on the loaded ts column —
    the exact call that failed in round 1."""
    ev = load(spark, SF_DIR, "events")
    # .schema forces analysis without executing
    ev.select(F.unix_micros("ts"), F.unix_timestamp("ts")).schema


def test_every_registered_query_analyzes(spark):
    """Cheap analysis-only sweep: every query in the registry must at
    least resolve its plan against the real corpus (no execution)."""
    failures = {}
    for name, q in REGISTRY.items():
        try:
            q.fn(spark, SF_DIR).schema
        except Exception as exc:  # noqa: BLE001 — collect all failures
            failures[name] = f"{type(exc).__name__}: {exc}"
    assert not failures, f"queries fail to analyze: {failures}"


def test_all_sf_dirs_load(spark):
    """Every shipped scale factor obeys the same schema contract."""
    base = "/root/testdata"
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d)
        if not d.startswith("sf") or not os.path.isdir(p):
            continue
        for table in TABLES:
            if os.path.exists(os.path.join(p, f"{table}.parquet")):
                bad = {c: t for c, t in load(spark, p, table).dtypes if t in FORBIDDEN}
                assert not bad, f"{d}/{table}: {bad}"


def test_plans_report_is_fresh():
    """PLANS.md must carry a row for every registered query — it is
    the committed plan-evidence surface, so a new query without a
    regenerated report (python -m starknet_indexer_spark.plans.report)
    fails here instead of drifting silently."""
    import os

    from starknet_indexer_spark.queries import REGISTRY

    path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    content = open(path).read()
    missing = [n for n in REGISTRY if f"| {n} |" not in content]
    assert not missing, f"PLANS.md stale; regenerate. missing: {missing}"
