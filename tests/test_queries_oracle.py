"""Every registered query must match its DuckDB oracle at sf0.001.

This mirrors the driver's t2 harness (row count + column names +
value equality after column-sorted normalization).
"""

from __future__ import annotations

import pytest

from starknet_indexer_spark.queries import REGISTRY

from .oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df is not None
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, same as driver
        return
    ok, msg = compare(df, duck, q.oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
