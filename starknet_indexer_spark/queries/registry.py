"""Query registry: name -> (spark callable, DuckDB oracle SQL).

Determinism policy (applies to every registered query):

- Monetary/measure doubles are cast to DECIMAL before SUM so the
  aggregate is exact and order-insensitive (float summation order
  differs between engines and between Spark partitions). Final
  ratio/derived columns are computed in double *after* the exact
  aggregate, then rounded — deterministic on both engines.
- Timestamps are reduced to whole-second (or whole-hour) epoch
  BIGINTs before leaving a query; Spark truncates parquet ns → µs
  while DuckDB keeps ns, so raw timestamp equality is unreliable.
- Every computed column is aliased identically in the Spark plan and
  the oracle SQL (driver hash compares by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
