"""Driver-facing query library (the t2 correctness surface).

Each query is registered with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` built on the
  DataFrame API (Catalyst-optimized), and
- a DuckDB-dialect oracle SQL string computing the same result on the
  same parquet tables.

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.

Modules register themselves on import.
"""

from __future__ import annotations

from .registry import REGISTRY, Query, register  # noqa: F401

# Import for side effect: each module registers its queries.
from . import tpch  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import events_analytics  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import pipeline_text  # noqa: E402,F401
from . import pipeline_similarity  # noqa: E402,F401
from . import pipeline_dedup  # noqa: E402,F401
from . import pipeline_multimodal  # noqa: E402,F401
from . import pipeline_corpus  # noqa: E402,F401
from . import pipeline_clustering  # noqa: E402,F401
from . import pipeline_quality  # noqa: E402,F401
from . import ekubo_views  # noqa: E402,F401


def queries():
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
