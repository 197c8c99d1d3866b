"""Data-integrity audit over the driver corpus.

Exercises the ``constraints`` module (the validation-query analogue of
the reference's Postgres PK/FK/NOT NULL schema, src/dao.ts:96-360) on
the TPC-H-ish star schema: every primary key checked for duplicates,
every foreign edge checked for orphans, in ONE composed DataFrame.

Scale shape: each PK check is one hash aggregation on its key; each
FK check is an anti-join that broadcasts the dimension side (nation,
region, part, supplier, customer) and shuffle-joins only the one
fact-fact edge (lineitem -> orders). The final summary is a union of
1-row aggregates — nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..constraints import audit_table
from .registry import register

_PKS = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("nation", ["n_nationkey"]),
    ("region", ["r_regionkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]
# (child, fk cols, parent, parent cols, parent is dimension-sized)
_FKS = [
    ("lineitem", ["l_orderkey"], "orders", ["o_orderkey"], False),
    ("lineitem", ["l_partkey"], "part", ["p_partkey"], True),
    ("lineitem", ["l_suppkey"], "supplier", ["s_suppkey"], True),
    ("orders", ["o_custkey"], "customer", ["c_custkey"], True),
    ("customer", ["c_nationkey"], "nation", ["n_nationkey"], True),
    ("supplier", ["s_nationkey"], "nation", ["n_nationkey"], True),
    ("nation", ["n_regionkey"], "region", ["r_regionkey"], True),
]


def _pk_sql(table: str, cols: list[str]) -> str:
    key = ", ".join(cols)
    return f"""
    SELECT '{table}' AS relation, 'pk_{'_'.join(cols)}' AS constraint_name,
           CAST(COUNT(*) AS BIGINT) AS violations
    FROM (SELECT {key} FROM {table} GROUP BY {key} HAVING COUNT(*) > 1)
    UNION ALL
    SELECT '{table}', 'notnull_{'_'.join(cols)}',
           CAST(COUNT(*) AS BIGINT)
    FROM {table} WHERE {" OR ".join(f"{c} IS NULL" for c in cols)}
    """


def _fk_sql(child: str, cols: list[str], parent: str, pcols: list[str]) -> str:
    on = " AND ".join(f"c.{c} = p.{p}" for c, p in zip(cols, pcols))
    notnull = " AND ".join(f"c.{c} IS NOT NULL" for c in cols)
    return f"""
    SELECT '{child}' AS relation, 'fk_{'_'.join(cols)}' AS constraint_name,
           CAST(COUNT(*) AS BIGINT) AS violations
    FROM {child} c WHERE {notnull}
      AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE {on})
    """


_ORACLE = " UNION ALL ".join(
    [_pk_sql(t, c) for t, c in _PKS]
    + [_fk_sql(ch, c, p, pc) for ch, c, p, pc, _ in _FKS]
)


@register(
    "constraint_violations",
    oracle=_ORACLE,
    doc="Full-corpus integrity audit: PK uniqueness + key NOT NULL for "
    "all ten tables, FK orphan detection for all seven edges of the "
    "star schema, one count row per constraint. Checks are FUSED per "
    "table (constraints.audit_table): one groupBy pass yields both "
    "duplicate classes and null-key rows, and all of a table's FK "
    "edges resolve in one scan chaining broadcast dimension lookups "
    "(the lone fact-fact edge lineitem->orders shuffle-joins) — 10 "
    "scans for 27 checks instead of 27, the property that makes a "
    "full-schema audit affordable on a cadence at 100 TB.",
)
def constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {
        name: load(spark, sf_dir, name)
        for name in (
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        )
    }
    fks_by_child: dict[str, list] = {}
    for child, cols, parent, pcols, is_dim in _FKS:
        fks_by_child.setdefault(child, []).append((cols, t[parent], pcols, is_dim))
    out = None
    for table, cols in _PKS:
        part = audit_table(t[table], table, cols, fks_by_child.get(table))
        out = part if out is None else out.unionByName(part)
    return out
