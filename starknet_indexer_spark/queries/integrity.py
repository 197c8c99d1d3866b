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


_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@register(
    "table_profile",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             {', '.join(
                 f'CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS nn_{c}, '
                 f'CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}'
                 for c in _PROFILE_COLS
             )}
      FROM events
    )
    {' UNION ALL '.join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_nulls,"
        f" nd_{c} AS n_distinct,"
        f" CAST(nn_{c} * 1000000 // n_rows AS BIGINT) AS null_ppm FROM agg"
        for c in _PROFILE_COLS
    )}
    """,
    doc="One-pass column profiling of the events fact table (the "
    "data-quality summary every pipeline run records): per column, "
    "null count, exact distinct count, and null rate in ppm. ONE scan "
    "produces a single aggregate row (Spark plans the multi-column "
    "COUNT DISTINCT via Expand — still one pass over the input, one "
    "shuffle), then a 6-row stack unpivots it; nothing is collected. "
    "At 100 TB swap exact COUNT DISTINCT for the registered HLL/KMV "
    "twins (hll_distinct_pinned) per the documented sketch policy.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"nd_{c}"))
    one = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (column_name, n_nulls, n_distinct)"
        ),
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        F.expr("CAST(n_nulls * 1000000 DIV n_rows AS BIGINT)").alias("null_ppm"),
    )
