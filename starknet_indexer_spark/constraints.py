"""Constraint validation: the PK / FK / NOT NULL surface Postgres
enforced for the reference, as audit queries.

The reference's schema declares primary keys on every event table,
``blocks`` and ``pool_keys``, and foreign keys from events to blocks
(src/dao.ts:96-360 CREATE TABLE statements). Parquet enforces none of
that, and at 100 TB you don't want write-path enforcement anyway — the
lakehouse pattern is *validation queries* run post-ingest / on a
cadence, alerting on violations instead of failing inserts.

Each check is a single aggregate or broadcast anti-join:

- ``duplicate_keys``: groupBy(key).count > 1 — one shuffle on the key.
- ``null_keys``: map-only null count.
- ``orphans``: left anti-join child -> parent; the parent side is a
  key projection (dimension-sized for blocks/pool_keys, so broadcast).

``summary`` composes any number of checks into ONE DataFrame of
(relation, constraint, violations) rows — all counts computed
distributed, unioned lazily, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key tuples that appear more than once (PK/unique violation)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def null_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows with any NULL in the key columns (NOT NULL violation)."""
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return df.filter(cond)


def orphans(
    child: DataFrame,
    cols: list[str],
    parent: DataFrame,
    parent_cols: list[str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Child rows whose FK tuple has no parent (FK violation). NULL
    FKs are skipped, matching SQL FK semantics (MATCH SIMPLE)."""
    keys = parent.select(
        *[F.col(p).alias(c) for c, p in zip(cols, parent_cols)]
    ).dropDuplicates(cols)
    if broadcast_parent:
        keys = F.broadcast(keys)
    non_null = child
    for c in cols:
        non_null = non_null.filter(F.col(c).isNotNull())
    return non_null.join(keys, cols, "left_anti")


def audit_table(
    df: DataFrame,
    relation: str,
    pk: list[str],
    fks: list[tuple[list[str], DataFrame, list[str], bool]] | None = None,
) -> DataFrame:
    """All constraint counts for one table in ONE pass — one scan per
    table no matter how many checks:

    - FK edges resolve first: the scan (pruned to pk + fk columns)
      chains a left join per parent against its deduplicated key
      projection (broadcast for dimensions), tagging each row with a
      per-edge hit flag.
    - a single groupBy on the PK then yields every violation kind at
      once: a group with n_rows > 1 is a duplicate class, NULL key
      tuples form groups too (null-key rows = groups with any NULL
      component), and each group carries the partial sum of its rows'
      per-edge orphan flags.
    - a final 1-row aggregate folds the groups into the count columns.

    When an edge is a fact-fact join (broadcast=False, e.g.
    lineitem->orders), the shuffle it introduces is REUSED by the
    groupBy: hash-partitioning on the join key satisfies the PK
    grouping's clustering whenever the join key is a subset of the PK,
    so no second exchange appears.

    At 100 TB the scan, not the tiny count aggregation, is the cost —
    fusing all of a table's checks behind one scan is what makes a
    full-schema audit affordable on a cadence. Measured trade at
    sf0.1/local[32]: ~8% slower than the two-pass variant (the PK
    aggregate now carries per-group orphan partials instead of a flat
    1-row FK agg) — the small-data regime is aggregate-bound, but the
    regime this is built for is scan-bound, where halving scans
    (21 -> 17 incl. parents) dominates. Output: (relation,
    constraint_name, violations) rows, same shape as ``summary``."""
    def rows_from_one_agg(agg_df: DataFrame, names: list[str]) -> DataFrame:
        """1-row aggregate with one count column per constraint ->
        (relation, constraint_name, violations) rows via explode, so
        the aggregate subtree executes ONCE (a unionByName of selects
        would replay the whole scan per constraint)."""
        pairs = F.array(
            *[
                F.struct(
                    F.lit(n).alias("constraint_name"),
                    F.col(f"`{n}`").cast("long").alias("violations"),
                )
                for n in names
            ]
        )
        return agg_df.select(F.explode(pairs).alias("kv")).select(
            F.lit(relation).alias("relation"),
            F.col("kv.constraint_name").alias("constraint_name"),
            F.col("kv.violations").alias("violations"),
        )

    key = "_".join(pk)
    null_any = None
    for c in pk:
        n = F.col(c).isNull()
        null_any = n if null_any is None else (null_any | n)

    fks = fks or []
    needed = list(dict.fromkeys(pk + [c for cols, _, _, _ in fks for c in cols]))
    j = df.select(*needed)
    group_flags = []  # per-group partial orphan sums
    fk_names = []
    for i, (cols, parent, pcols, broadcast_parent) in enumerate(fks):
        keys = parent.select(
            *[F.col(p).alias(c) for c, p in zip(cols, pcols)]
        ).dropDuplicates(cols).withColumn(f"__hit{i}", F.lit(1))
        if broadcast_parent:
            keys = F.broadcast(keys)
        j = j.join(keys, cols, "left")
        non_null = None
        for c in cols:
            nn = F.col(c).isNotNull()
            non_null = nn if non_null is None else (non_null & nn)
        name = f"fk_{'_'.join(cols)}"
        fk_names.append(name)
        group_flags.append(
            F.coalesce(
                F.sum(F.when(non_null & F.col(f"__hit{i}").isNull(), 1)), F.lit(0)
            ).alias(f"__g_{name}")
        )

    groups = j.groupBy(*pk).agg(
        F.count(F.lit(1)).alias("n_rows"), *group_flags
    )
    agg = groups.agg(
        F.coalesce(F.sum(F.when(F.col("n_rows") > 1, 1)), F.lit(0)).alias(f"pk_{key}"),
        F.coalesce(F.sum(F.when(null_any, F.col("n_rows"))), F.lit(0)).alias(
            f"notnull_{key}"
        ),
        # coalesce: an EMPTY child table has zero groups, and SUM over
        # zero rows is NULL — the audit must report 0 violations, not
        # NULL (empty typed tables are a normal input: stored_schemas
        # stands them in for event families that haven't fired yet)
        *[
            F.coalesce(F.sum(f"__g_{n}"), F.lit(0)).alias(n)
            for n in fk_names
        ],
    )
    return rows_from_one_agg(agg, [f"pk_{key}", f"notnull_{key}"] + fk_names)


def _count_row(df: DataFrame, relation: str, constraint: str) -> DataFrame:
    return df.agg(
        F.lit(relation).alias("relation"),
        F.lit(constraint).alias("constraint_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def summary(checks: list[tuple[str, str, DataFrame]]) -> DataFrame:
    """(relation, constraint_name, violating-rows DataFrame) triples ->
    one (relation, constraint_name, violations) DataFrame."""
    if not checks:
        raise ValueError("summary() needs at least one check")
    out = _count_row(checks[0][2], checks[0][0], checks[0][1])
    for relation, constraint, df in checks[1:]:
        out = out.unionByName(_count_row(df, relation, constraint))
    return out


# ---------------------------------------------------------------------------
# Stored-table constraint sets (the reference's schema, src/dao.ts:96-360)
# ---------------------------------------------------------------------------

# table -> (pk columns, [(fk cols, parent table, parent cols), ...]).
# Event tables share the envelope PK event_id and the FK to blocks;
# pool-keyed facts also reference the pool_keys dimension.
EVENT_TABLE_FKS = [
    (["block_number"], "blocks", ["number"]),
]
POOL_KEYED_FKS = EVENT_TABLE_FKS + [
    (["pool_key_hash"], "pool_keys", ["key_hash"]),
]

STORED_CONSTRAINTS: dict[str, tuple[list[str], list]] = {
    "blocks": (["number"], []),
    "pool_keys": (["key_hash"], []),
    "swaps": (["event_id"], POOL_KEYED_FKS),
    "position_updates": (["event_id"], POOL_KEYED_FKS),
    "position_fees_collected": (["event_id"], POOL_KEYED_FKS),
    "pool_initializations": (["event_id"], POOL_KEYED_FKS),
    "staker_staked": (["event_id"], EVENT_TABLE_FKS),
    "staker_withdrawn": (["event_id"], EVENT_TABLE_FKS),
}


def validate_stored(tables: dict[str, DataFrame]) -> DataFrame:
    """Run the reference-schema constraint set over whichever stored
    tables are present; returns the summary DataFrame (fused
    two-passes-per-table via ``audit_table``)."""
    out: DataFrame | None = None
    for table, (pk, fks) in STORED_CONSTRAINTS.items():
        df = tables.get(table)
        if df is None:
            continue
        edges = [
            (cols, tables[parent], pcols, True)
            for cols, parent, pcols in fks
            if parent in tables
        ]
        part = audit_table(df, table, pk, edges)
        out = part if out is None else out.unionByName(part)
    assert out is not None, "no stored tables present"
    return out
