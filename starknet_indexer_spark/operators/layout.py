"""Z-order (Morton) layout keys for multi-dimensional data skipping.

At 100 TB, pruning is the cheapest optimization there is: parquet
row-group min/max statistics skip IO only when the file sort order
correlates with the query predicate. A single-column sort serves one
predicate dimension; interleaving the bits of several dimensions into
one Morton key makes every participating dimension's min/max ranges
tight at once, so range-partitioning + sorting by the z-key gives
multi-dimensional skipping from plain parquet — the same trick
lakehouse table formats expose as ``OPTIMIZE ... ZORDER BY``.

Everything here is a pure column expression (shift/mask/or inside
whole-stage codegen — no UDF, no shuffle beyond the caller's own
write-time repartitionByRange), and the bit math is engine-portable so
layout decisions are driver-hash-checkable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(dims: list[Column], bits_per_dim: int = 16) -> Column:
    """Morton-interleave ``dims`` (non-negative ints, each truncated to
    ``bits_per_dim`` low bits) into one BIGINT. Bit j of dim i lands at
    position ``j * n_dims + i`` — dimension 0 owns the least
    significant lane. len(dims) * bits_per_dim must be <= 63."""
    n = len(dims)
    if n * bits_per_dim > 63:
        raise ValueError("z-key would overflow a signed 64-bit integer")
    out = F.lit(0).cast("bigint")
    for i, d in enumerate(dims):
        v = d.cast("bigint").bitwiseAND(F.lit((1 << bits_per_dim) - 1))
        for j in range(bits_per_dim):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            out = out + (F.shiftleft(bit, j * n + i)).cast("bigint")
    return out


def zorder_key_sql(dim_sqls: list[str], bits_per_dim: int = 16) -> str:
    """DuckDB expression mirroring ``zorder_key_expr`` bit-for-bit."""
    n = len(dim_sqls)
    terms = []
    for i, d in enumerate(dim_sqls):
        v = f"(CAST({d} AS BIGINT) & {(1 << bits_per_dim) - 1})"
        for j in range(bits_per_dim):
            terms.append(f"((({v} >> {j}) & 1) << {j * n + i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[str],
    bits_per_dim: int = 16,
    n_files: int = 32,
) -> None:
    """Lay ``df`` out as parquet clustered by the z-key of ``dims``:
    range-partition on the key (one shuffle — sampled range bounds keep
    partitions even regardless of skew in any single dimension), sort
    within partitions, drop the key. Readers filtering on ANY of the
    dims get row-group min/max skipping; a single-dim sort would serve
    only its leading column.

    Dims must be pre-bucketed to COMPARABLE bit-widths (a z-curve
    degrades to a plain sort on whichever dimension owns the top bits
    — e.g. a 10-bit hour interleaved with an 8-bit user id splits
    files on hour alone). The usual recipe: min-normalize, then shift
    the wider dimension down until the ranges match — exactly what a
    table format's OPTIMIZE..ZORDER does with its range-id mapping."""
    keyed = df.withColumn(
        "__z", zorder_key_expr([F.col(c) for c in dims], bits_per_dim)
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
