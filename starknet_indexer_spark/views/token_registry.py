"""V8 — latest token registrations (canonical token metadata).

Reference: latest_token_registrations_view, src/dao.ts:970-1023.
Semantics:
- union v1 registrations (short-string-packed name/symbol, decoded)
  with v3 (plain strings);
- validate: 1 < len(symbol) < 10, len(name) < 128, ASCII-only both;
- per address keep the *latest* valid registration's metadata, but
  only if that address was the *first* registrant of its (lowercased)
  symbol — two different argmin/argmax joins (SURVEY §7 hard part 5).

The short-string decode is the pure-expression pipeline from
functions.core (numeric -> hex limbs -> unhex -> UTF-8), no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import short_string_decode, to_hex


def latest_token_registrations(tables: dict[str, DataFrame]) -> DataFrame:
    # The v1 (felt-packed) table is optional: a corpus with only v3
    # registrations skips the short-string decode leg entirely — the
    # decode expression tree is wide enough to exceed the codegen
    # budget, so building it against a known-empty relation wastes a
    # compile + interpreted fallback.
    tr = tables.get("token_registrations")
    v3 = tables["token_registrations_v3"].select(
        "address", "event_id", "name", "symbol", "decimals", "total_supply"
    )
    if tr is None:
        v1 = None
    else:
        # packed short strings arrive as NUMERIC (reference schema /
        # fixtures) or as canonical 0x-hex (ingest stores felt252 as
        # hex — felts exceed Decimal(38)); both decode via the hex form
        dtypes = dict(tr.dtypes)

        def _short(col: str):
            c = F.col(col)
            return short_string_decode(c if dtypes[col] == "string" else to_hex(c))

        v1 = tr.select(
            "address",
            "event_id",
            _short("name").alias("name"),
            _short("symbol").alias("symbol"),
            "decimals",
            "total_supply",
        )
    ascii_re = r"^[\x00-\x7F]*$"
    validated = (
        (v3 if v1 is None else v1.unionByName(v3))
        .filter(
            (F.length("symbol") > 1)
            & (F.length("symbol") < 10)
            & F.col("symbol").rlike(ascii_re)
            & (F.length("name") < 128)
            & F.col("name").rlike(ascii_re)
        )
    )
    # The per-address argmin/argmax ride a WINDOW over the validated
    # relation instead of an aggregate+self-join, so the expensive
    # short-string decode subtree executes twice (this branch + the
    # symbol branch below), not three times — the window keeps every
    # row, letting the latest-row filter happen in the same pass that
    # computes the address's first/last registration ids.
    from pyspark.sql.window import Window as W

    w_addr = W.partitionBy("address")
    latest = (
        validated.withColumn(
            "first_registration_id", F.min("event_id").over(w_addr)
        )
        .withColumn("last_registration_id", F.max("event_id").over(w_addr))
        .filter(F.col("event_id") == F.col("last_registration_id"))
    )
    first_of_symbol = validated.groupBy(F.lower("symbol").alias("lower_symbol")).agg(
        F.min("event_id").alias("first_id")
    )
    return latest.join(
        F.broadcast(first_of_symbol),
        (F.lower(F.col("symbol")) == F.col("lower_symbol"))
        & (F.col("first_registration_id") == F.col("first_id")),
    ).select("address", "name", "symbol", "decimals", "total_supply")
