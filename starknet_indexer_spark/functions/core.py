"""Shared column-level helpers for the Ekubo-shaped tables.

All pure Catalyst expressions (whole-stage-codegen'd, no Python UDFs):
numeric width handling for felt252/u128/u256, the synthetic global
event id, short-string decoding, interval algebra, and the pool key
hash.

Numeric policy (SURVEY.md §1.2): amounts that fit DECIMAL(38,0) are
decimals (exact, order-insensitive aggregation); identifiers
(addresses, hashes, felt252-wide values) are canonical lowercase
``0x…`` hex strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^64 and 2^128 as decimal literals for limb arithmetic
TWO_64 = "18446744073709551616"
TWO_128 = "340282366920938463463374607431768211456"

# event_id = block_number * 2^32 + transaction_index * 2^16 + event_index
# (reference: stored generated column, src/dao.ts:124)
EVENT_ID_BLOCK_SHIFT = 2**32
EVENT_ID_TX_SHIFT = 2**16


def event_id_column(
    block_number: Column | str = "block_number",
    transaction_index: Column | str = "transaction_index",
    event_index: Column | str = "event_index",
) -> Column:
    """Monotone synthetic global order key (src/dao.ts:124)."""
    b = F.col(block_number) if isinstance(block_number, str) else block_number
    t = F.col(transaction_index) if isinstance(transaction_index, str) else transaction_index
    e = F.col(event_index) if isinstance(event_index, str) else event_index
    return (
        b.cast("long") * F.lit(EVENT_ID_BLOCK_SHIFT)
        + t.cast("long") * F.lit(EVENT_ID_TX_SHIFT)
        + e.cast("long")
    ).alias("event_id")


def hex_normalize(col: Column, width_hex_chars: int = 64) -> Column:
    """``0x``-prefixed hex of any case/length -> fixed-width lowercase
    hex digits (no prefix), zero-padded."""
    raw = F.lower(F.regexp_replace(col, "^0x", ""))
    return F.lpad(raw, width_hex_chars, "0")


def felt_to_decimal(col: Column) -> Column:
    """Hex felt string -> DECIMAL(38,0), for values < 2^126-ish.

    Two 64-bit limbs via ``conv`` (conv is exact up to 64 bits), then
    limb arithmetic in decimal. Values above DECIMAL(38,0) (full
    felt252 range) must stay hex strings — that is the documented
    width policy, matching the reference's NUMERIC columns which the
    fixtures bound to < 2^128 (FIXTURES.md conventions).
    """
    # out-of-contract felts (>= 2^128 after stripping leading zeros)
    # must yield NULL, not a silently truncated value: lpad SHORTENS
    # longer strings to their leftmost chars, which would decode
    # 2^128 as 2^124 — a plausible-looking wrong number (the decode
    # layer's speculative-evaluation contract is NULL-on-garbage)
    stripped = F.regexp_replace(
        F.lower(F.regexp_replace(col, "^0x", "")), "^0+(?=.)", ""
    )
    h = F.when(F.length(stripped) <= 32, F.lpad(stripped, 32, "0"))
    hi = F.conv(F.substring(h, 1, 16), 16, 10).cast("decimal(20,0)")
    lo = F.conv(F.substring(h, 17, 16), 16, 10).cast("decimal(20,0)")
    return (hi * F.lit(TWO_64).cast("decimal(38,0)") + lo).cast("decimal(38,0)")


def u256_value(lo: Column, hi: Column) -> Column:
    """u256 from two u128 felts: lo + hi * 2^128 (src/parse.ts:40-46).

    DECIMAL(38,0) covers the observed value range (hi == 0 in
    practice for bounded quantities); a nonzero hi that overflows
    raises under ANSI mode rather than silently truncating. The 2^128
    factor is staged as two 2^64 multiplies because a 2^128 decimal
    literal (39 digits) would overflow during constant folding even
    when hi == 0.
    """
    t64 = F.lit(TWO_64).cast("decimal(38,0)")
    return (felt_to_decimal(lo) + felt_to_decimal(hi) * t64 * t64).cast("decimal(38,0)")


def i129_value(mag: Column, sign: Column) -> Column:
    """i129: magnitude felt + sign felt; nonzero sign = negative
    (src/parse.ts:48-55)."""
    m = felt_to_decimal(mag)
    s = felt_to_decimal(sign)
    return F.when(s != 0, -m).otherwise(m)


def decimal_floordiv(a: Column, b: Column) -> Column:
    """Exact floor(a/b) on decimals via (a - pmod(a,b)) / b.

    Spark's decimal division rounds the quotient to the result scale
    (HALF_UP), so ``floor(a / b)`` can round 2.9999997 up to 3 before
    the floor — off by one. Subtracting the positive remainder first
    makes the division exact; works for negative ``a`` too since pmod
    returns the non-negative remainder.
    """
    return ((a - F.pmod(a, b)) / b).cast("decimal(38,0)")


def q128_fee_amount(volume: Column, fee: Column) -> Column:
    """LP fee: floor(volume * fee / 2^128) (reference hourly volume
    rollup, src/dao.ts:1552-1554).

    Computed as floor(volume * floor(fee / 2^64) / 2^64) to stay inside
    DECIMAL(38,0): exact when fee is a multiple of 2^64 (fixtures
    guarantee this), otherwise within volume/2^64 < 1 unit for volumes
    below 2^64 — documented width-policy bound. volume must be >= 0
    (swap volume is the inflow side, always non-negative).
    """
    t64 = F.lit(TWO_64).cast("decimal(38,0)")
    fee_hi = decimal_floordiv(fee.cast("decimal(38,0)"), t64)
    return decimal_floordiv(volume.cast("decimal(38,0)") * fee_hi, t64)


def to_hex(col: Column) -> Column:
    """DECIMAL/long -> canonical ``0x…`` lowercase hex (reference
    plpgsql numeric_to_hex, src/dao.ts:1209-1229). Exact for values
    that fit a 64-bit limb pair."""
    d = col.cast("decimal(38,0)")
    two64 = F.lit(TWO_64).cast("decimal(38,0)")
    lo = (d % two64).cast("decimal(20,0)")
    # (d - lo) is an exact multiple of 2^64, so the division is exact
    # (a plain decimal cast would round, not floor)
    hi = ((d - lo) / two64).cast("decimal(38,0)")
    hi_hex = F.conv(hi.cast("string"), 10, 16)
    lo_hex = F.conv(lo.cast("string"), 10, 16)
    combined = F.when(hi == 0, F.lower(lo_hex)).otherwise(
        F.concat(F.lower(hi_hex), F.lpad(F.lower(lo_hex), 16, "0"))
    )
    return F.concat(F.lit("0x"), F.regexp_replace(combined, "^0+(?=.)", ""))


def short_string_decode(col: Column) -> Column:
    """Packed short string: one felt holding <= 31 ASCII bytes,
    big-endian base-256 (reference plpgsql parse_short_string,
    src/dao.ts:938-968; TS parseUint8Array src/parse.ts:141-158).

    Hex form: strip leading zero bytes, decode remaining bytes as
    UTF-8. Pure expression: unhex + decode.
    """
    h = hex_normalize(col, 64)
    stripped = F.regexp_replace(h, "^(00)+", "")
    padded = F.when(F.length(stripped) % 2 == 1, F.concat(F.lit("0"), stripped)).otherwise(
        stripped
    )
    return F.when(felt_to_hex_is_zero(col), F.lit("")).otherwise(
        F.decode(F.unhex(padded), "UTF-8")
    )


def felt_to_hex_is_zero(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.regexp_replace(col, "^0x", "")), "^0+", "") == ""


def interval_intersect(
    lo1: Column, hi1: Column, lo2: Column, hi2: Column
) -> tuple[Column, Column, Column]:
    """Half-open interval intersection [lo,hi) — the range-type algebra
    the reference gets from Postgres int4range (src/dao.ts:1160-1179).

    Returns (lo, hi, nonempty).
    """
    lo = F.greatest(lo1, lo2)
    hi = F.least(hi1, hi2)
    return lo, hi, hi > lo


def pool_key_hash(
    token0: Column, token1: Column, fee: Column, tick_spacing: Column, extension: Column
) -> Column:
    """SHA-256 over the packed pool key fields, as canonical 0x-hex.

    The reference packs (token0, token1, fee, tick_spacing, extension)
    into fixed-width big-endian bytes and hashes client-side
    (src/poolKeyHash.ts:4-14). Here: fixed-width lowercase hex
    concatenation -> unhex -> sha2, a deterministic equivalent the
    fixture generator mirrors.
    """
    packed = F.concat(
        hex_normalize(token0, 64),
        hex_normalize(token1, 64),
        hex_normalize(fee, 32),
        F.lpad(F.lower(F.hex(tick_spacing.cast("long"))), 8, "0"),
        hex_normalize(extension, 64),
    )
    return F.concat(F.lit("0x"), F.sha2(F.unhex(packed), 256))
