from .core import (  # noqa: F401
    decimal_floordiv,
    event_id_column,
    felt_to_decimal,
    hex_normalize,
    i129_value,
    interval_intersect,
    pool_key_hash,
    q128_fee_amount,
    short_string_decode,
    to_hex,
    u256_value,
)
