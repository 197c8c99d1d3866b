from .core import (  # noqa: F401
    event_id_column,
    felt_to_decimal,
    hex_normalize,
    i129_value,
    interval_intersect,
    pool_key_hash,
    short_string_decode,
    to_hex,
    u256_value,
)
