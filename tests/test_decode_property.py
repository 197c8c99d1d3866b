"""Property-based decode round-trips: randomized events are encoded to
felt arrays by an independent test-side encoder, decoded by the engine,
and compared field by field. Complements the ported fixed vectors of
test_decode.py (SURVEY §5.2: property tests over the decode layer).

All cases for one event type batch into a single DataFrame — one Spark
job per type, hundreds of randomized rows.
"""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark.decode import decode_events

SEED = 0xEB0
N_CASES = 120


def _rng():
    return random.Random(SEED)


def enc_i129(rng, bound=10**30):
    v = rng.randint(-bound, bound)
    return v, [hex(abs(v)), hex(0 if v >= 0 else 1)]


def enc_u128(rng):
    v = rng.randint(0, 2**100)  # inside the DECIMAL(38) width policy
    return v, [hex(v)]


def enc_address(rng):
    v = rng.randint(1, 2**251)
    return "0x" + format(v, "x"), [hex(v)]


def enc_bool(rng):
    v = rng.random() < 0.5
    return v, [hex(int(v))]


def enc_span_u128(rng, max_len=6):
    vals = [rng.randint(0, 2**90) for _ in range(rng.randint(0, max_len))]
    return vals, [hex(len(vals))] + [hex(v) for v in vals]


def enc_byte_array(rng):
    words = rng.randint(0, 2)
    parts = []
    felts = [hex(words)]
    for _ in range(words):
        chunk = "".join(rng.choice("abcdefghij klmnop") for _ in range(31))
        parts.append(chunk)
        felts.append(hex(int.from_bytes(chunk.encode(), "big")))
    pending_len = rng.randint(0, 30)
    pending = "".join(rng.choice("qrstuv wxyz0123") for _ in range(pending_len)).lstrip(" ")
    felts.append(hex(int.from_bytes(pending.encode(), "big")) if pending else hex(0))
    felts.append(hex(len(pending)))
    return "".join(parts) + pending, felts


def _decode(spark, event_type, datas):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(datas)], "case_id long, data array<string>"
    )
    return {
        r["case_id"]: r
        for r in decode_events(df, event_type).orderBy("case_id").collect()
    }


class TestScalarRoundTrips:
    def test_swapped_randomized(self, spark):
        rng = _rng()
        cases, datas = [], []
        for _ in range(N_CASES):
            locker, f_locker = enc_address(rng)
            pool = []
            pool_vals = {}
            for fld in ("token0", "token1", "extension"):
                v, f = enc_address(rng)
                pool_vals[fld] = v
                pool.append(f)
            fee, f_fee = enc_u128(rng)
            ts, f_ts = enc_u128(rng)
            amount, f_amount = enc_i129(rng)
            is1, f_is1 = enc_bool(rng)
            limit, f_limit = enc_u128(rng)
            skip, f_skip = enc_u128(rng)
            d0, f_d0 = enc_i129(rng)
            d1, f_d1 = enc_i129(rng)
            sq, f_sq = enc_u128(rng)
            tick, f_tick = enc_i129(rng, bound=10**7)
            liq, f_liq = enc_u128(rng)
            data = (
                f_locker + pool[0] + pool[1] + f_fee + f_ts + pool[2]
                + f_amount + f_is1 + f_limit + [hex(0)] + f_skip
                + f_d0 + f_d1 + f_sq + [hex(0)] + f_tick + f_liq
            )
            cases.append(dict(locker=locker, **pool_vals, fee=fee, tick_spacing=ts,
                              amount=amount, is1=is1, d0=d0, d1=d1, sq=sq,
                              tick=tick, liq=liq))
            datas.append(data)
        got = _decode(spark, "swapped", datas)
        for i, c in enumerate(cases):
            r = got[i]
            assert r["locker"] == c["locker"]
            assert r["pool_key"]["token0"] == c["token0"]
            assert r["pool_key"]["fee"] == Decimal(c["fee"])
            assert r["pool_key"]["tick_spacing"] == Decimal(c["tick_spacing"])
            assert r["params"]["amount"] == Decimal(c["amount"])
            assert r["params"]["is_token1"] == c["is1"]
            assert r["delta"]["amount0"] == Decimal(c["d0"])
            assert r["delta"]["amount1"] == Decimal(c["d1"])
            assert r["sqrt_ratio_after"] == Decimal(c["sq"])
            assert r["tick_after"] == Decimal(c["tick"])
            assert r["liquidity_after"] == Decimal(c["liq"])

    def test_governor_proposed_span_randomized(self, spark):
        """Variable-width nested spans: random call lists with random
        calldata lengths, including empty at every level."""
        rng = _rng()
        cases, datas = [], []
        for _ in range(60):
            pid, f_pid = enc_address(rng)
            proposer, f_prop = enc_address(rng)
            calls = []
            felts = f_pid + f_prop
            n_calls = rng.randint(0, 3)
            felts.append(hex(n_calls))
            for _ in range(n_calls):
                to, f_to = enc_address(rng)
                sel, f_sel = enc_address(rng)
                calldata, f_cd = enc_span_u128(rng, max_len=4)
                calls.append((to, sel, ["0x" + format(v, "x") for v in calldata]))
                felts += f_to + f_sel + f_cd
            has_ver = rng.random() < 0.5
            ver = rng.randint(0, 100) if has_ver else None
            if has_ver:
                felts.append(hex(ver))
            cases.append((pid, proposer, calls, ver))
            datas.append(felts)
        got = _decode(spark, "governor_proposed", datas)
        for i, (pid, proposer, calls, ver) in enumerate(cases):
            r = got[i]
            assert r["id"] == pid
            assert r["proposer"] == proposer
            assert r["config_version"] == ver
            decoded_calls = [
                (c["to"], c["selector"], list(c["calldata"])) for c in (r["calls"] or [])
            ]
            assert decoded_calls == [(t, s, cd) for t, s, cd in calls], i

    def test_byte_array_randomized(self, spark):
        rng = _rng()
        cases, datas = [], []
        for _ in range(80):
            pid, f_pid = enc_address(rng)
            s, f_ba = enc_byte_array(rng)
            cases.append((pid, s))
            datas.append(f_pid + f_ba)
        got = _decode(spark, "governor_described", datas)
        for i, (pid, s) in enumerate(cases):
            assert got[i]["id"] == pid
            assert got[i]["description"] == s, i
