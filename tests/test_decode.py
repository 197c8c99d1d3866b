"""Decode-layer unit tests porting the reference's exact vectors
(/root/reference/src/parse.test.ts) plus property-style checks for
i129/u256/bool (FIXTURES.md 'Decode-layer test vectors')."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from starknet_indexer_spark import decode as D


def run_parser(spark, parser, felts, offset=0):
    df = spark.createDataFrame([(felts,)], "data: array<string>")
    value, nxt = parser.parse(F.col("data"), F.lit(offset).cast("int"))
    row = df.select(value.alias("v"), nxt.cast("int").alias("n")).collect()[0]
    return row["v"], row["n"]


def hexes(*ints):
    return [hex(i) for i in ints]


class TestPoolKey:
    # parse.test.ts:7-23
    def test_from_zero(self, spark):
        v, n = run_parser(spark, D.POOL_KEY, ["0x5", "0x4", "0x3", "0x2", "0x1", "0x0"], 0)
        assert n == 5
        assert v.asDict() == {
            "token0": "0x5",
            "token1": "0x4",
            "fee": Decimal(3),
            "tick_spacing": Decimal(2),
            "extension": "0x1",
        }

    # parse.test.ts:25-41
    def test_from_offset(self, spark):
        v, n = run_parser(
            spark, D.POOL_KEY, ["0x5", "0x4", "0x3", "0x2", "0x1", "0x2", "0x3", "0x4"], 3
        )
        assert n == 8
        assert v["token0"] == "0x2"
        assert v["token1"] == "0x1"
        assert v["fee"] == Decimal(2)
        assert v["tick_spacing"] == Decimal(3)
        assert v["extension"] == "0x4"


class TestShortString:
    # parse.test.ts:46-65 (parseUint8Array cases)
    @pytest.mark.parametrize(
        "felts,offset,expected",
        [
            (hexes(0x68656C6C6F20776F726C64), 0, "hello world"),
            (["0x0"], 0, ""),
            (hexes(0x0, 0x68656C6C6F20776F726C64), 1, "hello world"),
        ],
    )
    def test_vectors(self, spark, felts, offset, expected):
        v, n = run_parser(spark, D.short_string, felts, offset)
        assert v == expected
        assert n == offset + 1


class TestByteArray:
    # parse.test.ts:94-149
    @pytest.mark.parametrize(
        "ints,offset,expected_value,expected_next",
        [
            ([0, 0x68656C6C6F, 5], 0, "hello", 3),
            ([123, 0, 0x68656C6C6F, 5], 1, "hello", 4),
            (
                [
                    1,
                    0x4C6F6E6720737472696E672C206D6F7265207468616E203331206368617261,
                    0x63746572732E,
                    6,
                ],
                0,
                "Long string, more than 31 characters.",
                4,
            ),
            (
                [
                    0,
                    1,
                    0x4C6F6E6720737472696E672C206D6F7265207468616E203331206368617261,
                    0x63746572732E,
                    6,
                    0,
                ],
                1,
                "Long string, more than 31 characters.",
                5,
            ),
            (
                [
                    0x25A6C62B25DB639C2A0FB26678F1AC2870E5FE8B22D3BD3EEC09691D6755D8F,
                    0x2,
                    0x2320746573742070726F706F73616C206465736372697074696F6E0A0A6865,
                    0x6C6C6F20776F726C640A0A6060600A636F64650A6060600A0A232320746573,
                    0x740A0A6E6F74207265616C6C79,
                    0x0D,
                ],
                1,
                "# test proposal description\n\nhello world\n\n```\ncode\n```\n\n## test\n\nnot really",
                6,
            ),
        ],
    )
    def test_vectors(self, spark, ints, offset, expected_value, expected_next):
        v, n = run_parser(spark, D.byte_array, hexes(*ints), offset)
        assert v == expected_value
        assert n == expected_next


class TestNumeric:
    def test_i129_sign(self, spark):
        # [mag, 0] -> +mag; [mag, nonzero] -> -mag (parse.ts:48-55)
        v, _ = run_parser(spark, D.i129, hexes(12345, 0))
        assert v == Decimal(12345)
        v, _ = run_parser(spark, D.i129, hexes(12345, 1))
        assert v == Decimal(-12345)

    def test_u256(self, spark):
        # lo + hi * 2^128 (parse.ts:40-46); hi == 0 for value-bounded
        # quantities (width policy, SURVEY.md §1.2)
        big_lo = 2**126 + 98765
        v, n = run_parser(spark, D.u256, hexes(big_lo, 0))
        assert v == Decimal(big_lo)
        assert n == 2

    def test_u256_overflow_raises(self, spark):
        # nonzero hi exceeds DECIMAL(38,0): must raise, never truncate
        with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|out of range|Overflow|38"):
            run_parser(spark, D.u256, hexes(7, 2))

    def test_u128_wide(self, spark):
        # DECIMAL(38,0) holds u128 values up to ~1.7e38; 2^126 is the
        # documented safe bound (SURVEY.md §7 numeric width policy)
        big = 2**126 + 12345
        v, _ = run_parser(spark, D.u128, hexes(big))
        assert v == Decimal(big)

    def test_bool_strict(self, spark):
        v, _ = run_parser(spark, D.boolean, ["0x0"])
        assert v is False
        v, _ = run_parser(spark, D.boolean, ["0x1"])
        assert v is True
        with pytest.raises(Exception, match="Invalid boolean"):
            run_parser(spark, D.boolean, ["0x2"])


class TestSpans:
    def test_span_fixed_width(self, spark):
        v, n = run_parser(spark, D.span_of(D.u128), hexes(3, 10, 20, 30, 99), 0)
        assert v == [Decimal(10), Decimal(20), Decimal(30)]
        assert n == 4

    def test_span_empty(self, spark):
        v, n = run_parser(spark, D.span_of(D.u128), hexes(0, 99), 0)
        assert v == []
        assert n == 1

    def test_nested_span(self, spark):
        # governor_executed shape: span of span of felt252
        felts = hexes(2, 2, 0xA, 0xB, 1, 0xC)
        v, n = run_parser(spark, D.span_of(D.span_of(D.felt252)), felts, 0)
        assert v == [["0xa", "0xb"], ["0xc"]]
        assert n == 6

    def test_optional_present_and_absent(self, spark):
        p = D.struct_of(id=(0, D.u64), referrer=(1, D.optional(D.felt252)))
        v, n = run_parser(spark, p, hexes(9, 0xAB), 0)
        assert v["id"] == 9 and v["referrer"] == "0xab" and n == 2
        v, n = run_parser(spark, p, hexes(9), 0)
        assert v["id"] == 9 and v["referrer"] is None and n == 1


class TestStableSort:
    def test_shared_index_declaration_order(self, spark):
        # tokenRegistry: symbol/decimals/total_supply all index 2
        # (src/events/tokenRegistry.ts:14-19) -> parsed consecutively
        p = D.EVENT_PARSERS["token_registration"]
        felts = hexes(0xFEED, 0x546F6B656E, 0x544B4E, 18, 10**6)
        v, n = run_parser(spark, p, felts, 0)
        assert v["address"] == "0xfeed"
        assert v["name"] == "0x546f6b656e"
        assert v["symbol"] == "0x544b4e"
        assert v["decimals"] == 18
        assert v["total_supply"] == Decimal(10**6)
        assert n == 5


class TestEventShapes:
    def test_swapped_roundtrip(self, spark):
        # swapped: locker, pool_key(5), params(amount i129=2, is_token1=1,
        # sqrt_ratio_limit u256=2, skip_ahead=1), delta(4), sqrt_ratio_after(2),
        # tick_after(2), liquidity_after(1) = 18 felts
        felts = hexes(
            0xCAFE,  # locker
            0x1, 0x2, 0x3, 0x40, 0x0,  # pool key
            100, 0, 1, 5, 0, 7,  # params: amount=+100, is_token1=T, limit=5, skip=7
            50, 0, 60, 1,  # delta: +50, -60
            12345, 0,  # sqrt_ratio_after
            200, 1,  # tick_after = -200
            999,  # liquidity_after
        )
        v, n = run_parser(spark, D.EVENT_PARSERS["swapped"], felts, 0)
        assert n == 21
        assert v["locker"] == "0xcafe"
        assert v["pool_key"]["fee"] == Decimal(3)
        assert v["params"]["amount"] == Decimal(100)
        assert v["params"]["is_token1"] is True
        assert v["delta"]["amount0"] == Decimal(50)
        assert v["delta"]["amount1"] == Decimal(-60)
        assert v["sqrt_ratio_after"] == Decimal(12345)
        assert v["tick_after"] == Decimal(-200)
        assert v["liquidity_after"] == Decimal(999)

    def test_governor_proposed_with_calls(self, spark):
        # id, proposer, span of calls (each: to, selector, span of calldata), optional config
        felts = hexes(
            0x11, 0x22,
            2,          # 2 calls
            0xA1, 0xB1, 2, 0x1, 0x2,   # call 1: calldata [1,2]
            0xA2, 0xB2, 0,              # call 2: empty calldata
            7,          # config_version (optional, present)
        )
        v, n = run_parser(spark, D.EVENT_PARSERS["governor_proposed"], felts, 0)
        assert n == 12
        assert v["id"] == "0x11"
        calls = v["calls"]
        assert len(calls) == 2
        assert calls[0]["to"] == "0xa1" and calls[0]["calldata"] == ["0x1", "0x2"]
        assert calls[1]["calldata"] == []
        assert v["config_version"] == 7


class TestCreationThresholdBreachedParse:
    def test_shared_index_and_types(self, spark):
        # both fields declared at index 0 (src/events/governor.ts:49-52)
        # -> stable order (id, breach_timestamp); id felt252 hex,
        # timestamp u64 long
        p = D.EVENT_PARSERS["governor_creation_threshold_breached"]
        felts = hexes(0xBEEF, 1_700_000_000)
        v, n = run_parser(spark, p, felts, 0)
        assert v["id"] == "0xbeef"
        assert v["breach_timestamp"] == 1_700_000_000
        assert n == 2
