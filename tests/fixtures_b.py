"""Deterministic Ekubo-shaped (Family B) fixture generator.

Synthesizes the FIXTURES.md Family B tables as parquet with seed 42 so
view-level golden tests (V1..V17 vs DuckDB SQL) are reproducible. All
FK and sign invariants from FIXTURES.md hold:

- every fact row's block_number exists in blocks; pool_key_hash in pool_keys
- event_id = block*2^32 + tx*2^16 + idx, unique and monotone in chain order
- swaps: delta0/delta1 opposite signs; position_updates mix mints/burns
  with occasional exact per-(pool,tick) cancellation (V2 delete-on-zero)
- pool fee values are 2^64-aligned so the Q128 fee math is exact within
  DECIMAL(38,0) (see views/hourly.py fee note)
- exactly one pool_initialization per pool, before its first swap
"""

from __future__ import annotations

import os
from decimal import Decimal

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/tmp/spark_graft_family_b_v1"
SEED = 42

N_BLOCKS = 3000
BLOCK_SECONDS = 36  # 3000 blocks ~ 30 hours (exercises 24h windows)
T0 = pd.Timestamp("2024-01-01 00:00:00")

N_TOKENS = 10
N_POOLS = 20
N_TWAMM_POOLS = 5
N_SPLINE_POOLS = 3

TWO64 = 1 << 64


class _EventAllocator:
    """event_id = block*2^32 + tx*2^16 + idx (src/dao.ts:124); one tx
    per event, per-block tx counters keep ids unique."""

    def __init__(self, rng: np.random.Generator):
        self.rng = rng
        self.next_tx: dict[int, int] = {}

    def alloc(self, n: int, block_lo: int = 1, block_hi: int = N_BLOCKS) -> pd.DataFrame:
        blocks = np.sort(self.rng.integers(block_lo, block_hi + 1, n))
        txs = np.empty(n, dtype=np.int64)
        for i, b in enumerate(blocks):
            txs[i] = self.next_tx.get(int(b), 0)
            self.next_tx[int(b)] = txs[i] + 1
        eid = blocks.astype(np.int64) * (1 << 32) + txs * (1 << 16)
        return pd.DataFrame(
            {
                "event_id": eid,
                "transaction_hash": self.rng.integers(1, 1 << 62, n),
                "block_number": blocks.astype(np.int32),
                "transaction_index": txs.astype(np.int16),
                "event_index": np.zeros(n, dtype=np.int16),
                "emitter": np.full(n, 0xE0B0, dtype=np.int64),
            }
        )


def _write(path: str, name: str, df: pd.DataFrame, decimal_cols: dict[str, int] | None = None):
    decimal_cols = decimal_cols or {}
    # wide-int columns can't round-trip through int64 inference: build
    # them as decimal128 arrays directly
    narrow = df.drop(columns=list(decimal_cols))
    table = pa.Table.from_pandas(narrow, preserve_index=False)
    # Spark's vectorized reader rejects TIMESTAMP(NANOS): store micros
    for i, f in enumerate(table.schema):
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            table = table.set_column(i, f.name, table.column(i).cast(pa.timestamp("us")))
    for col, prec in decimal_cols.items():
        pos = list(df.columns).index(col)
        table = table.add_column(
            min(pos, table.num_columns),
            col,
            pa.array([Decimal(int(v)) for v in df[col]], pa.decimal128(prec, 0)),
        )
    pq.write_table(table, os.path.join(path, f"{name}.parquet"))


def generate(path: str = FIXTURE_DIR) -> str:
    marker = os.path.join(path, "_COMPLETE")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(SEED)
    alloc = _EventAllocator(rng)

    # ---- dimensions -------------------------------------------------
    blocks = pd.DataFrame(
        {
            "number": np.arange(1, N_BLOCKS + 1, dtype=np.int32),
            "hash": rng.integers(1, 1 << 62, N_BLOCKS),
            "time": T0 + pd.to_timedelta(np.arange(N_BLOCKS) * BLOCK_SECONDS, unit="s"),
        }
    )
    _write(path, "blocks", blocks)

    tokens = np.arange(101, 101 + N_TOKENS, dtype=np.int64)
    pairs = [(int(a), int(b)) for i, a in enumerate(tokens) for b in tokens[i + 1 :]]
    rng.shuffle(pairs)

    fee_rates = rng.integers(int(0.0001 * TWO64), int(0.01 * TWO64), N_POOLS + N_TWAMM_POOLS)
    spacings = rng.choice([10, 60, 200], N_POOLS)
    MAX_TICK_SPACING = 354892  # TWAMM sentinel, src/dao.ts:41-47

    pool_rows = []
    for i in range(N_POOLS):
        t0, t1 = pairs[i % len(pairs)]
        pool_rows.append(
            dict(
                key_hash=9000 + i,
                token0=t0,
                token1=t1,
                fee=int(fee_rates[i]) * TWO64,
                tick_spacing=int(spacings[i]),
                extension=0,
            )
        )
    for i in range(N_TWAMM_POOLS):
        t0, t1 = pairs[(N_POOLS + i) % len(pairs)]
        pool_rows.append(
            dict(
                key_hash=9500 + i,
                token0=t0,
                token1=t1,
                fee=int(fee_rates[N_POOLS + i]) * TWO64,
                tick_spacing=MAX_TICK_SPACING,
                extension=0xE0,  # TWAMM extension sentinel (emitter-as-extension)
            )
        )
    pool_keys = pd.DataFrame(pool_rows)
    pool_keys["tick_spacing"] = pool_keys["tick_spacing"].astype(np.int32)
    _write(path, "pool_keys", pool_keys, {"fee": 38})

    amm_pools = pool_keys.iloc[:N_POOLS]

    # ---- pool initializations: 1 per pool, early blocks -------------
    env = alloc.alloc(N_POOLS, 1, 10)
    inits = env.assign(
        pool_key_hash=amm_pools.key_hash.values,
        tick=rng.integers(-100_000, 100_000, N_POOLS).astype(np.int32),
        sqrt_ratio=rng.integers(1 << 40, 1 << 50, N_POOLS),
    )
    _write(path, "pool_initializations", inits)

    # ---- swaps -------------------------------------------------------
    n_swaps = 5000
    env = alloc.alloc(n_swaps, 11, N_BLOCKS)
    pool_idx = rng.integers(0, N_POOLS, n_swaps)
    amt_in = rng.integers(10**6, 10**12, n_swaps)
    amt_out = (amt_in * rng.uniform(0.95, 1.05, n_swaps)).astype(np.int64)
    dir0 = rng.random(n_swaps) < 0.5  # True: token0 in, token1 out
    swaps = env.assign(
        locker=rng.integers(1, 1 << 40, n_swaps),
        pool_key_hash=amm_pools.key_hash.values[pool_idx],
        delta0=np.where(dir0, amt_in, -amt_out),
        delta1=np.where(dir0, -amt_out, amt_in),
        sqrt_ratio_after=rng.integers(1 << 40, 1 << 50, n_swaps),
        tick_after=rng.integers(-200_000, 200_000, n_swaps).astype(np.int32),
        liquidity_after=rng.integers(10**9, 10**15, n_swaps),
    )
    _write(path, "swaps", swaps)

    # ---- position updates (with exact-cancellation pairs for V2) ----
    n_pu = 1000
    n_cancel = 150
    env = alloc.alloc(n_pu, 11, N_BLOCKS)
    pool_idx = rng.integers(0, N_POOLS, n_pu - n_cancel)
    spc = amm_pools.tick_spacing.values[pool_idx]
    lower = (rng.integers(-50, 49, n_pu - n_cancel) * spc).astype(np.int32)
    upper = (lower + rng.integers(1, 20, n_pu - n_cancel) * spc).astype(np.int32)
    liq = rng.integers(10**9, 10**14, n_pu - n_cancel)
    sign = np.where(rng.random(n_pu - n_cancel) < 0.7, 1, -1)
    liq = liq * sign
    base = pd.DataFrame(
        {
            "pool_key_hash": amm_pools.key_hash.values[pool_idx],
            "lower_bound": lower,
            "upper_bound": upper,
            "liquidity_delta": liq,
        }
    )
    # cancellation rows: exact negation of sampled earlier rows
    cancel_src = base.sample(n=n_cancel, random_state=7, replace=False)
    cancel = cancel_src.assign(liquidity_delta=-cancel_src.liquidity_delta.values)
    payload = pd.concat([base, cancel], ignore_index=True)
    position_updates = env.assign(
        locker=rng.integers(1, 1 << 40, n_pu),
        pool_key_hash=payload.pool_key_hash.values,
        salt=rng.integers(1, 1 << 40, n_pu),
        lower_bound=payload.lower_bound.values,
        upper_bound=payload.upper_bound.values,
        liquidity_delta=payload.liquidity_delta.values,
        delta0=np.where(payload.liquidity_delta.values > 0, 1, -1)
        * rng.integers(10**5, 10**11, n_pu),
        delta1=np.where(payload.liquidity_delta.values > 0, 1, -1)
        * rng.integers(10**5, 10**11, n_pu),
    )
    _write(path, "position_updates", position_updates)

    # ---- fee events ---------------------------------------------------
    def _fee_like(name, n, sign=-1):
        env = alloc.alloc(n, 11, N_BLOCKS)
        p = rng.integers(0, N_POOLS, n)
        spc = amm_pools.tick_spacing.values[p]
        lo = (rng.integers(-50, 49, n) * spc).astype(np.int32)
        df = env.assign(
            pool_key_hash=amm_pools.key_hash.values[p],
            owner=rng.integers(1, 1 << 40, n),
            salt=rng.integers(1, 1 << 40, n),
            lower_bound=lo,
            upper_bound=(lo + rng.integers(1, 20, n) * spc).astype(np.int32),
            delta0=sign * rng.integers(0, 10**9, n),
            delta1=sign * rng.integers(0, 10**9, n),
        )
        _write(path, name, df)

    _fee_like("position_fees_collected", 300)
    _fee_like("protocol_fees_paid", 300)

    n_fa = 200
    env = alloc.alloc(n_fa, 11, N_BLOCKS)
    p = rng.integers(0, N_POOLS, n_fa)
    a0 = rng.integers(0, 10**9, n_fa)
    a1 = rng.integers(0, 10**9, n_fa)
    zero_side = rng.integers(0, 3, n_fa)  # 0: a0=0, 1: a1=0, 2: both nonzero
    fees_accumulated = env.assign(
        pool_key_hash=amm_pools.key_hash.values[p],
        amount0=np.where(zero_side == 0, 0, a0),
        amount1=np.where(zero_side == 1, 0, a1),
    )
    _write(path, "fees_accumulated", fees_accumulated)

    n_pfw = 100
    env = alloc.alloc(n_pfw)
    _write(
        path,
        "protocol_fees_withdrawn",
        env.assign(
            recipient=rng.integers(1, 1 << 40, n_pfw),
            token=rng.choice(tokens, n_pfw),
            amount=rng.integers(1, 10**9, n_pfw),
        ),
    )

    # ---- position transfers / mints ----------------------------------
    n_pt = 300
    env = alloc.alloc(n_pt)
    frm = rng.integers(0, 1 << 40, n_pt)
    frm[: n_pt // 5] = 0  # zero-address mints
    _write(
        path,
        "position_transfers",
        env.assign(
            token_id=rng.integers(1, 5000, n_pt),
            from_address=frm,
            to_address=rng.integers(1, 1 << 40, n_pt),
        ),
    )
    n_pm = 120
    env = alloc.alloc(n_pm)
    _write(
        path,
        "position_minted_with_referrer",
        env.assign(
            token_id=np.arange(1, n_pm + 1, dtype=np.int64),
            referrer=rng.integers(1, 1 << 40, n_pm),
        ),
    )

    # ---- TWAMM --------------------------------------------------------
    twamm_keys = pool_keys.iloc[N_POOLS:].key_hash.values
    STEP = 512  # seconds; order times aligned to this step
    horizon = N_BLOCKS * BLOCK_SECONDS

    n_voe = 100
    env = alloc.alloc(n_voe, 20, N_BLOCKS)
    voe = env.assign(
        key_hash=rng.choice(twamm_keys, n_voe),
        token0_sale_rate=rng.integers(0, 10**9, n_voe),
        token1_sale_rate=rng.integers(0, 10**9, n_voe),
        delta0=rng.integers(-(10**8), 10**8, n_voe),
        delta1=rng.integers(-(10**8), 10**8, n_voe),
    )
    _write(path, "twamm_virtual_order_executions", voe)

    n_tou = 300
    env = alloc.alloc(n_tou, 11, N_BLOCKS)
    start_s = (rng.integers(0, horizon // STEP, n_tou)) * STEP
    dur_s = rng.integers(1, 2 * horizon // STEP, n_tou) * STEP
    which = rng.random(n_tou) < 0.5
    mag = rng.integers(10**4, 10**8, n_tou)
    sgn = np.where(rng.random(n_tou) < 0.6, 1, -1)
    tou = env.assign(
        key_hash=rng.choice(twamm_keys, n_tou),
        owner=rng.integers(1, 1 << 40, n_tou),
        salt=rng.integers(1, 1 << 40, n_tou),
        sale_rate_delta0=np.where(which, mag * sgn, 0),
        sale_rate_delta1=np.where(~which, mag * sgn, 0),
        start_time=T0 + pd.to_timedelta(start_s, unit="s"),
        end_time=T0 + pd.to_timedelta(start_s + dur_s, unit="s"),
    )
    _write(path, "twamm_order_updates", tou)

    n_tpw = 50
    env = alloc.alloc(n_tpw, 11, N_BLOCKS)
    w_start = (rng.integers(0, horizon // STEP, n_tpw)) * STEP
    w_dur = rng.integers(1, horizon // STEP, n_tpw) * STEP
    which = rng.random(n_tpw) < 0.5
    amt = rng.integers(1, 10**9, n_tpw)
    _write(
        path,
        "twamm_proceeds_withdrawals",
        env.assign(
            key_hash=rng.choice(twamm_keys, n_tpw),
            owner=rng.integers(1, 1 << 40, n_tpw),
            salt=rng.integers(1, 1 << 40, n_tpw),
            amount0=np.where(which, amt, 0),
            amount1=np.where(~which, amt, 0),
            start_time=T0 + pd.to_timedelta(w_start, unit="s"),
            end_time=T0 + pd.to_timedelta(w_start + w_dur, unit="s"),
        ),
    )

    # ---- oracle snapshots ---------------------------------------------
    n_os = 200
    env = alloc.alloc(n_os)
    pair_idx = rng.integers(0, 3, n_os)
    o_t0 = tokens[[0, 1, 2]][pair_idx]
    o_t1 = tokens[[3, 4, 5]][pair_idx]
    idx_within = np.zeros(n_os, dtype=np.int64)
    counters: dict[int, int] = {}
    for i, pi in enumerate(pair_idx):
        idx_within[i] = counters.get(int(pi), 0)
        counters[int(pi)] = idx_within[i] + 1
    _write(
        path,
        "oracle_snapshots",
        env.assign(
            key_hash=9800 + pair_idx,
            token0=o_t0,
            token1=o_t1,
            index=idx_within,
            snapshot_block_timestamp=(env.block_number.values.astype(np.int64) * BLOCK_SECONDS)
            + int(T0.timestamp()),
            snapshot_tick_cumulative=np.cumsum(rng.integers(-(10**6), 10**6, n_os)),
        ),
    )

    # ---- limit orders --------------------------------------------------
    n_lop = 100
    env = alloc.alloc(n_lop, 11, N_BLOCKS)
    lp_pair = rng.integers(0, len(pairs), n_lop)
    lop = env.assign(
        key_hash=9850 + (lp_pair % 4),
        owner=rng.integers(1, 1 << 40, n_lop),
        salt=np.arange(1, n_lop + 1, dtype=np.int64),
        token0=[pairs[i][0] for i in lp_pair],
        token1=[pairs[i][1] for i in lp_pair],
        tick=(rng.integers(-1000, 1000, n_lop) * 128).astype(np.int32),
        liquidity=rng.integers(10**6, 10**12, n_lop),
        amount=rng.integers(10**3, 10**9, n_lop),
    )
    _write(path, "limit_order_placed", lop)

    closed_sel = rng.choice(n_lop, 50, replace=False)
    env = alloc.alloc(50, 12, N_BLOCKS)
    _write(
        path,
        "limit_order_closed",
        env.assign(
            key_hash=lop.key_hash.values[closed_sel],
            owner=lop.owner.values[closed_sel],
            salt=lop.salt.values[closed_sel],
            token0=lop.token0.values[closed_sel],
            token1=lop.token1.values[closed_sel],
            tick=lop.tick.values[closed_sel],
            amount0=rng.integers(0, 10**9, 50),
            amount1=rng.integers(0, 10**9, 50),
        ),
    )

    # ---- spline liquidity_updated ---------------------------------------
    n_lu = 200
    env = alloc.alloc(n_lu, 11, N_BLOCKS)
    _write(
        path,
        "liquidity_updated",
        env.assign(
            pool_key_hash=9900 + rng.integers(0, N_SPLINE_POOLS, n_lu),
            sender=rng.integers(1, 1 << 40, n_lu),
            liquidity_factor=rng.integers(1, 10**12, n_lu)
            * np.where(rng.random(n_lu) < 0.7, 1, -1),
            shares=rng.integers(1, 10**12, n_lu),
            amount0=rng.integers(-(10**9), 10**9, n_lu),
            amount1=rng.integers(-(10**9), 10**9, n_lu),
            protocol_fees0=rng.integers(0, 10**6, n_lu),
            protocol_fees1=rng.integers(0, 10**6, n_lu),
        ),
    )

    # ---- staking ----------------------------------------------------------
    n_ss = 200
    env = alloc.alloc(n_ss)
    stakers = rng.integers(1, 30, n_ss) * 1111
    delegates = rng.integers(1, 8, n_ss) * 7777
    staked = env.assign(
        from_address=stakers,
        amount=rng.integers(10**3, 10**9, n_ss),
        delegate=delegates,
    )
    _write(path, "staker_staked", staked)

    n_sw = 80
    env = alloc.alloc(n_sw, 100, N_BLOCKS)
    src = staked.sample(n=n_sw, random_state=11)
    _write(
        path,
        "staker_withdrawn",
        env.assign(
            from_address=src.from_address.values,
            amount=(src.amount.values * rng.uniform(0.1, 0.9, n_sw)).astype(np.int64),
            recipient=rng.integers(1, 1 << 40, n_sw),
            delegate=src.delegate.values,
        ),
    )

    # ---- governance ---------------------------------------------------------
    env = alloc.alloc(3, 1, 50)
    _write(
        path,
        "governor_reconfigured",
        env.assign(
            version=np.array([1, 2, 3], dtype=np.int64),
            voting_start_delay=np.array([3600, 7200, 3600], dtype=np.int64),
            voting_period=np.array([86400, 86400, 43200], dtype=np.int64),
            voting_weight_smoothing_duration=np.array([600, 600, 1200], dtype=np.int64),
            quorum=np.array([10**6, 2 * 10**6, 10**6], dtype=np.int64),
            proposal_creation_threshold=np.array([10**4, 10**4, 10**5], dtype=np.int64),
            execution_delay=np.array([3600, 3600, 7200], dtype=np.int64),
            execution_window=np.array([86400, 86400, 86400], dtype=np.int64),
        ),
    )
    n_gp = 10
    env = alloc.alloc(n_gp, 200, 2000)
    gp = env.assign(
        id=np.arange(501, 501 + n_gp, dtype=np.int64),
        proposer=rng.integers(1, 1 << 40, n_gp),
        config_version=np.where(rng.random(n_gp) < 0.8, rng.integers(1, 4, n_gp), None),
    )
    _write(path, "governor_proposed", gp)

    n_gv = 100
    env = alloc.alloc(n_gv, 300, N_BLOCKS)
    _write(
        path,
        "governor_voted",
        env.assign(
            id=rng.choice(gp.id.values, n_gv),
            voter=rng.integers(1, 30, n_gv) * 1111,
            weight=rng.integers(1, 10**6, n_gv),
            yea=rng.random(n_gv) < 0.6,
        ),
    )
    env = alloc.alloc(2, 400, N_BLOCKS)
    _write(path, "governor_canceled", env.assign(id=gp.id.values[:2]))
    env = alloc.alloc(5, 500, N_BLOCKS)
    _write(path, "governor_executed", env.assign(id=gp.id.values[2:7]))
    env = alloc.alloc(8, 210, N_BLOCKS)
    descs = [
        "# proposal\n\nhello world",
        "simple description",
        "multi\nline\ntext",
        "unicode: ünïcôdé ✓",
        "```\ncode block\n```",
        "a" * 200,
        "## heading two",
        "final proposal text",
    ]
    _write(path, "governor_proposal_described", env.assign(id=gp.id.values[:8], description=descs))

    # ---- token registrations (V8 semantics: squatting + re-registration) ----
    def pack(s: str) -> int:
        return int.from_bytes(s.encode(), "big")

    regs = []
    # 10 clean tokens registered by their own address
    for i in range(10):
        regs.append(dict(address=int(tokens[i]), name=pack(f"Token{i}"), symbol=pack(f"TK{i}"),
                         decimals=18, total_supply=10**12))
    # re-registration: token0 updates metadata later (latest wins)
    regs.append(dict(address=int(tokens[0]), name=pack("TokenZero"), symbol=pack("TK0"),
                     decimals=6, total_supply=10**13))
    # squatter: different address claims TK1 later (first registrant wins)
    regs.append(dict(address=99999, name=pack("Fake"), symbol=pack("TK1"),
                     decimals=18, total_supply=1))
    # invalid symbols: too short / too long / non-ascii
    regs.append(dict(address=88888, name=pack("Bad1"), symbol=pack("X"), decimals=18, total_supply=1))
    regs.append(dict(address=88887, name=pack("Bad2"), symbol=pack("WAYTOOLONGSYM"), decimals=18, total_supply=1))
    regs.append(dict(address=88886, name=pack("Bad3"), symbol=int.from_bytes("é".encode(), "big"),
                     decimals=18, total_supply=1))
    env = alloc.alloc(len(regs), 30, 2500)
    regdf = env.assign(**pd.DataFrame(regs).to_dict("list"))
    _write(path, "token_registrations", regdf, {"name": 38, "symbol": 38})

    # v3: string name/symbol; one upgrade of TK2's metadata, one new token
    v3 = [
        dict(address=int(tokens[2]), name="Token2 v3", symbol="TK2", decimals=18, total_supply=10**12),
        dict(address=int(tokens[9]) + 1000, name="NewToken", symbol="NEWT", decimals=8, total_supply=10**10),
        dict(address=77777, name="bad", symbol="", decimals=0, total_supply=0),
    ]
    env = alloc.alloc(len(v3), 2500, N_BLOCKS)
    _write(path, "token_registrations_v3", env.assign(**pd.DataFrame(v3).to_dict("list")))

    with open(marker, "w") as f:
        f.write("ok")
    return path


if __name__ == "__main__":
    print(generate())
