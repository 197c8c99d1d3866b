"""Programmatic DRIVER_PRIORITY rotation (VERDICT r5 mandate #2).

The per-round correctness harness hash-checks roughly the first 50
entries of ``DRIVER_PRIORITY`` against their DuckDB oracles and records
the results in ``CORRECTNESS_r{N}.json`` at the repo root.  Freshness
policy: every registered query should have a passing driver row, and no
query's latest row should fall more than two rounds behind HEAD.

Hand-curating the 50-slot window each round is error-prone (round 5
nearly dropped a never-verified query).  This module derives the window
mechanically from the committed evidence:

1. tier 0 — queries with NO passing row in any ``CORRECTNESS_r*.json``
   (newly registered, or previously failing), in registration order;
2. tier 1 — everything else, ascending by the round of its latest
   passing row (stalest first), registration order within a round.

``DRIVER_PRIORITY`` in ``queries/__init__.py`` stays an explicit,
reviewable list; ``tests/test_rotation.py`` asserts its front window
equals ``compute_priority(...)`` so the two can never drift.  Use

    python -m starknet_indexer_spark.queries.rotation

to print the recommended window when registering new queries.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Iterable, Mapping

#: How many entries the driver's correctness harness checks per round.
WINDOW = 50

#: Queries whose BEHAVIOR changed after their latest passing driver row,
#: so the existing evidence hash no longer reflects HEAD.  They jump the
#: staleness queue (right behind never-verified queries) until a fresh
#: row lands, at which point they should be removed from this set.
#: Round 12: empty — the 8 r10 plan-churned queries all landed fresh
#: passing rows in CORRECTNESS_r11, so the staleness queue alone drives
#: the window (VERDICT r11 mandate #1: front v17_staker_rewards + the
#: r8 band).
FORCE_FRONT: frozenset[str] = frozenset()


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _passed(rec: object) -> bool:
    """A CORRECTNESS record counts as a passing row.

    ``hash_match`` may be ``None`` for rows-only checks (queries without
    an oracle); rows+schema+no-error is the bar the judge applies there.
    """
    return (
        isinstance(rec, Mapping)
        and bool(rec.get("rows_match"))
        and bool(rec.get("schema_match"))
        and not rec.get("err")
        and rec.get("hash_match") is not False
    )


def load_verified_rounds(
    root: str | None = None, up_to: int | None = None
) -> dict[str, int]:
    """Latest round with a passing driver row, per query name.

    ``up_to`` bounds the evidence rounds consumed (inclusive).  The
    committed ``DRIVER_PRIORITY`` records the round it was generated
    from (``queries.EVIDENCE_ROUND``); pinning the contract test to that
    round means the driver landing a NEW ``CORRECTNESS_r{N+1}.json``
    does not retroactively turn the suite red — the list and the bump
    regenerate together in the next builder commit.
    """
    root = root or repo_root()
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rn = int(m.group(1))
        if up_to is not None and rn > up_to:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if _passed(rec):
                latest[name] = max(latest.get(name, 0), rn)
    return latest


def compute_priority(
    registered: Iterable[str],
    verified_rounds: Mapping[str, int] | None = None,
    window: int = WINDOW,
) -> list[str]:
    """Recommended DRIVER_PRIORITY front window.

    ``registered`` must be in registration order (REGISTRY dict order).
    Stable sort keeps registration order within each (tier, round) key.
    """
    if verified_rounds is None:
        verified_rounds = load_verified_rounds()
    names = list(registered)
    # Never-verified < behavior-changed (FORCE_FRONT) < stalest round first.
    ranked = sorted(
        names,
        key=lambda n: (
            -1.0
            if n not in verified_rounds
            else -0.5
            if n in FORCE_FRONT
            else float(verified_rounds[n])
        ),
    )
    return ranked[:window]


def latest_evidence_round(root: str | None = None) -> int:
    """Highest N among the committed CORRECTNESS_r{N}.json files."""
    root = root or repo_root()
    rounds = [
        int(m.group(1))
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", path))
    ]
    return max(rounds, default=0)


def main() -> None:
    from . import REGISTRY

    ev = latest_evidence_round()
    rounds = load_verified_rounds(up_to=ev)
    front = compute_priority(list(REGISTRY), rounds)
    print(f"# recommended DRIVER_PRIORITY front {len(front)} "
          f"(never-verified first, then stalest round first)")
    print(f"EVIDENCE_ROUND = {ev}")
    for name in front:
        rn = rounds.get(name)
        tag = "never" if rn is None else f"r{rn}"
        print(f'    "{name}",  # {tag}')
    displaced = [n for n in REGISTRY if n not in set(front)]
    stale = sorted(displaced, key=lambda n: rounds.get(n, -1))[:10]
    print(f"# outside window: {len(displaced)} queries; stalest 10:")
    for name in stale:
        print(f"#   {name} (r{rounds.get(name)})")


if __name__ == "__main__":
    main()
