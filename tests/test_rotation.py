"""Contract tests for the programmatic DRIVER_PRIORITY rotation.

VERDICT r5 mandate #2: the driver-checked front window must be derived
from the committed CORRECTNESS_r*.json evidence, not hand-curated.
"""

from __future__ import annotations

import os

from starknet_indexer_spark.queries import DRIVER_PRIORITY, EVIDENCE_ROUND, REGISTRY
from starknet_indexer_spark.queries.rotation import (
    WINDOW,
    compute_priority,
    load_verified_rounds,
    repo_root,
)


def test_driver_priority_matches_computed_window():
    """The explicit list equals the evidence-derived window verbatim.

    If this fails after registering a new query, regenerate with
    `python -m starknet_indexer_spark.queries.rotation` and paste.
    """
    expected = compute_priority(
        list(REGISTRY), load_verified_rounds(up_to=EVIDENCE_ROUND)
    )
    assert DRIVER_PRIORITY == expected


def test_window_size_and_membership():
    assert len(DRIVER_PRIORITY) == WINDOW
    assert len(set(DRIVER_PRIORITY)) == WINDOW
    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"


def test_never_verified_queries_lead_the_window():
    """Tier 0 (no passing driver row anywhere) must precede all tier 1."""
    rounds = load_verified_rounds(up_to=EVIDENCE_ROUND)
    tiers = [0 if n not in rounds else 1 for n in DRIVER_PRIORITY]
    assert tiers == sorted(tiers)


def test_no_registered_query_falls_too_stale():
    """Every query outside the window keeps a row no older than the
    stalest row inside the window minus one round.

    This is the freshness invariant the rotation exists to maintain: the
    window always absorbs the stalest evidence first, so anything left
    outside is at least as fresh as (window max staleness - 1).
    """
    rounds = load_verified_rounds(up_to=EVIDENCE_ROUND)
    if not rounds:  # fresh clone without evidence files
        return
    inside = [rounds.get(n, 0) for n in DRIVER_PRIORITY]
    outside = [rounds[n] for n in REGISTRY if n not in set(DRIVER_PRIORITY) and n in rounds]
    unverified_outside = [
        n for n in REGISTRY if n not in set(DRIVER_PRIORITY) and n not in rounds
    ]
    assert not unverified_outside, (
        f"never-driver-verified queries outside the window: {unverified_outside}"
    )
    if outside:
        assert min(outside) >= min(inside), (
            "a query outside the window is staler than the stalest inside"
        )


def test_correctness_evidence_exists():
    root = repo_root()
    assert os.path.exists(
        os.path.join(root, f"CORRECTNESS_r{EVIDENCE_ROUND:02d}.json")
    ), "EVIDENCE_ROUND points at an uncommitted evidence file"
    rounds = load_verified_rounds(up_to=EVIDENCE_ROUND)
    # every registered query except at most the trailing-new tier has a row
    covered = sum(1 for n in REGISTRY if n in rounds)
    assert covered >= 150
