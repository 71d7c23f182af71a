"""Bench comparability guard (round-5 verdict, what's-wrong #1).

A bench entry's cross-round timings are only meaningful while it
times the SAME plan. This test snapshots a canonicalized logical-plan
signature per HEADLINE entry; a signature drift means the timed work
changed, and the entry must be RENAMED (`_v2`, `_v3`, …, recorded in
BENCH_NOTES.md) — or, for a semantics-preserving refactor, the
snapshot regenerated via `python tools/regen_bench_signatures.py`
with the reason in the commit message.
"""

from __future__ import annotations

import json
import os

SNAPSHOT = os.path.join(
    os.path.dirname(__file__), "goldens", "bench_plan_signatures.json"
)


def test_headline_plans_match_snapshot(spark):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.regen_bench_signatures import compute_signatures

    with open(SNAPSHOT) as f:
        frozen = json.load(f)
    live = compute_signatures(spark)
    drifted = sorted(
        n for n in live if n in frozen and live[n] != frozen[n]
    )
    new = sorted(n for n in live if n not in frozen)
    assert not drifted, (
        f"bench entries changed their timed plan: {drifted} — rename them "
        "(BENCH_NOTES.md) or regen tools/regen_bench_signatures.py"
    )
    assert not new, (
        f"bench entries missing from the signature snapshot: {new} — run "
        "python tools/regen_bench_signatures.py"
    )
