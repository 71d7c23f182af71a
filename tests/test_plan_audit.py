"""Physical-plan audit across the whole query registry.

Builds (does not execute) every cacheable gate's plan at sf0.001 and
asserts the scale invariants the engine promises: no cartesian
products anywhere, and nested-loop joins only where a bounded
broadcast side makes them the intended strategy. This is the
regression gate for "someone's refactor silently turned a broadcast
equi-join into an all-pairs join" — the class of bug that passes
row-count tests at sf0.001 and dies at 100 TB.
"""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)

# Gates whose callables EXECUTE work at build time (streaming runs,
# temp-dir pipelines) — plan shape covered by their own tests.
SKIP = {"streaming_daily_counts", "stateful_sessions", "incremental_dedup"}

# BroadcastNestedLoopJoin is legitimate ONLY with a bounded broadcast
# side: the interval dim (≤ handful of rows), ANN/KNN query sets, and
# the decontamination benchmark n-gram set.
BNLJ_ALLOWED = {
    "interval_rollup",  # ≤42-row interval dim, broadcast by design
    "knn_join",         # broadcast query set, != join for self-exclusion
}


@needs_testdata
def test_no_cartesian_or_unexpected_nested_loop(spark):
    from cod_stats_spark.plans.bench_queries import QUERIES

    offenders: list[str] = []
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            offenders.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    assert not offenders, offenders
