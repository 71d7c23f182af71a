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
SKIP = {
    "streaming_daily_counts",
    "stateful_sessions",
    "incremental_dedup",
    # r12: the 'seqinc' arm runs two incremental tape appends (state
    # writes + eager checkpoints) when the plan is merely BUILT
    "pack_sequences",
}

# BroadcastNestedLoopJoin is legitimate ONLY with a bounded broadcast
# side: the interval dim (≤ handful of rows), ANN/KNN query sets, and
# the decontamination benchmark n-gram set.
BNLJ_ALLOWED = {
    "interval_rollup",  # ≤42-row interval dim, broadcast by design
    "knn_join",         # broadcast query set, != join for self-exclusion
    "retrieval_bm25",   # ONE-ROW corpus-stats aggregate broadcast-cross-
                        # joined in (lazy scalar attach; N and avg_len)
    "sketch_aggregates",  # hll_sliding_estimate densifies its day frame
                          # as distinct-groups × distinct-days (r9, r8
                          # ADVICE fix) — a cross join of two tiny
                          # driver-bounded sets over the STATE table,
                          # independent of corpus size
    "stat_aggregates",    # expectations' set-level checks attach the
                          # ONE-ROW n_rows aggregate to the one-row
                          # violation count via a broadcast cross join
                          # (r9 'dq:' arms) — 1×1, size-independent
    "ann_topk",           # the 'semdecon' arm's "pairs" method IS a
                          # broadcast nested loop BY CONTRACT (corpus ×
                          # md5-split 15-row eval set, the SQL-replayable
                          # oracle form; decontaminate.py docstring) —
                          # the at-scale path is the GEMM method, which
                          # the funnel and SCALING.md measurements use
}


@needs_testdata
def test_selective_filters_reach_the_scan(spark):
    """Selective predicates must appear in the parquet scan's
    PushedFilters — a filter evaluated post-scan reads the whole table
    at 100 TB."""
    from cod_stats_spark.plans.bench_queries import QUERIES

    expectations = {
        "filter_project": ["l_shipdate", "l_discount", "l_quantity"],
        "q1_pricing_summary": ["l_shipdate"],
        "scalar_functions": [],   # modulo filter is not pushable; scan must still prune columns
        "semi_join_customers": [],
    }
    for name, pushed_cols in expectations.items():
        plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        if pushed_cols:
            assert "PushedFilters: [" in plan, f"{name}: no pushdown section"
            section = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
            for col in pushed_cols:
                assert col in section, f"{name}: {col} not pushed ({section})"
        # column pruning: the scan's ReadSchema must not include every
        # lineitem column (16 cols) for these narrow projections
        if "ReadSchema" in plan:
            schema_part = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
            assert schema_part.count(":") < 12, f"{name}: scan reads too many columns"


@needs_testdata
def test_no_cartesian_or_unexpected_nested_loop(spark):
    from cod_stats_spark.plans.bench_queries import QUERIES

    # pack_sequences is in SKIP because its 'seqinc' arm EXECUTES at
    # plan build; its three lazily-planned arms still get audited here
    # via the split-out builder (r12 review: a whole-gate skip would
    # have dropped the cartesian/BNLJ audit for pack/chunk/seq too)
    from cod_stats_spark.plans.bench_queries import pack_gate_static_arms

    audited = dict(QUERIES)
    audited["pack_sequences[static-arms]"] = pack_gate_static_arms

    offenders: list[str] = []
    for name, fn in audited.items():
        if name in SKIP:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            offenders.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    assert not offenders, offenders


# Bench-only bodies whose CALL has side effects outside a throwaway
# dir (retrieval_bm25_serve materializes its index under the repo's
# .bench_idx cache) — their plans are covered by their own tests.
BENCH_SKIP = {"retrieval_bm25_serve"}


@needs_testdata
def test_bench_only_bodies_no_cartesian_or_unexpected_nested_loop(spark):
    """The TIMED plans get the same scale guard as the registry: the
    r7 bench/gate splits mean several plans exist only in BENCH_ONLY
    (in-memory retrieval, pure shard assignment, the prod dedup
    variants, the curation funnel) and must not regress into
    all-pairs joins either."""
    from cod_stats_spark.plans.bench_queries import BENCH_ONLY

    allowed = BNLJ_ALLOWED | {
        "knn_join_gemm",   # same bounded broadcast-query contract as knn_join
        "curate_corpus",   # contains the one-row corpus-stats cross joins
        "funnel_retention",  # one-row funnel checksum × one-row cohort
                             # checksum cross join (r9) — 1×1 scalar attach
    }
    offenders: list[str] = []
    for name, fn in BENCH_ONLY.items():
        if name in BENCH_SKIP:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in allowed:
            offenders.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    assert not offenders, offenders


@needs_testdata
def test_timed_bodies_survive_count_pruning(spark):
    """bench.py times fn(...).count(): Catalyst may legally ELIMINATE
    work whose output cardinality count() doesn't depend on — caught
    live in r8 when lm_score's unique-keyed left scoring join pruned
    to a bare scan and the entry timed nothing. Pure projections are a
    known, documented scan+count floor (BENCH_NOTES.md); but any timed
    body whose headline cost is a JOIN or explode must keep it in the
    COUNT plan. This pins the ones with that contract."""
    from cod_stats_spark.plans.bench_queries import BENCH_ONLY, QUERIES

    must_keep = {
        # name -> fragments that must appear in the optimized count() plan
        "lm_score_v2": ["Join", "Generate"],     # scoring join + explode
        "dedup_substring": ["Join", "Generate"],  # site markback join +
                                                  # posexplode gram sites
        "funnel_retention": ["Join"],             # funnel level joins +
                                                  # cohort first-touch join
        "knn_join": ["Join"],
        "knn_join_gemm": ["MapInPandas"],        # its "join" IS the GEMM stage
        "quality_classifier": ["Join", "Generate"],  # weight join + feature
                                                     # explode in the scoring
                                                     # pass (r10)
        "training_sequences": ["Generate", "Aggregate"],  # slice-row explode
                                                          # + window assembly
                                                          # (r11)
        "html_extract": ["Aggregate", "Filter"],  # checksum agg + guard —
                                                  # without them count()
                                                  # prunes the regex chain
                                                  # to a bare scan (r12)
    }
    queries = {**QUERIES, **BENCH_ONLY}
    offenders: list[str] = []
    for name, frags in must_keep.items():
        plan = (
            queries[name](spark, SF)
            .groupBy()
            .count()
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        for frag in frags:
            if frag not in plan:
                offenders.append(f"{name}: {frag} pruned out of the count() plan")
    assert not offenders, offenders
