"""Empirical scaling check: run representative operators at every
available scale factor and report the log-log slope of runtime vs
data size.

A slope near 1.0 = linear scaling (what a scan-bound distributed plan
should show); well below 1 = fixed overhead dominates at these sizes;
well above 1 = superlinear work (a quadratic join, an unpartitioned
window) that will NOT survive a 100x scale-up — the thing this tool
exists to catch before a cluster does.

Usage: python tools/scale_check.py [query ...]   (default: the set below)
Prints one JSON line per query plus a summary table to stderr.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "q1_pricing_summary",      # scan + two-level hash agg
    "sessionize_events",       # window sessionization
    "latest_order_per_customer",  # per-key top-1 window
    "dedup_exact",             # hash groupBy
    "dedup_minhash_prod",      # shingle→minhash→band→bucket join
    "dedup_simhash_prod",      # zero-shuffle SWAR fold
    "repetition_metrics",      # tagged explode + keyed aggs
    "pack_sequences",          # distributed prefix scan
    "shard_assign",            # zero-shuffle projection
    "knn_join",                # broadcast queries + two-stage top-k
    "decontaminate",           # broadcast n-gram anti-join
    "asof_join_orders",        # union + window as-of
]


def main() -> None:
    from cod_stats_spark.plans.bench_queries import _PLAN_CACHE, BENCH_ONLY, QUERIES
    from cod_stats_spark.session import get_spark

    queries = {**QUERIES, **BENCH_ONLY}
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("cod-stats-scale-check")

    sfs = [d for d in SFS if os.path.isdir(d)]
    sizes = []
    for d in sfs:
        sizes.append(
            sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(d)
                for f in fs
            )
        )

    out = {}
    for name in names:
        fn = queries[name]
        fn(spark, sfs[0]).count()  # warm/JIT at the smallest SF
        per_sf = []
        for d in sfs:
            best = None
            for _ in range(2):
                _PLAN_CACHE.clear()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            per_sf.append(round(best, 3))
        # least-squares slope of log(time) vs log(bytes) over the two
        # LARGEST sizes (the smallest SF is all fixed overhead)
        xs = [math.log(s) for s in sizes[-2:]]
        ys = [math.log(t) for t in per_sf[-2:]]
        slope = (ys[-1] - ys[0]) / (xs[-1] - xs[0]) if xs[-1] != xs[0] else float("nan")
        out[name] = {"sec_per_sf": per_sf, "slope": round(slope, 3)}
        print(
            f"# {name:28s} {per_sf} slope={slope:.2f}",
            file=sys.stderr,
        )

    print(json.dumps({"sizes_bytes": sizes, "queries": out}))


if __name__ == "__main__":
    main()
