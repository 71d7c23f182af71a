"""Marginal-cost measurement for BM25 serving (r7 verdict task 4).

The `retrieval_bm25_serve` bench entry records ~0.7 s for a 2-query
battery against the on-disk DTF index — BENCH_NOTES.md decomposes that
into a fixed job constant (plan construction + AQE stage scheduling +
one pruned-postings scan job) with millisecond data work. This script
settles whether the constant AMORTIZES: serve 1 battery vs N batteries
of DISTINCT vocabulary (more probe buckets, more postings — the honest
direction) in ONE action each, and report the marginal per-battery
cost.

    python tools/bm25_amortize.py [sf_dir] [n_batteries]

Prints one JSON line:
    {"t_1": ..., "t_n": ..., "n": 8, "marginal_per_battery": ...,
     "queries_per_battery": 2, "terms": ...}

Expectation (recorded in BENCH_NOTES.md): marginal ≪ 0.1 s/battery —
i.e. the 0.7 s entry is a per-ACTION constant, not a per-QUERY cost,
and a real serving deployment batches query traffic into actions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_BATTERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> None:
    from pyspark.sql import functions as F

    from cod_stats_spark.operators.retrieval import (
        bm25_serve_multi,
        write_dtf_index,
    )
    from cod_stats_spark.session import get_spark
    from cod_stats_spark.tables import load_tables

    spark = get_spark("bm25-amortize")
    import tempfile

    idx = os.path.join(tempfile.mkdtemp(prefix="bm25_amortize_"), "idx")
    docs = load_tables(spark, SF_DIR)["documents"]
    write_dtf_index(docs, idx)

    # N batteries of 2 queries × 3 terms each, strided deterministically
    # through the index vocabulary (the synthetic corpus has a ~31-term
    # vocab, so batteries overlap — but each battery is a DISTINCT term
    # set, so every added battery widens the probed buckets/postings
    # until the vocabulary is covered, then adds per-tag join + window
    # work: both marginal directions a real mixed workload has)
    terms = [
        r["term"]
        for r in spark.read.parquet(os.path.join(idx, "terms"))
        .orderBy(F.col("df").desc(), F.col("term"))
        .collect()
    ]
    v = len(terms)
    if v < 6:
        raise SystemExit(f"vocabulary too small: {v} terms")

    def battery(i: int) -> dict[str, list[str]]:
        pick = [terms[(i * 5 + j) % v] for j in range(6)]
        return {f"q{i}a": pick[:3], f"q{i}b": pick[3:]}

    def serve(n: int) -> float:
        qs: dict[str, list[str]] = {}
        for i in range(n):
            qs.update(battery(i))
        best = float("inf")
        for _ in range(3):  # min-of-3: measure the floor, not the JIT
            t0 = time.perf_counter()
            bm25_serve_multi(spark, idx, qs, k=20).count()
            best = min(best, time.perf_counter() - t0)
        return best

    serve(1)  # warm the serve plan shape once (JIT + codegen cache)
    t1 = serve(1)
    tn = serve(N_BATTERIES)
    out = {
        "sf_dir": SF_DIR,
        "n": N_BATTERIES,
        "queries_per_battery": 2,
        "terms": len(terms),
        "t_1": round(t1, 3),
        "t_n": round(tn, 3),
        "marginal_per_battery": round((tn - t1) / (N_BATTERIES - 1), 4),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
