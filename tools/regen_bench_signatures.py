"""Regenerate the bench plan-signature snapshot.

Each HEADLINE bench entry gets a sha256 over its CANONICALIZED
analyzed logical plan at sf0.001 (expression ids, paths, and cache
references stripped). `tests/test_bench_signatures.py` compares the
live signatures against the snapshot: if a gate's timed plan changes,
the test fails until the bench entry is renamed (scope change — see
BENCH_NOTES.md) or this script is deliberately re-run (semantics-
preserving refactor; say which in the commit message).

Usage:  python tools/regen_bench_signatures.py
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "bench_plan_signatures.json",
)
SIG_SF_DIR = "/root/testdata/sf0.001"


def canonical_plan(df) -> str:
    """Analyzed logical plan with run-dependent tokens stripped.

    - `#123` expression ids change per session;
    - file paths embed the sf dir;
    - InMemoryRelation prints storage/RDD ids.
    Everything else (operators, expressions, literals) is the query's
    identity — exactly what must not change under a frozen bench name.
    """
    s = df._jdf.queryExecution().analyzed().toString()
    s = re.sub(r"#\d+", "#x", s)
    s = re.sub(r"file:[^\s,)\]]+", "file:x", s)
    s = re.sub(r"/[\w./-]*testdata[\w./-]*", "path:x", s)
    s = re.sub(r"StorageLevel\([^)]*\)", "StorageLevel(x)", s)
    s = re.sub(r"\[id=#?\w+\]", "[id=x]", s)
    # spread()'s repartition target is the session's core count — an
    # environment fact, not part of the query's identity
    s = re.sub(r"Repartition \d+", "Repartition n", s)
    # NamedLambdaVariable suffixes come from a session-global counter,
    # so a gate's HOF lambdas print differently depending on how many
    # lambdas earlier gate builds consumed
    s = re.sub(r"lambda ([A-Za-z]+)_\d+", r"lambda \1_n", s)
    return s


def signature(df) -> str:
    return hashlib.sha256(canonical_plan(df).encode()).hexdigest()[:16]


def compute_signatures(spark) -> dict[str, str]:
    """Signatures for every HEADLINE entry.

    Parallel across a small driver thread pool (r17): each entry's
    signature depends only on its OWN canonicalized analyzed plan —
    session-global counters (expression ids, lambda variable
    suffixes) are already normalized away, so build interleaving
    cannot move a signature — but building a plan is real driver
    work (expression trees, and for the model entries the build-time
    fit collects), which serially made this the single slowest test
    in the suite (143 s measured; Spark's scheduler runs concurrent
    driver actions fine — guide §2.6). The plan memo is cleared ONCE
    up front so every entry builds fresh; per-entry cache clearing
    (the bench's timing hygiene) is pointless here where nothing is
    timed."""
    from concurrent.futures import ThreadPoolExecutor

    from bench import HEADLINE
    from cod_stats_spark.plans.bench_queries import _PLAN_CACHE, BENCH_ONLY, QUERIES

    queries = {**QUERIES, **BENCH_ONLY}
    _PLAN_CACHE.clear()
    # pre-resolve every table reader serially: the lazy catalog's
    # first access does a parquet footer read + schema resolution,
    # and racing those from the pool has produced a transient
    # planner error — warm the catalog once, then fan out
    from cod_stats_spark.plans.bench_queries import load_tables

    load_tables(spark, SIG_SF_DIR).items()  # resolves every reader

    def one(name: str) -> tuple[str, str]:
        return name, signature(queries[name](spark, SIG_SF_DIR))

    with ThreadPoolExecutor(max_workers=8) as pool:
        sigs = dict(pool.map(one, HEADLINE))
    _PLAN_CACHE.clear()
    spark.catalog.clearCache()
    return sigs


def main() -> None:
    from cod_stats_spark.session import get_spark

    spark = get_spark("bench-signatures")
    sigs = compute_signatures(spark)
    with open(SNAPSHOT, "w") as f:
        json.dump(sigs, f, indent=1, sort_keys=True)
    print(f"wrote {len(sigs)} signatures to {SNAPSHOT}")


if __name__ == "__main__":
    main()
