"""Scale audit for the r9/r10 OLAP-family operators that live as gate
ARMS (not standalone bench entries), so scale_check.py can't time
them by name: OHLC downsample, LOCF time-weighted average (including
its documented sparse-key bucket explode, driven adversarially here),
SCD2 apply (large dimension, small batch), and a mixed expectations
suite — plus the r10 `quality_classifier` standalone check.

Method matches tools/scale_check.py: min of 2 timed runs per point
over sf0.1 → .scale_data/sf1eq → .scale_data/sf10eq (10×/10× byte
steps), slope fitted on the two largest points, caches cleared
between runs. Output: one JSON line per (case, sf) + a summary line —
paste-ready for SCALING.md.

Usage: python tools/audit_olap.py [case ...]
Cases: ohlc twa twa_sparse scd2_apply expectations
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [
    "/root/testdata/sf0.1",
    os.path.join(_REPO, ".scale_data", "sf1eq"),
    os.path.join(_REPO, ".scale_data", "sf10eq"),
]


def _ohlc(spark, t):
    from cod_stats_spark.operators.timeseries_agg import ohlc_downsample

    return ohlc_downsample(t["events"], "ts", ["user_id"], "value", 3600)


def _twa(spark, t):
    from cod_stats_spark.operators.timeseries_agg import time_weighted_avg

    return time_weighted_avg(t["events"], "ts", ["user_id"], "value", 3600)


def _twa_sparse(spark, t):
    """The documented adversary: sparse keys whose LOCF segments cross
    MANY buckets — 256 keys × 3 observations spanning 30 days at a
    60 s bucket = ~11 M exploded (segment, bucket) rows from a
    768-row input. Cost is OUTPUT-proportional by design; this case
    pins that the explode engages and completes, same input at every
    'sf' (the corpus isn't the variable — the explode factor is)."""
    import pyspark.sql.functions as F

    from cod_stats_spark.operators.timeseries_agg import time_weighted_avg

    days30 = 30 * 86400
    base = spark.range(256).select(
        F.col("id").alias("k"),
        F.explode(
            F.array(F.lit(0), F.lit(days30 // 2), F.lit(days30))
        ).alias("off"),
    )
    src = base.select(
        "k",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("off") + F.col("k")
        ).alias("ts"),
        (F.col("k") + F.col("off")).cast("double").alias("v"),
    )
    return time_weighted_avg(src, "ts", ["k"], "v", 60)


def _scd2_apply(spark, t):
    """Large dimension (built once per point from the orders change
    log: key=o_custkey, attr=o_orderstatus), then ONE small batch
    (~0.4% of keys, later-dated changes) folded in — the production
    posture: apply cost must track the AFFECTED keys + a pass over the
    dimension, not a rebuild of history."""
    import pyspark.sql.functions as F

    from cod_stats_spark.operators.scd import scd2_apply, scd2_build

    log = t["orders"].select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderstatus").alias("status"),
    )
    # unique-(key, ts) contract: keep one change per (key, day)
    log = log.groupBy("k", "ts").agg(F.min("status").alias("status"))
    dim = scd2_build(log, ["k"], "ts", ["status"]).localCheckpoint(
        eager=True
    )
    batch = (
        log.where(F.col("k") % 256 == 0)
        .groupBy("k")
        .agg(F.max("ts").alias("ts"))
        .select(
            "k",
            F.date_add(F.col("ts"), 40).alias("ts"),
            F.lit("Z").alias("status"),
        )
    )
    return scd2_apply(dim, batch, ["k"], "ts", ["status"])


def _expectations(spark, t):
    """Mixed suite over lineitem: 4 row-level checks (ONE wide
    aggregate), 2 uniques, 1 referential vs orders — per the r10
    single-count contract this scans lineitem ≤ 2 + 3 times total."""
    from cod_stats_spark.operators.expectations import check_expectations

    return check_expectations(
        t["lineitem"],
        [
            {"check": "not_null", "column": "l_quantity"},
            {"check": "range", "column": "l_quantity", "lo": 1, "hi": 50},
            {"check": "range", "column": "l_discount", "lo": 0.0, "hi": 0.1},
            {"check": "accepted_values", "column": "l_returnflag",
             "values": ["A", "N", "R"]},
            {"check": "unique", "columns": ["l_orderkey", "l_linenumber"]},
            {"check": "unique", "columns": ["l_orderkey", "l_partkey",
                                            "l_suppkey", "l_linenumber"]},
            {"check": "referential", "column": "l_orderkey",
             "ref": t["orders"], "ref_column": "o_orderkey"},
        ],
    )


def _semantic(spark, t):
    """SemDeDup with k scaled to the corpus (clusters bounded to ~128
    members — the paper's posture; k is the knob that keeps the
    within-cluster pairing n²/k linear-ish). Centroids are the
    md5-sample rule (no Lloyd iterations — the audit times assignment
    + rank + pairing + drop, not training)."""
    import pyspark.sql.functions as F

    from cod_stats_spark.operators.semantic import semantic_dedup

    emb = t["embeddings"]
    n = emb.count()
    k = max(8, n // 128)
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(
            F.md5(F.col("vec_id").cast("string").cast("binary")),
            F.col("vec_id"),
        )
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in sample]
    return semantic_dedup(emb, "embedding", "vec_id", cents, threshold=0.9)


CASES = {
    "ohlc": _ohlc,
    "twa": _twa,
    "twa_sparse": _twa_sparse,
    "scd2_apply": _scd2_apply,
    "expectations": _expectations,
    "semantic_dedup": _semantic,
}


def main() -> None:
    from cod_stats_spark.plans.bench_queries import load_tables
    from cod_stats_spark.session import get_spark

    names = sys.argv[1:] or list(CASES)
    spark = get_spark("cod-stats-olap-audit")
    sfs = [d for d in SFS if os.path.isdir(d)]
    sizes = [
        sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )
        for d in sfs
    ]
    for name in names:
        fn = CASES[name]
        fn(spark, load_tables(spark, "/root/testdata/sf0.001")).count()
        per_sf, rows = [], []
        for d in sfs:
            t = load_tables(spark, d)
            best = None
            n = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, t).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            per_sf.append(round(best, 3))
            rows.append(n)
        xs = [math.log(s) for s in sizes[-2:]]
        ys = [math.log(v) for v in per_sf[-2:]]
        slope = (
            (ys[-1] - ys[0]) / (xs[-1] - xs[0])
            if len(per_sf) >= 2 and xs[-1] != xs[0]
            else float("nan")
        )
        print(
            json.dumps(
                {
                    "case": name,
                    "sec_per_sf": per_sf,
                    "rows_per_sf": rows,
                    "slope": round(slope, 3),
                }
            )
        )
        print(f"# {name:14s} {per_sf} rows={rows} slope={slope:.2f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
