"""Per-stage shuffle/spill audit for the shuffle-bound families.

scale_check.py fits wall-time slopes; this tool answers the question
the slopes can't: at the multi-GB point, HOW MUCH data crosses each
shuffle, does anything spill, and which stage dominates? Those are the
properties the 100 TB design claims lean on (bounded shuffle per
operator, no accidental row explosion, memory-fitting partitions).

Method: each query runs to completion inside its own Spark job group;
afterwards the tool reads the monitoring REST API (the same JSON the
Spark UI serves — a public, stable interface) and attributes every
completed stage to its query via job-group -> job -> stageIds, then
sums shuffle read/write bytes, memory/disk spill, and input bytes.

Usage:
    python tools/gen_scale_data.py            # once, builds sf1eq+sf10eq
    python tools/shuffle_audit.py [sf_dir ...] [--queries a,b,c]

Default sf_dirs: sf0.1, .scale_data/sf1eq, .scale_data/sf10eq.
Prints one JSON line per (query, sf) plus a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UI_PORT = 4057

DEFAULT_SFS = [
    "/root/testdata/sf0.1",
    os.path.join(_REPO, ".scale_data", "sf1eq"),
    os.path.join(_REPO, ".scale_data", "sf10eq"),
]

# The families whose scale story is a SHUFFLE story (explodes, wide
# aggs, banded joins, prefix scans) — the ones the slope audit alone
# can't certify.
DEFAULT_QUERIES = [
    "sessionize_events",    # one hash exchange + per-key window sort
    "dedup_exact",          # fingerprint shuffle
    "dedup_minhash_prod_v2",   # shingle explode -> minhash -> band join
    "dedup_simhash_prod_v2",  # zero-shuffle fold + combo-table bucket join
    "dedup_pipeline_v2",       # full near-dup composite
    "decontaminate",        # PAIRWISE reporting join (capped below)
    "decontaminate_clean",  # doc-level gram-set cleaning path
    "dedup_winnow",         # char-gram fingerprint explode + fp-bucket pairing (r8)
    "dedup_substring",      # positional-gram census + island merge + rebuild (r9)
    "funnel_retention",     # funnel joins + cohort triangle (r9)
    "retrieval_bm25",       # DTF build (explode+shuffle) + 2 queries
    "pack_sequences",       # distributed prefix scan (256 buckets)
    "curate_corpus",        # capstone funnel incl. shard write
    "quality_classifier",   # hashed-feature GD iterations + score join (r10)
    "q1_pricing_summary",   # control: scan + two-level hash agg
]

# the pairwise reporting join's intermediate is Σ_g cnt_c(g)·cnt_b(g):
# with the gate's corpus-scaled benchmark it measured superlinear and
# OOM'd an 8 GB heap at sf10eq (r7 audit — the finding that produced
# decontaminate_clean). Audit it up to sf1eq only.
SKIP = {("decontaminate", "sf10eq")}


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def main() -> None:
    from cod_stats_spark.plans.bench_queries import _PLAN_CACHE, BENCH_ONLY, QUERIES
    from cod_stats_spark.session import prep_session
    from pyspark.sql import SparkSession

    qarg = None
    sf_dirs = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--queries":
            qarg = args[i + 1].split(",")
            i += 2
        else:
            sf_dirs.append(args[i])
            i += 1
    sf_dirs = [d for d in (sf_dirs or DEFAULT_SFS) if os.path.isdir(d)]
    names = qarg or DEFAULT_QUERIES

    # Fresh session with the monitoring UI/REST endpoint on; every
    # other conf matches get_spark() so timings stay comparable.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = SparkSession.builder.appName("cod-stats-shuffle-audit")
    builder = (
        builder.config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "5000")
        .config("spark.ui.retainedJobs", "5000")
    )
    spark = prep_session(_build(builder))
    sc = spark.sparkContext

    queries = {**QUERIES, **BENCH_ONLY}

    # warm JIT/codegen at the smallest driver SF (untimed, own group)
    sc.setJobGroup("warmup", "warmup")
    for name in names:
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    sc.setLocalProperty("spark.jobGroup.id", None)

    emitted: set[str] = set()
    for d in sf_dirs:
        sf_name = os.path.basename(d.rstrip("/"))
        runs = []  # (group, query, seconds)
        for name in names:
            if (name, sf_name) in SKIP:
                print(f"# {name}@{sf_name}: SKIP (see SKIP note)", file=sys.stderr)
                continue
            group = f"{name}@{sf_name}"
            _PLAN_CACHE.clear()
            spark.catalog.clearCache()
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            try:
                queries[name](spark, d).count()
                dt = round(time.perf_counter() - t0, 3)
            except Exception as exc:
                print(f"# {group}: ERROR {exc}", file=sys.stderr)
                dt = None
            sc.setLocalProperty("spark.jobGroup.id", None)
            runs.append((group, name, dt))
            if dt is not None:
                print(f"# {group}: {dt:.3f}s", file=sys.stderr)
        spark.catalog.clearCache()
        # flush this tier's metrics NOW: a later tier OOM-ing the JVM
        # must not lose what already ran (r7 lesson)
        try:
            _emit_tier(runs, sf_name, emitted)
        except Exception as exc:
            print(f"# metrics fetch failed for {sf_name}: {exc}", file=sys.stderr)


def _emit_tier(runs, sf_name: str, emitted: set) -> None:
    """Read the monitoring REST API and print one JSON line per query
    of this tier (stages attributed job-group -> job -> stageIds)."""
    apps = _rest("applications")
    app_id = apps[0]["id"]
    jobs = _rest(f"applications/{app_id}/jobs?status=succeeded")
    stages = _rest(f"applications/{app_id}/stages?status=complete")
    by_stage = {}
    for st in stages:
        key = (st["stageId"], st["attemptId"])
        by_stage[key] = st

    group_stageids: dict[str, set[int]] = {}
    for jb in jobs:
        grp = jb.get("jobGroup")
        if grp:
            group_stageids.setdefault(grp, set()).update(jb["stageIds"])

    mb = 1024 * 1024
    for group, name, dt in runs:
        if group in emitted:
            continue
        emitted.add(group)
        sids = group_stageids.get(group, set())
        sts = [st for (sid, _), st in by_stage.items() if sid in sids]
        agg = {
            "shuffle_write_mb": sum(s["shuffleWriteBytes"] for s in sts) / mb,
            "shuffle_read_mb": sum(s["shuffleReadBytes"] for s in sts) / mb,
            "input_mb": sum(s["inputBytes"] for s in sts) / mb,
            "output_mb": sum(s["outputBytes"] for s in sts) / mb,
            "mem_spill_mb": sum(s["memoryBytesSpilled"] for s in sts) / mb,
            "disk_spill_mb": sum(s["diskBytesSpilled"] for s in sts) / mb,
            "tasks": sum(s["numTasks"] for s in sts),
            "stages": len(sts),
        }
        top = sorted(sts, key=lambda s: -(s["shuffleWriteBytes"] + s["shuffleReadBytes"]))[:3]
        rec = {
            "query": name,
            "sf": sf_name,
            "sec": dt,
            **{k: round(v, 1) if isinstance(v, float) else v for k, v in agg.items()},
            "top_stages": [
                {
                    "name": s["name"].split("\n")[0][:60],
                    "write_mb": round(s["shuffleWriteBytes"] / mb, 1),
                    "read_mb": round(s["shuffleReadBytes"] / mb, 1),
                    "tasks": s["numTasks"],
                }
                for s in top
            ],
        }
        print(json.dumps(rec), flush=True)


def _build(builder):
    """Apply get_spark()'s conf set onto a UI-enabled builder."""
    n = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or (os.cpu_count() or 8)
    spark = (
        builder.master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # same G1 region tuning as session.get_spark (humongous-
        # allocation churn — see the comment there / SCALING.md r8)
        .config("spark.driver.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        .config("spark.sql.parquet.filterPushdown", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


if __name__ == "__main__":
    main()
