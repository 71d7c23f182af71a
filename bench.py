"""Benchmark harness: runs the headline query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() action — full plan runs,
result stays distributed; no driver collect for the big outputs).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every operator family, weighted toward the shapes that
# dominate at scale (scan+agg, windows, joins, dedup, ANN).
HEADLINE = [
    "q1_pricing_summary",
    "filter_project",
    "conditional_norm",
    "top10_customers",
    "latest_order_per_customer",
    "star_join_revenue",
    "interval_rollup",
    "order_roster",
    "pivot_priority",
    "daily_distinct",
    "sessionize_events",
    "session_window_batch",
    "streak_runs",
    "rolling_orders",  # includes the cumulative frames (merged gate)
    "explode_words",
    "dedup_exact",
    # production-hash dedup variants (xxhash64): the hot path users
    # run — the md5-instrumented oracle variants stay in queries() as
    # correctness gates but are not what the perf envelope tracks
    # (round-2 verdict, task 1)
    "dedup_minhash_prod_v2",
    "dedup_simhash_prod_v2",
    "dedup_pipeline_v2",
    # round-8 addition: winnowing containment detector (new entry,
    # new scope — rolling-hash fingerprints + capped bucket pairing;
    # BENCH_NOTES.md "New entries (round 8)")
    "dedup_winnow",
    # round-9 addition: ExactSubstr span dedup (new entry, new scope —
    # positional-gram census + island merge + cleaned-text rebuild;
    # BENCH_NOTES.md "New entries (round 9)")
    "dedup_substring",
    # round-14 addition: duplicate-LINE removal (RefinedWeb/Dolma
    # boilerplate pass — line-hash keep-first + in-order reassembly;
    # new entry, new scope; BENCH_NOTES.md "New entries (round 14)")
    "line_dedup",
    "decontaminate",
    # round-7 addition: the doc-level cleaning path (new entry, new
    # scope — linear gram-set match; the `decontaminate` entry keeps
    # timing the pairwise reporting join for cross-round comparability)
    "decontaminate_clean",
    "sketches_only",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "lang_id",
    "quality_tokens",
    # round-8 addition: unigram-LM corpus-likelihood scoring (new
    # entry, new scope — model fit + broadcast score join; the
    # quality_tokens timed body stays the frozen one-projection plan
    # via its BENCH_ONLY override; BENCH_NOTES.md "New entries").
    # _v2 (round 9): the r8 body ran the model fit twice (totals
    # action + unpersisted scoring join); fixed to a single fit, so
    # the timed plan changed and the entry is renamed (BENCH_NOTES.md)
    "lm_score_v2",
    # round-13 addition: Kneser-Ney trigram scoring, whole job
    # (subsample uni/bi/tri fits -> five-relation broadcast forward
    # pass over the full corpus, checksum tail; new entry, new scope;
    # BENCH_NOTES.md "New entries (round 13)").
    # _v2 (round 14): the middle layer's lambda numerator changed from
    # bigram fanout to continuation support (r13 advice fidelity fix),
    # so the timed plan changed and the entry is renamed (the
    # lm_score_v2 precedent; BENCH_NOTES.md)
    "kn_lm_score_v2",
    # round-15 addition: imported order-5 ARPA backoff scoring, whole
    # job (pos explode -> 13 slim broadcast model joins -> id-shuffle
    # aggregate; the published KenLM/CCNet artifact posture; new
    # entry, new scope; BENCH_NOTES.md "New entries (round 15)")
    "arpa_lm_score",
    # round-16 addition: order-5 Kneser-Ney FIT + score, whole job
    # (subsample ngram fits 1..5 -> nine-relation broadcast forward
    # pass; the CCNet 5-gram posture fit natively; new entry, new
    # scope; BENCH_NOTES.md "New entries (round 16)")
    "kn5_score",
    # round-16 addition: media perceptual-hash near-dup, whole job
    # (PGM synthesis -> Arrow-batched decode+aHash/dHash ->
    # Hamming-LSH pair verification; new entry, new scope;
    # BENCH_NOTES.md "New entries (round 16)")
    "media_phash",
    # round-8 addition: trained-BPE tokenization, whole job (word
    # counts -> driver merge training -> memoized mapInPandas encode;
    # new entry, new scope; BENCH_NOTES.md "New entries")
    "bpe_encode",
    # round-13 addition: byte-level BPE (GPT-2/tiktoken posture),
    # whole job (pretoken counts -> driver merge training at eow=None
    # -> memoized mapInPandas encode; new entry, new scope;
    # BENCH_NOTES.md "New entries (round 13)")
    "byte_bpe_encode",
    # round-11 addition: trained unigram-LM (SentencePiece-style)
    # tokenization, whole job (word counts -> driver EM + pruning ->
    # memoized Viterbi mapInPandas encode; new entry, new scope;
    # BENCH_NOTES.md "New entries (round 11)")
    "unigram_encode",
    # round-13 addition: trained-WordPiece tokenization, whole job
    # (word counts -> driver likelihood-gain merge training -> memoized
    # greedy longest-match mapInPandas encode; new entry, new scope;
    # BENCH_NOTES.md "New entries (round 13)")
    "wordpiece_encode",
    # round-10 addition: trained hashed-bigram logistic quality
    # classifier, whole job (label synthesis -> 5 distributed-gradient
    # GD iterations -> relation-path scoring; new entry, new scope;
    # BENCH_NOTES.md "New entries (round 10)")
    "quality_classifier",
    # round-13 addition: DSIR importance resampling, whole job (target
    # + raw hashed-bigram distribution fits -> relation-path scoring ->
    # Gumbel top-k selection; new entry, new scope; BENCH_NOTES.md
    # "New entries (round 13)")
    "dsir_select",
    "multimodal_decode",
    "asof_join_orders",
    # round-9 addition: funnel + cohort retention over the event
    # stream (new entry, new scope; BENCH_NOTES.md "New entries
    # (round 9)")
    "funnel_retention",
    "quantiles",
    # _v2 names: the gate bodies were WIDENED in round 5 (rollup_cube
    # 1→3 grouping shapes, ranking_windows +4 window functions), so the
    # timed entries are renamed to keep cross-round per-query deltas
    # scope-clean — see BENCH_NOTES.md for the old→new mapping and
    # tests/test_bench_signatures.py for the guard
    "rollup_cube_v2",
    "ranking_windows_v2",
    # round-6 addition: BM25 + RRF retrieval (new entry, new scope).
    # That entry deliberately times cold index construction + query;
    # round 7 adds the query-only serve path against the persisted DTF
    # index (index built outside the kept timing — BENCH_NOTES.md)
    "retrieval_bm25",
    "retrieval_bm25_serve",
    # round-3 training-pipeline additions
    "pii_redact",
    "repetition_metrics",
    # round-12 addition: HTML→text extraction + C4 line cleaning over
    # synthetic pages wrapping every document, checksum-agg tail (new
    # entry, new scope; BENCH_NOTES.md "New entries (round 12)")
    "html_extract",
    "pack_sequences",
    # round-11 addition: concatenate-then-split training-window
    # assembly over the md5 tape, whole job incl. the window-content
    # checksum (new entry, new scope; BENCH_NOTES.md "New entries
    # (round 11)")
    "training_sequences",
    "shard_assign",
    "knn_join",
    # round-6 addition: BLAS-scored batch KNN (new entry, new scope —
    # the scale-audit answer to knn_join's |Q|x|C| interpreted scoring)
    "knn_join_gemm",
    # round-11 addition: SemDeDup embedding near-dup removal, whole
    # job (new entry, new scope — deterministic centroid sample,
    # zero-shuffle assignment, within-cluster pairing + worse-side
    # drop; same parameterization as the tools/audit_olap.py rows so
    # sf10eq cross-checks; BENCH_NOTES.md "New entries (round 11)")
    "semantic_dedup",
    # round-7 addition: the capstone curation funnel end to end
    # (quality -> dedup -> decontaminate -> pack -> shard WRITE +
    # manifest read-back) — the whole-job number cross-round funnels
    # are tracked by (BENCH_NOTES.md)
    "curate_corpus",
]


def main() -> None:
    from cod_stats_spark.plans.bench_queries import _PLAN_CACHE, BENCH_ONLY, QUERIES
    from cod_stats_spark.session import get_spark

    queries = {**QUERIES, **BENCH_ONLY}
    spark = get_spark("cod-stats-bench")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0

    # Warm the JVM once (not timed): JIT + whole-stage-codegen cache for
    # the heavy plan shapes, exercised at the smallest SF so warmup cost
    # is compile-bound, not data-bound.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for wq in (
        "q1_pricing_summary",
        "dedup_minhash_prod_v2",
        "dedup_simhash_prod_v2",
        "dedup_pipeline_v2",
        "decontaminate",
        "multimodal_decode",
        "repetition_metrics",
        "knn_join",
        "curate_corpus",
    ):
        try:
            queries[wq](spark, warm_dir).count()
        except Exception as exc:  # warmup failure must not kill the suite
            print(f"# warmup {wq} failed: {exc}", file=sys.stderr)

    # two timed runs per query, keep the min: steady-state throughput,
    # robust to one-off JIT/GC/io hiccups (both runs execute fully).
    # Per-query fault isolation: one red query records an error string
    # and the suite keeps going — the summary JSON line ALWAYS prints
    # (round-4 lesson: a single crash must not lose the whole signal).
    # Drift forensics (round-9 verdict, what's-wrong #4): frozen-plan
    # entries have regressed in driver-recorded rounds purely from
    # external box load. Record the 1-min loadavg at each query's start
    # and BOTH raw run times, so a cross-round delta on an unchanged
    # plan can be auto-classified: high loadavg or a big run-to-run
    # spread (max/min) = load noise, tight agreeing runs = regression.
    per_query: dict[str, object] = {}
    raw_runs: dict[str, list[float]] = {}
    load_at: dict[str, float] = {}
    load_start = round(os.getloadavg()[0], 2)
    t_total = 0.0
    n_err = 0
    for name in HEADLINE:
        best = None
        err = None
        load_at[name] = round(os.getloadavg()[0], 2)
        raw_runs[name] = []
        for _ in range(2):
            # fresh plan per timed run: a cached DataFrame re-executes
            # against the previous run's shuffle map outputs (same RDD
            # lineage), which would time a partially-cached execution —
            # not comparable to the r1 baseline
            _PLAN_CACHE.clear()
            t0 = time.perf_counter()
            try:
                queries[name](spark, SF_DIR).count()
            except Exception as exc:
                err = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
                break
            dt = time.perf_counter() - t0
            raw_runs[name].append(round(dt, 3))
            best = dt if best is None else min(best, dt)
            # drop persisted blocks the query materialized (the dedup
            # pipeline caches candidates/keepers): the second run must
            # redo the full work, and later queries must not be timed
            # under another query's block-manager/GC pressure
            spark.catalog.clearCache()
        if err is not None:
            per_query[name] = {"err": err}
            n_err += 1
            print(f"# {name}: ERROR {err}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        best = round(best, 3)
        per_query[name] = best
        t_total += best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    # a run with errors skips the errored queries' time, so its summed
    # seconds would look FASTER than a clean run — report null instead
    # (per-query numbers remain; runs with different error sets are
    # not comparable on the headline metric).
    #
    # Field ORDER is deliberate (r13 verdict, what's-wrong #2): the
    # recorder keeps only a bounded TAIL of stdout, so three rounds
    # running the headline scalars at the FRONT of the line were
    # truncated away and had to be reconstructed forensically. The big
    # per-entry dicts now come first and the compact scalars (metric /
    # value / errors / sf / loadavgs) last — whatever tail survives
    # carries the headline. The WHOLE payload is also written to
    # BENCH_LOCAL.json next to this script (committed per round), so
    # the full per-entry record never depends on the capture at all.
    # r17 (r16 verdict, what's-wrong #4): the recorder keeps only a
    # bounded ~2000-char TAIL of stdout, and the r15 line — queries +
    # runs + loadavg ≈ 5 KB — was cut mid-dict, losing the whole
    # round-over-round comparison. The PRINTED line now carries
    # exactly the contract fields (queries + the compact scalars,
    # ≈1.8 KB — it survives the tail whole); the drift-forensics
    # diagnostics (raw run pairs, per-entry loadavg — BENCH_NOTES.md
    # "Classifying cross-round deltas") move to BENCH_LOCAL.json,
    # which is committed every round and carries the full payload.
    # Timed region, methodology and every existing `queries` key are
    # unchanged.
    payload = {
        "queries": per_query,
        "metric": "headline_suite_wall_seconds",
        "value": round(t_total, 3) if n_err == 0 else None,
        "unit": "sec",
        "errors": n_err,
        "sf": sf,
        "loadavg_start": load_start,
        "loadavg_end": round(os.getloadavg()[0], 2),
    }
    full = {**payload, "runs": raw_runs, "loadavg": load_at}
    try:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json")
        with open(out, "w") as fh:
            fh.write(json.dumps(full) + "\n")
    except OSError as exc:  # the printed line remains the contract
        print(f"# BENCH_LOCAL.json write failed: {exc}", file=sys.stderr)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
