"""Probe-flatness audit for the bucketed incremental lexical dedup
index (streaming/dedup.py, r11).

Drives N fixed-size ingest micro-batches through
dedup_batch_against_corpus against one growing index and reports, per
batch:

- wall time of the full incremental step (probe + verify + append);
- the probe's STRUCTURAL scope: how many pb= partitions the batch's
  fingerprint bucket set touches, and how many index rows live inside
  them vs the whole index — the fraction the pruned scan actually
  reads (the PartitionFilters assertion in
  tests/test_incremental_dedup_layout.py proves the plan prunes;
  this tool measures how much).

The claim under test (VERDICT r10, next-round task 1): per-batch
probe cost must NOT grow like O(index). With the bucketed layout the
probe reads ~|batch bucket set|/n_buckets of the index — for a fixed
batch size that fraction is CONSTANT as the index grows, so per-batch
cost stays flat up to the (index_size/n_buckets) per-partition term,
which the bucket-count knob divides down (size n_buckets ≳
corpus_rows/batch_rows at deployment scale).

Usage:
  python tools/probe_flatness.py [n_batches] [batch_size] [fp_buckets] [band_buckets] [compact_every]
Defaults: 20 batches x 500 docs, 1024/1024 buckets, compaction every
8 batches (0 = never) — compaction bounds the per-partition FILE
count, the other axis probe cost grows along (one small file per
batch per touched partition).
Prints one JSON line per batch and a summary line.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu shuffle partition bucket "
    "broadcast watermark lineage parquet columnar codegen adaptive"
).split()


def _text(batch: int, i: int) -> str:
    rng = random.Random(batch * 1_000_003 + i)
    return " ".join(rng.choice(WORDS) for _ in range(60))


def _batch_rows(batch: int, size: int, dup_frac: float = 0.2):
    rows = []
    for i in range(size):
        doc_id = batch * size + i
        # a slice of every later batch exactly duplicates batch 0 —
        # the probe must keep finding them however big the index is
        if batch > 0 and i < int(size * dup_frac):
            rows.append((doc_id, _text(0, i)))
        else:
            rows.append((doc_id, _text(batch, i)))
    return rows


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    fp_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    band_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    compact_every = int(sys.argv[5]) if len(sys.argv) > 5 else 8

    from pyspark.sql import functions as F

    from cod_stats_spark.session import get_spark
    from cod_stats_spark.streaming.dedup import (
        FP_SCHEMA,
        _fp_bucket,
        dedup_batch_against_corpus,
    )

    spark = get_spark("probe_flatness")
    tmp = tempfile.mkdtemp(prefix="probeflat_")
    corpus = os.path.join(tmp, "corpus")
    index = os.path.join(tmp, "index")
    fp_path = os.path.join(index, "fingerprints")
    results = []
    for b in range(n_batches):
        docs = spark.createDataFrame(
            _batch_rows(b, batch_size), "doc_id long, text string"
        )
        scope = None
        if b > 0:
            # the NEXT probe's structural scope, measured against the
            # index as it stands before this batch runs
            from cod_stats_spark.functions.text import fingerprint

            pbs = [
                r[0]
                for r in docs.select(
                    _fp_bucket(fingerprint(F.col("text")), fp_buckets).alias(
                        "pb"
                    )
                )
                .distinct()
                .collect()
            ]
            idx = spark.read.schema(FP_SCHEMA + ", pb int").parquet(fp_path)
            scope = {
                "touched_buckets": len(pbs),
                "rows_in_scope": idx.where(F.col("pb").isin(pbs)).count(),
                "index_rows": idx.count(),
            }
        t0 = time.monotonic()
        kept = dedup_batch_against_corpus(
            spark, docs, "text", "doc_id", corpus, index,
            threshold=0.6, batch_id=b,
            fp_buckets=fp_buckets, band_buckets=band_buckets,
        )
        n_kept = kept.count()
        dt = time.monotonic() - t0
        rec = {
            "batch": b,
            "sec": round(dt, 3),
            "kept": n_kept,
            **({"scope": scope} if scope else {}),
        }
        if compact_every and (b + 1) % compact_every == 0:
            from cod_stats_spark.streaming.compaction import (
                compact_dedup_index,
            )

            t0 = time.monotonic()
            cc = compact_dedup_index(spark, index)
            rec["compact_sec"] = round(time.monotonic() - t0, 3)
            rec["compact"] = {
                k: f"{v['files_before']}->{v['files_after']}"
                for k, v in cc.items()
            }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    timed = [r["sec"] for r in results[1:]]  # batch 0 builds the tree
    head = sum(timed[:3]) / max(len(timed[:3]), 1)
    tail = sum(timed[-3:]) / max(len(timed[-3:]), 1)
    fracs = [
        r["scope"]["rows_in_scope"] / max(r["scope"]["index_rows"], 1)
        for r in results
        if r.get("scope")
    ]
    print(
        json.dumps(
            {
                "summary": True,
                "n_batches": n_batches,
                "batch_size": batch_size,
                "fp_buckets": fp_buckets,
                "band_buckets": band_buckets,
                "first3_avg_sec": round(head, 3),
                "last3_avg_sec": round(tail, 3),
                "tail_over_head": round(tail / head, 3) if head else None,
                "scope_frac_first": round(fracs[0], 4) if fracs else None,
                "scope_frac_last": round(fracs[-1], 4) if fracs else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
