"""Per-cycle cost audit for the incremental shard compactor
(plans/curation.compact_curated_shards, r12).

Drives N fixed-size fragment batches into ``shards_frag/batch=<id>``
and compacts after every batch, reporting per cycle:

- wall time of the compaction call;
- fragment files READ this cycle (the unconsumed set) vs fragment
  files retained on disk (what the pre-r12 full rebuild re-read every
  cycle);
- shard dirs WRITTEN this cycle vs total shard dirs in the tree (the
  full rebuild rewrote all of them every cycle).

The claim under test (VERDICT r11, next-round task 1): per-cycle
compaction cost must track NEW fragments, not corpus lifetime. With
the ``_APPLIED`` marker protocol each cycle reads exactly one batch's
fragments and rewrites exactly that batch's shard dirs, so wall time
and I/O stay flat while the corpus (and the pre-r12 rebuild cost)
grows linearly. Pass ``--full-rebuild`` to measure the old shape on
the same data for the comparison row.

Usage:
  python tools/compact_audit.py [n_batches] [docs_per_batch] [--full-rebuild]
Defaults: 12 batches x 400 docs. Prints one JSON line per cycle and a
summary line.
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
    return " ".join(rng.choice(WORDS) for _ in range(80))


def _parquet_files(root: str) -> list[str]:
    out = []
    for r, _d, names in os.walk(root):
        out.extend(os.path.join(r, n) for n in names if n.endswith(".parquet"))
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full_rebuild = "--full-rebuild" in sys.argv
    n_batches = int(args[0]) if len(args) > 0 else 12
    per_batch = int(args[1]) if len(args) > 1 else 400

    from cod_stats_spark.plans.curation import compact_curated_shards
    from cod_stats_spark.plans.training_export import export_training_shards
    from cod_stats_spark.session import get_spark

    spark = get_spark(app_name="compact_audit")
    tmp = tempfile.mkdtemp(prefix="compact_audit_")
    state = os.path.join(tmp, "state")
    frag_dir = os.path.join(state, "shards_frag")
    dest = os.path.join(state, "shards")

    walls = []
    for b in range(1, n_batches + 1):
        rows = [
            (b * per_batch + i, _text(b, i)) for i in range(per_batch)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        export_training_shards(
            docs,
            os.path.join(frag_dir, f"batch={b}"),
            token_budget=1024,
            min_quality=0.0,
            salt=f"audit|{b}",
        )
        frag_before = _parquet_files(frag_dir)
        if full_rebuild:
            # measure the pre-r12 shape on identical data: clear the
            # consumption record so every cycle re-consumes everything
            snap_before: dict[str, int] = {}
            t0 = time.monotonic()
            compact_curated_shards(spark, state, full_rebuild=True)
            wall = time.monotonic() - t0
            read_files = len(frag_before)
        else:
            snap_before = {
                p: os.stat(p).st_mtime_ns for p in _parquet_files(dest)
            }
            consumed = {
                n.split(".")[1][1:]
                for n in os.listdir(dest)
                if n.startswith("_APPLIED.")
            } if os.path.isdir(dest) else set()
            read_files = sum(
                1
                for p in frag_before
                if os.path.relpath(p, frag_dir).split(os.sep)[0][6:]
                not in consumed
            )
            t0 = time.monotonic()
            compact_curated_shards(spark, state)
            wall = time.monotonic() - t0
        after = _parquet_files(dest)
        written = sum(
            1
            for p in after
            if snap_before.get(p) != os.stat(p).st_mtime_ns
        )
        walls.append(wall)
        print(
            json.dumps(
                {
                    "cycle": b,
                    "wall_sec": round(wall, 3),
                    "frag_files_read": read_files,
                    "frag_files_on_disk": len(frag_before),
                    "shard_dirs_written": written,
                    "shard_dirs_total": len(after),
                    "mode": "full_rebuild" if full_rebuild else "incremental",
                }
            ),
            flush=True,
        )
    half = len(walls) // 2
    print(
        json.dumps(
            {
                "summary": "compact_audit",
                "mode": "full_rebuild" if full_rebuild else "incremental",
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "mean_wall_first_half": round(sum(walls[:half]) / half, 3),
                "mean_wall_second_half": round(
                    sum(walls[half:]) / (len(walls) - half), 3
                ),
                "drift_ratio": round(
                    (sum(walls[half:]) / (len(walls) - half))
                    / max(sum(walls[:half]) / half, 1e-9),
                    3,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
