"""Per-batch cost audit for the incremental training-sequence tape
(streaming/packing.training_sequences_append, r12).

Appends N fixed-size document batches to ONE tape and reports each
batch's wall time alongside the tape's total token count — the claim
under test: per-batch cost must NOT grow with tape length, because
nothing about the shipped corpus is re-read (the batch's slice rows +
a 1-row cursor snapshot are the whole working set; contrast the
one-shot training_sequences, which re-packs from offset zero and so
scales with the corpus on every append).

Usage:
  python tools/tape_audit.py [n_batches] [docs_per_batch] [tokens_per_doc]
Defaults: 15 batches x 2000 docs x 120 tokens. Prints one JSON line
per batch and a summary line (first-half vs second-half mean drift).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    per_doc = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    if n_batches < 2:
        raise SystemExit(
            "tape_audit: need >= 2 batches for a drift comparison"
        )

    from cod_stats_spark.session import get_spark
    from cod_stats_spark.streaming.packing import training_sequences_append

    spark = get_spark(app_name="tape_audit")
    state = os.path.join(tempfile.mkdtemp(prefix="tape_audit_"), "tape")

    walls = []
    for b in range(1, n_batches + 1):
        rows = [
            (
                b * per_batch + i,
                [f"t{b}_{i}_{j}" for j in range(per_doc)],
            )
            for i in range(per_batch)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, toks array<string>"
        )
        t0 = time.monotonic()
        n_windows = training_sequences_append(
            spark, docs, "toks", state, batch_id=b, seq_len=2048
        ).count()
        wall = time.monotonic() - t0
        walls.append(wall)
        print(
            json.dumps(
                {
                    "batch": b,
                    "wall_sec": round(wall, 3),
                    "windows_emitted": n_windows,
                    "tape_tokens_total": b * per_batch * per_doc,
                }
            ),
            flush=True,
        )
    half = len(walls) // 2
    print(
        json.dumps(
            {
                "summary": "tape_audit",
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "tokens_per_doc": per_doc,
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
