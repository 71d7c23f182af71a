"""Dump .explain('formatted') for named bench entries into
plans/<round>/<entry>_<tag>.txt — the optimization round's plan
evidence (guide §1: capture the plan shape before and after each
change). Round dir from $SPARK_GRAFT_PLAN_ROUND (default r17).

Usage: python tools/explain_entries.py <tag> [entry ...]
With no entries listed, dumps the default top-cost set.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "kn5_score",
    "curate_corpus",
    "quality_classifier",
    "dedup_winnow",
    "arpa_lm_score",
    "semantic_dedup",
    "kn_lm_score_v2",
    "media_phash",
    "dedup_pipeline_v2",
    "retrieval_bm25",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from cod_stats_spark.plans.bench_queries import BENCH_ONLY, QUERIES
    from cod_stats_spark.session import get_spark

    queries = {**QUERIES, **BENCH_ONLY}
    spark = get_spark("explain-entries")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"# wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
