"""Recall@k curves for the approximate ANN paths (r7 verdict task 8).

The approximate operators (LSH sign-buckets, IVF probe search, IVF-PQ
raw/residual ADC) are VALUE-verified for their arithmetic by the
`ann_topk` gate, but recall QUALITY was only fixture-asserted. This
tool measures recall@10 against exact brute-force cosine on the sf1eq
embeddings (20k × 64d) across the tuning knobs — multiprobe for LSH,
nprobe for IVF, (m, k, nprobe, residual) for IVF-PQ — and prints one
JSON line per configuration. The table lands in SCALING.md so future
tuning has a regression reference.

    python tools/ann_recall.py [sf_dir] [n_queries]

Recall is averaged over deterministic query vectors (evenly strided
vec_ids). Ground truth is exact cosine top-10 in numpy over the same
vectors — identical arithmetic to brute_force_topk, without paying a
Spark action per (query, config); the SPARK side of each approximate
path is what actually runs.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(_REPO, ".scale_data", "sf1eq")
)
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
K = 10


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from cod_stats_spark.operators.clustering import kmeans_fit
    from cod_stats_spark.operators.quantization import (
        train_pq,
        train_pq_residual,
        write_ivfpq_index,
        ivfpq_topk_indexed,
    )
    from cod_stats_spark.operators.similarity import (
        ann_lsh_topk,
        ivf_topk,
    )
    from cod_stats_spark.session import get_spark
    from cod_stats_spark.tables import load_tables

    spark = get_spark("ann-recall")
    emb = load_tables(spark, SF_DIR)["embeddings"].select("vec_id", "embedding")
    rows = emb.collect()  # 20k × 64d ≈ 10 MB — measurement-tool only
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    # deterministic query set: evenly strided row positions
    qpos = [int(i * len(ids) / N_QUERIES) for i in range(N_QUERIES)]
    queries = [(int(ids[p]), [float(v) for v in X[p]]) for p in qpos]

    def exact_top(qv: list[float]) -> set[int]:
        q = np.asarray(qv)
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        cos = np.round(Xn @ qn, 6)
        order = np.lexsort((ids, -cos))  # cosine desc, id asc
        return {int(i) for i in ids[order[:K]]}

    truth = {qid: exact_top(qv) for qid, qv in queries}

    def recall(fetch) -> float:
        hits = 0
        for qid, qv in queries:
            got = {int(r["id"]) for r in fetch(qv).collect()}
            hits += len(got & truth[qid])
        return round(hits / (K * len(queries)), 3)

    out = []

    # LSH: sign-bucket candidates + Hamming-1 multiprobe
    for n_planes in (4, 8):
        for mp in (0, 1, 2, 4, n_planes):
            r = recall(
                lambda qv, np_=n_planes, mp_=mp: ann_lsh_topk(
                    emb, "embedding", "vec_id", qv, k=K,
                    n_planes=np_, multiprobe=mp_,
                )
            )
            out.append({"method": "lsh", "n_planes": n_planes,
                        "multiprobe": mp, "recall_at_10": r})
            print(json.dumps(out[-1]), flush=True)

    # Random projection (r8): project with the production GEMM path,
    # then reduced-space exact top-k — measures how much recall the
    # JL reduction itself costs at each width
    from cod_stats_spark.operators.projection import (
        project_gemm,
        projection_planes,
    )

    d_in = X.shape[1]
    for d_out in (8, 16, 32):
        proj_rows = project_gemm(
            emb, "embedding", projection_planes(d_in, d_out), out_col="y"
        ).select("vec_id", "y").collect()
        pids = np.array([r["vec_id"] for r in proj_rows], dtype=np.int64)
        Y = np.array([[float(v) for v in r["y"]] for r in proj_rows])
        Yn = Y / np.maximum(np.linalg.norm(Y, axis=1, keepdims=True), 1e-12)
        pos = {int(i): j for j, i in enumerate(pids)}
        hits = 0
        for qid, _ in queries:
            qy = Yn[pos[qid]]
            cos = np.round(Yn @ qy, 6)
            order = np.lexsort((pids, -cos))
            got = {int(i) for i in pids[order[:K]]}
            hits += len(got & truth[qid])
        out.append({"method": "rp", "d_out": d_out,
                    "recall_at_10": round(hits / (K * len(queries)), 3)})
        print(json.dumps(out[-1]), flush=True)

    # IVF: Lloyd's centroids, probe-count sweep
    centroids, _ = kmeans_fit(emb, "embedding", "vec_id", k=64, max_iter=10)
    for nprobe in (1, 2, 4, 8, 16):
        r = recall(
            lambda qv, np_=nprobe: ivf_topk(
                emb, "embedding", "vec_id", qv,
                list(enumerate(centroids)), k=K, nprobe=np_,
            )
        )
        out.append({"method": "ivf", "k_centroids": 64,
                    "nprobe": nprobe, "recall_at_10": r})
        print(json.dumps(out[-1]), flush=True)

    # IVF-PQ raw + residual: written index, ADC scoring
    coarse = centroids[:16]
    for m, kc in ((4, 16), (8, 16), (8, 64)):
        for residual in (False, True):
            if residual:
                books = train_pq_residual(
                    emb, "embedding", "vec_id", coarse, m=m, k=kc
                )
            else:
                books = train_pq(emb, "embedding", "vec_id", m=m, k=kc)
            idx = os.path.join(
                tempfile.mkdtemp(prefix="ann_recall_pq_"), "idx"
            )
            write_ivfpq_index(
                emb, idx, "embedding", "vec_id", coarse, books,
                residual=residual,
            )
            for nprobe in (2, 4, 8):
                r = recall(
                    lambda qv, np_=nprobe, b=books, p=idx, res=residual:
                    ivfpq_topk_indexed(
                        spark, p, "vec_id", qv, coarse, b, k=K,
                        nprobe=np_, residual=res,
                    )
                )
                out.append({"method": "ivfpq", "m": m, "k_codewords": kc,
                            "coarse": len(coarse), "nprobe": nprobe,
                            "residual": residual, "recall_at_10": r})
                print(json.dumps(out[-1]), flush=True)
            # refine stage: exact re-rank of the ADC top-50 — recall
            # becomes candidate-stage recall, quantization error gone
            from cod_stats_spark.operators.quantization import (
                ivfpq_topk_refined,
            )

            r = recall(
                lambda qv, b=books, p=idx, res=residual:
                ivfpq_topk_refined(
                    spark, p, emb, "embedding", "vec_id", qv, coarse, b,
                    k=K, rerank=50, nprobe=4, residual=res,
                )
            )
            out.append({"method": "ivfpq_refine", "m": m, "k_codewords": kc,
                        "coarse": len(coarse), "rerank": 50, "nprobe": 4,
                        "residual": residual, "recall_at_10": r})
            print(json.dumps(out[-1]), flush=True)

    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
