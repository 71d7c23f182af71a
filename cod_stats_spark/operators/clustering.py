"""Distributed k-means over an embedding column.

Upgrades the IVF path (operators/similarity.py) from "deterministic
sample as pseudo-centroids" to real Lloyd iterations, and rounds out
the engine's iterative-algorithm story next to connected components
(operators/components.py).

Scale shape — the textbook Spark k-means decomposition:

- **Assignment** is embarrassingly parallel and BLAS-bound: each
  Arrow batch computes one ``C(B×d) @ M.T(d×k)`` product against the
  broadcast centroid matrix (same mapInPandas/GEMM pattern as
  ``knn_join_gemm``; no per-pair interpreted expressions).
- **Update** never shuffles vectors: every partition emits only its
  per-cluster ``(sum_vec, count)`` partials — a k×d matrix — and the
  driver combines them. Driver state is O(k·d) regardless of corpus
  size; the corpus is traversed once per iteration.
- **Lineage** stays flat: each iteration reads the SAME cached input
  DataFrame; no iterative plan nesting (the classic Spark-iteration
  trap components.py documents).

Determinism: init picks the k vectors with the smallest
``md5(id || salt)`` (a pure function of the data — reproducible
across engines/partitionings, same device as sampling.py), and the
driver combines partition partials in sorted partition order, so
float summation order is fixed for a fixed partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _init_centroids(df: DataFrame, vec_col: str, id_col: str, k: int, salt: str):
    """k seed vectors chosen by smallest md5(id||salt) — deterministic,
    engine-independent, and uniform over rows (hash order is unrelated
    to insertion or value order)."""
    rows = (
        df.select(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("_h"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    import numpy as np

    return np.array([r["_v"] for r in rows], dtype=np.float64)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 16,
    max_iter: int = 20,
    tol: float = 1e-6,
    salt: str = "",
):
    """Lloyd's k-means (L2) on ``df[vec_col]``.

    Returns ``(centroids, history)``: centroids as a list of k
    ``list[float]`` (empty clusters re-seeded from the heaviest
    cluster's centroid — k never silently shrinks), history as the
    per-iteration mean squared centroid movement (monotone toward
    ``tol``; its length is the iteration count actually run).

    The input is persisted for the duration of the fit (each
    iteration is one pass) and unpersisted before returning.
    """
    import numpy as np

    # null vectors carry no position — drop them from the fit (the
    # numpy conversion would otherwise die mid-iteration as an opaque
    # executor error); callers label them separately if needed
    vecs = (
        df.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .persist()
    )
    try:
        n_rows = vecs.count()  # materialize once; iterations read cache
        if n_rows == 0:
            raise ValueError("kmeans_fit: empty input")
        centroids = _init_centroids(df, vec_col, id_col, k, salt)
        k_eff = centroids.shape[0]  # ≤ k when the table has < k rows
        history: list[float] = []

        for _ in range(max_iter):
            bc = vecs.sparkSession.sparkContext.broadcast(centroids)

            def partials(batches):
                import pandas as pd
                from pyspark import TaskContext

                M = bc.value  # (k, d)
                m_sq = (M * M).sum(axis=1)  # ||c||² per centroid
                sums = np.zeros_like(M)
                counts = np.zeros(M.shape[0], dtype=np.int64)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    C = np.array(pdf["_v"].tolist(), dtype=np.float64)
                    # argmin ||x-c||² = argmin ||c||² − 2·x·c  (||x||² const per row)
                    assign = (m_sq[None, :] - 2.0 * (C @ M.T)).argmin(axis=1)
                    for j in np.unique(assign):
                        sel = assign == j
                        sums[j] += C[sel].sum(axis=0)
                        counts[j] += int(sel.sum())
                ctx = TaskContext.get()
                yield pd.DataFrame(
                    {
                        "part": [ctx.partitionId() if ctx else 0],
                        "sums": [sums.ravel().tolist()],
                        "counts": [counts.tolist()],
                    }
                )

            rows = vecs.mapInPandas(
                partials, "part int, sums array<double>, counts array<long>"
            ).collect()
            # combine partials in PARTITION order → deterministic float
            # sums for a fixed partitioning
            rows = sorted(rows, key=lambda r: r["part"])
            total_sum = np.zeros_like(centroids)
            total_cnt = np.zeros(k_eff, dtype=np.int64)
            for r in rows:
                total_sum += np.array(r["sums"], dtype=np.float64).reshape(
                    centroids.shape
                )
                total_cnt += np.array(r["counts"], dtype=np.int64)
            new_centroids = centroids.copy()
            nonempty = total_cnt > 0
            new_centroids[nonempty] = (
                total_sum[nonempty] / total_cnt[nonempty, None]
            )
            if (~nonempty).any():
                # re-seed empty clusters at the heaviest cluster's
                # centroid, nudged deterministically — keeps k stable
                heavy = int(total_cnt.argmax())
                for idx in np.where(~nonempty)[0]:
                    new_centroids[idx] = new_centroids[heavy] * (
                        1.0 + 1e-4 * (idx + 1)
                    )
            shift = float(((new_centroids - centroids) ** 2).sum(axis=1).mean())
            centroids = new_centroids
            history.append(shift)
            bc.destroy()
            if shift <= tol:
                break
        return [c.tolist() for c in centroids], history
    finally:
        vecs.unpersist()


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """df + ``cluster`` column: index of the nearest (L2) centroid.

    Pure Column expressions (no Python in the scoring path): with the
    centroid list folded in as literals, ``argmin ||c||² − 2·x·c``
    needs one dot product per centroid — fine for the k ≤ a few
    hundred that IVF uses. The result feeds ``ivf_topk``-style probe
    pruning or partitioned index writes.
    """
    import numpy as np

    from cod_stats_spark.operators.similarity import dot

    if not centroids:
        raise ValueError("kmeans_assign requires at least one centroid")
    M = np.asarray(centroids, dtype=np.float64)
    v = F.col(vec_col).cast("array<double>")
    best = None
    for j in range(M.shape[0]):
        c_lit = F.array(*[F.lit(float(x)) for x in M[j]])
        score = F.lit(float((M[j] * M[j]).sum())) - 2.0 * dot(v, c_lit)
        entry = F.struct(score.alias("s"), F.lit(j).alias("j"))
        best = entry if best is None else F.least(best, entry)
    return df.withColumn("cluster", best["j"])
