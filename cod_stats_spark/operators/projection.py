"""Embedding dimensionality reduction — random projection and PCA.

At 100 TB the embedding column dominates storage and every ANN/near-
dup shuffle moves it; cutting d before those stages is the cheapest
multiplier in the pipeline. Two reducers with different contracts:

- **Random projection** (Johnson–Lindenstrauss; Achlioptas, JCSS
  2003): a DETERMINISTIC projection matrix generated from hashes —
  no training pass, any executor regenerates it, and pairwise
  geometry is preserved within the JL distortion bound. Because the
  matrix is a driver-side constant, the whole reduced-space search is
  SQL-replayable — the `ann_topk` gate value-verifies projection,
  reduced-space cosine, and the pruned top-k (method='rp').
- **PCA**: the optimal linear reducer for a GIVEN corpus. One
  Arrow-batched pass reduces each partition batch to (n, Σx, ΣxxT)
  partials — O(d²) driver state, the k-means/PQ bounded-collect
  contract — then the d×d eigendecomposition runs driver-side
  (numpy), with a deterministic sign convention so refits are
  byte-stable. Not SQL-expressible (iterative eigensolver), so PCA
  is pinned by variance-recovery and reconstruction tests instead of
  an oracle slot.

Both project through the same GEMM kernel (one mapInPandas matmul,
partitioning preserved, no shuffle); random projection also has a
pure-Column path used by the gate so the JVM-side arithmetic is what
the oracle replays.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def projection_planes(d_in: int, d_out: int, namespace: str = "rproj") -> list[list[float]]:
    """Deterministic pseudo-random projection rows in [-1, 1) from
    sha256 mixes — same recipe as the LSH hyperplanes but in a
    separate hash namespace, so reducing and bucketing never reuse
    randomness."""
    planes = []
    for i in range(d_out):
        row = []
        for j in range(d_in):
            h = int.from_bytes(
                hashlib.sha256(f"{namespace}:{i}:{j}".encode()).digest()[:8],
                "big",
            )
            row.append((h / 2**63) - 1.0)
        planes.append(row)
    return planes


def random_project(
    df: DataFrame,
    vec_col: str,
    d_in: int,
    d_out: int,
    out_col: str = "rp",
    namespace: str = "rproj",
) -> DataFrame:
    """Pure-Column JL projection: out[j] = Σ_i vec[i]·plane[j][i],
    evaluated JVM-side (zip_with + aggregate per output dim — fine for
    the small d_out this path targets; use :func:`project_gemm` for
    wide outputs). Deterministic: the matrix is regenerated from
    hashes, never shipped."""
    planes = projection_planes(d_in, d_out, namespace)

    def dot(plane: list[float]) -> str:
        lit = "array(" + ", ".join(repr(v) for v in plane) + ")"
        return (
            f"aggregate(zip_with(`{vec_col}`, {lit}, (x, y) -> x * y),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        )

    arr = "array(" + ", ".join(dot(p) for p in planes) + ")"
    return df.withColumn(out_col, F.expr(arr))


def project_gemm(
    df: DataFrame,
    vec_col: str,
    matrix,
    mean=None,
    out_col: str = "proj",
) -> DataFrame:
    """GEMM projection kernel: y = (x − mean) @ matrixᵀ as one numpy
    matmul per Arrow batch (mapInPandas; input partitioning preserved,
    no shuffle). ``matrix`` is (d_out, d_in); ``mean`` optional (d_in,).
    Serves both reducers: random projection (mean=None) and PCA."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    M = np.asarray(matrix, dtype=np.float64)
    mu = None if mean is None else np.asarray(mean, dtype=np.float64)
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) if len(pdf) else np.zeros((0, M.shape[1]))
            if mu is not None and len(pdf):
                X = X - mu
            Y = X @ M.T
            out = pdf.copy()
            out[out_col] = [row.tolist() for row in Y]
            yield out

    return df.mapInPandas(batches, schema)


def pca_fit(
    df: DataFrame,
    vec_col: str,
    d: int,
    k: int,
):
    """Fit PCA over the vector column: returns (components (k, d),
    mean (d,), explained_variance_ratio (k,)). One distributed pass
    emits (n, Σx, ΣxxT) per Arrow batch; the driver combines the
    partials (order-free exact-shape sums; float addition order can
    differ across partitionings by ulps, which the deterministic sign
    convention and tests' rounding absorb) and eigendecomposes the
    d×d covariance. Sign convention: each component's
    largest-magnitude coordinate is made positive."""
    import numpy as np
    import pandas as pd

    if not 1 <= k <= d:
        raise ValueError(f"pca_fit: k={k} outside [1, {d}]")

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                    # (k, d)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(evals.sum())
    evr = [float(evals[o]) / total if total > 0 else 0.0 for o in order]
    return comps, mean, evr


def pca_project(
    df: DataFrame,
    vec_col: str,
    components,
    mean,
    out_col: str = "pca",
) -> DataFrame:
    """Project onto fitted components: the GEMM kernel with centering."""
    return project_gemm(df, vec_col, components, mean=mean, out_col=out_col)
