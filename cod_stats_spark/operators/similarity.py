"""Similarity search over embedding columns (array<float>).

- ``cosine(a, b)``            — Column expression (zip_with dot / norms)
- ``brute_force_topk``        — exact top-k vs. a query vector:
      per-row score (codegen) + TakeOrderedAndProject; the correctness
      baseline and still the right plan when the query set is small.
- ``ann_lsh_topk``            — random-hyperplane LSH: vectors bucket by
      sign-bit sketch; queries probe only their bucket (+ optional
      multi-probe neighbors). The 100 TB path: the scan prunes to
      matching buckets (partition-prunable if the table is written
      partitioned by bucket).
- ``ivf_assign / ivf_topk``   — IVF: k-means-free variant using a
      deterministic sample of vectors as centroids; probe nearest
      ``nprobe`` centroids.

All pure Column expressions; hyperplanes are derived deterministically
from xxhash64 so results are reproducible without RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def _qvec_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def _qnorm(query_vec: list[float]) -> float:
    """Driver-side query norm. Catalyst does NOT constant-fold
    higher-order-function aggregates over literal arrays, so
    norm(_qvec_lit(q)) would be re-evaluated per scored row; Python's
    left-to-right sum over the same doubles is bit-identical to the
    fold Spark would run."""
    import math

    return math.sqrt(sum(float(x) * float(x) for x in query_vec))


def _query_score(vec: Column, query_vec: list[float], decimals: int = 6) -> Column:
    """round(cosine(vec, q), decimals) with the query norm as a folded
    literal — one norm aggregate per row (the row's own), not two."""
    d = norm(vec) * F.lit(_qnorm(query_vec))
    return F.round(
        F.when(d > 0, dot(vec, _qvec_lit(query_vec)) / d).otherwise(F.lit(0.0)),
        decimals,
    )


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    score_decimals: int = 6,
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    Plan: codegen'd per-row score → TakeOrderedAndProject (per-partition
    heap, k-row driver merge). No shuffle; linear scan is the cost — at
    100 TB use ann_lsh_topk / ivf_topk to prune the scan.
    """
    score = _query_score(
        F.col(vec_col).cast("array<double>"), query_vec, score_decimals
    )
    return (
        df.select(F.col(id_col).alias("id"), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a hash mix.

    Python-side constant generation (driver-only, tiny) — the per-row
    work stays in JVM expressions.
    """
    import hashlib

    vals = []
    for j in range(dim):
        h = int.from_bytes(
            hashlib.sha256(f"plane:{plane_idx}:{j}".encode()).digest()[:8], "big"
        )
        vals.append((h / 2**63) - 1.0)  # roughly uniform in [-1, 1)
    return vals


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit sketch: bucket id = bits of sign(vec · plane_i)."""
    acc = F.lit(0)
    for i in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, i)])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        acc = acc + bit
    return acc


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (plus ``multiprobe`` Hamming-1 neighbor buckets).

    The bucket filter is a plain predicate → at scale, write the table
    partitioned/bucketed by the sketch and this becomes partition
    pruning: the scan touches 1/2^n_planes of the data.
    """
    dim = len(query_vec)
    vec = F.col(vec_col).cast("array<double>")
    bucketed = df.withColumn("_bucket", lsh_bucket(vec, dim, n_planes))
    probes = lsh_probes(query_vec, n_planes, multiprobe)

    cand = bucketed.filter(F.col("_bucket").isin(probes))
    score = _query_score(vec, query_vec)
    return (
        cand.select(F.col(id_col).alias("id"), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def lsh_probes(query_vec: list[float], n_planes: int, multiprobe: int = 0) -> list[int]:
    """Driver-side query sketch + Hamming-1 multiprobe set (the same
    deterministic planes the table side uses)."""
    dim = len(query_vec)
    qb = 0
    for i in range(n_planes):
        plane = _hyperplane(dim, i)
        if sum(q * p for q, p in zip(query_vec, plane)) >= 0:
            qb |= 1 << i
    return [qb] + [qb ^ (1 << i) for i in range(min(multiprobe, n_planes))]


def write_lsh_index(
    df: DataFrame,
    path: str,
    vec_col: str,
    id_col: str,
    dim: int,
    n_planes: int = 8,
    mode: str = "overwrite",
) -> None:
    """Materialize the table Hive-partitioned by LSH sketch bucket —
    the scale path ann_lsh_topk's docstring promises: a probe query
    against the written table becomes PARTITION PRUNING (the scan
    lists and reads only lsh_bucket=<probe> directories, 1/2^n_planes
    of the data per probe) instead of a full-scan filter."""
    from cod_stats_spark.operators.sharding import write_shards

    vec = F.col(vec_col).cast("array<double>")
    # the STORED vector dtype is pinned to array<double>: an appended
    # batch whose source column is float (or vice versa) must not
    # leave mixed-schema files behind — parquet readers fail on the
    # per-file type mismatch, which is exactly the incremental-index
    # hazard the lifecycle test plants
    bucketed = df.select(
        F.col(id_col),
        vec.alias(vec_col),
        lsh_bucket(vec, dim, n_planes).alias("lsh_bucket"),
    )
    write_shards(bucketed, path, shard_col="lsh_bucket", mode=mode)


def ann_lsh_topk_indexed(
    spark,
    path: str,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe: int = 0,
) -> DataFrame:
    """ann_lsh_topk against a write_lsh_index table: the bucket
    predicate hits the partition column, so Catalyst prunes the scan
    to the probed directories (PartitionFilters in the plan — asserted
    by tests/test_similarity_and_multimodal.py's pruning test)."""
    df = spark.read.parquet(path)
    probes = lsh_probes(query_vec, n_planes, multiprobe)
    cand = df.filter(F.col("lsh_bucket").isin(probes))
    score = _query_score(F.col(vec_col).cast("array<double>"), query_vec)
    return (
        cand.select(F.col(id_col).alias("id"), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    mode: str = "overwrite",
) -> None:
    """Materialize the table Hive-partitioned by k-means cluster — the
    IVF twin of :func:`write_lsh_index`. A probe query against the
    written table prunes the scan to ``ivf_cluster=<probe>``
    directories (~1/k of the data per probed cluster). Centroids come
    from ``clustering.kmeans_fit`` (or any driver-side list); keep the
    SAME list for probing or the partitioning is meaningless."""
    from cod_stats_spark.operators.clustering import kmeans_assign
    from cod_stats_spark.operators.sharding import write_shards

    labeled = kmeans_assign(df, vec_col, centroids).withColumnRenamed(
        "cluster", "ivf_cluster"
    )
    write_shards(
        # stored vector dtype pinned (see write_lsh_index) — appended
        # batches of either float/double sources stay readable
        labeled.select(
            id_col,
            F.col(vec_col).cast("array<double>").alias(vec_col),
            "ivf_cluster",
        ),
        path,
        shard_col="ivf_cluster",
        mode=mode,
    )


def ivf_topk_indexed(
    spark,
    path: str,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search against a :func:`write_ivf_index` table: the cluster
    predicate hits the partition column → partition pruning, reading
    only the ``nprobe`` nearest clusters' directories. Probe selection
    is driver-side L2 against the same centroid list the index was
    written with."""
    import numpy as np

    M = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((M - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2)[:nprobe]]
    df = spark.read.parquet(path)
    cand = df.filter(F.col("ivf_cluster").isin(probes))
    score = _query_score(F.col(vec_col).cast("array<double>"), query_vec)
    return (
        cand.select(F.col(id_col).alias("id"), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Assign each vector to its nearest centroid (by cosine).

    ``centroids`` is a small driver-side list [(centroid_id, vec)] —
    broadcast as literal expressions, evaluated codegen-side. The
    row's norm is projected ONCE (not re-aggregated per centroid) and
    each centroid's norm is a driver-side folded literal.
    """
    vec = F.col(vec_col).cast("array<double>")
    nv = F.col("_nv")

    def _cscore(cv: list[float]) -> Column:
        d = nv * F.lit(_qnorm(cv))
        return F.when(d > 0, dot(vec, _qvec_lit(cv)) / d).otherwise(F.lit(0.0))

    pairs = F.array(
        *[
            F.struct(_cscore(cv).alias("score"), F.lit(cid).alias("cid"))
            for cid, cv in centroids
        ]
    )
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-2.0).alias("score"), F.lit(-1).alias("cid")),
        lambda acc, p: F.when(p["score"] > acc["score"], p).otherwise(acc),
    )
    return (
        df.withColumn("_nv", norm(vec))
        .withColumn("_centroid", best["cid"])
        .drop("_nv")
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: probe the ``nprobe`` centroids nearest the query."""
    scored = sorted(
        centroids,
        key=lambda c: -sum(q * x for q, x in zip(query_vec, c[1])),
    )
    probe_ids = [cid for cid, _ in scored[:nprobe]]
    assigned = ivf_assign(df, vec_col, id_col, centroids)
    cand = assigned.filter(F.col("_centroid").isin(probe_ids))
    vec = F.col(vec_col).cast("array<double>")
    score = _query_score(vec, query_vec)
    return (
        cand.select(F.col(id_col).alias("id"), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    score_decimals: int = 6,
) -> DataFrame:
    """Exact top-k neighbors for EVERY query vector in one pass
    (batch ANN — the retrieval shape behind hard-negative mining and
    dedup-against-index jobs).

    Plan at 100 TB: the query set is broadcast (it is the small side
    by construction), scoring is a codegen'd map-side projection over
    the corpus — no shuffle to score. The only movement is the top-k
    reduction, done in two stages: a per-input-partition row_number
    prunes to ≤ k rows per (query, partition) BEFORE the exchange, so
    the per-query window never sees the full scored corpus (which
    would funnel |corpus| rows into one task per query). Both stages
    rank by the same (rounded score, id) total order, so stage 1 is a
    lossless prune of the global top-k.

    Self-matches (same id on both sides) are excluded.
    """
    from pyspark.sql import Window

    # Norms are precomputed ONCE per row on each side BEFORE the join:
    # cosine() would otherwise recompute the corpus row's norm for
    # every query it is paired with (|queries|× redundant aggregate
    # evaluations per corpus row).
    qv = F.col("_qv")
    vec = F.col("_cv")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", norm(qv))
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    ).withColumn("_cn", norm(vec))
    denom = F.col("_cn") * F.col("_qn")
    score = F.when(denom > 0, dot(vec, qv) / denom).otherwise(F.lit(0.0))
    scored = (
        c.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("id"),
            F.round(score, score_decimals).alias("cosine"),
        )
    )
    order = [F.col("cosine").desc(), F.col("id").asc()]
    local = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(*order)
    pruned = (
        scored.withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
    )


def knn_join_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    score_decimals: int = 6,
    max_broadcast_queries: int = 100_000,
    query_chunk: int = 512,
) -> DataFrame:
    """:func:`knn_join` with BLAS scoring — same exact answer, the
    production path once |queries|·|corpus| makes interpreted per-pair
    evaluation the bottleneck.

    The r6 scale audit (SCALING.md) showed the pure-Column knn_join
    growing superlinearly in wall time on a 10x corpus with 10x
    queries: its cost model is inherently O(|Q|·|C|·d), and every
    multiply runs as an interpreted HOF expression. This variant keeps
    the identical distribution strategy (queries broadcast, corpus
    never shuffled to score, per-partition lossless top-k prune before
    the exchange) but scores each Arrow batch as ONE numpy matrix
    product — C(B×d) @ Q.T(d×q) — which is two-plus orders of
    magnitude more multiply-adds per second than the expression
    interpreter. mapInPandas is Arrow-batched end to end: no
    row-at-a-time Python anywhere.

    Bounds, stated: the query side is collected to the driver and
    broadcast (capped at ``max_broadcast_queries``; beyond that a
    batch KNN should go through the LSH/IVF index paths instead), and
    the score matrix is built ``query_chunk`` query-columns at a time
    so per-task memory stays ≤ batch_rows × query_chunk × 8 bytes.

    Tie semantics match knn_join exactly: rank by (round(cosine, 6)
    DESC, id ASC); the per-batch prune sorts by the same total order,
    so it is lossless for the global top-k. Self-matches excluded.
    """
    import numpy as np

    from pyspark.sql import Window

    spark = corpus.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()
    if len(q_rows) > max_broadcast_queries:
        raise ValueError(
            f"{len(q_rows)} query vectors exceed max_broadcast_queries="
            f"{max_broadcast_queries}; use the LSH/IVF index paths for "
            "corpus-scale query sets"
        )
    id_type = corpus.schema[id_col].dataType.simpleString()
    if not q_rows:
        # zero queries → a well-typed empty result, not a numpy shape error
        return spark.createDataFrame(
            [], f"query_id {id_type}, id {id_type}, cosine double, rank int"
        )
    if any(r[1] is None for r in q_rows):
        raise ValueError("knn_join_gemm: query vectors must be non-null")
    q_ids_arr = np.array([r[0] for r in q_rows])
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1)
    bc = spark.sparkContext.broadcast((q_ids_arr, q_mat, q_norms))

    out_schema = f"query_id {id_type}, id {id_type}, cosine double"
    dim = q_mat.shape[1]
    kk = int(k)
    dec = int(score_decimals)
    chunk = int(query_chunk)

    def score_batches(batches):
        import pandas as pd

        q_ids, Q, qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # null corpus vectors behave exactly like the Column path:
            # cosine 0.0 (zero denom), still rankable by id — replace
            # with a zero vector instead of letting np.array die on None
            raw = [
                v if v is not None else [0.0] * dim for v in pdf[vec_col].tolist()
            ]
            C = np.array(raw, dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            cn = np.linalg.norm(C, axis=1)
            out_q, out_i, out_s = [], [], []
            for lo in range(0, len(q_ids), chunk):
                Qc = Q[lo : lo + chunk]
                qnc = qn[lo : lo + chunk]
                qidc = q_ids[lo : lo + chunk]
                denom = cn[:, None] * qnc[None, :]
                with np.errstate(invalid="ignore", divide="ignore"):
                    S = np.where(denom > 0, C @ Qc.T / np.where(denom > 0, denom, 1.0), 0.0)
                S = np.round(S, dec)
                S[ids[:, None] == qidc[None, :]] = -np.inf  # self-matches
                for j in range(Qc.shape[0]):
                    col = S[:, j]
                    # same total order as the global rank: score desc, id asc
                    sel = np.lexsort((ids, -col))[:kk]
                    sel = sel[np.isfinite(col[sel])]
                    out_q.append(np.full(len(sel), qidc[j]))
                    out_i.append(ids[sel])
                    out_s.append(col[sel])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "id": np.concatenate(out_i),
                        "cosine": np.concatenate(out_s),
                    }
                )

    pruned = corpus.select(id_col, vec_col).mapInPandas(score_batches, out_schema)
    order = [F.col("cosine").desc(), F.col("id").asc()]
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-bucketed.

    Same banded-bucket self-join shape as minhash_lsh_pairs: pairs are
    only formed WITHIN a sketch bucket, so the join never goes
    quadratic in the table size.
    """
    vec = F.col(vec_col).cast("array<double>")
    # per-row norm computed ONCE here — the in-bucket pair expansion
    # below would otherwise re-evaluate each member's norm aggregate
    # per pair (bucket_size× redundant work)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        vec.alias("v"),
        norm(vec).alias("n"),
        lsh_bucket(vec, dim, n_planes).alias("bucket"),
    )
    grouped = bucketed.groupBy("bucket").agg(
        F.array_sort(F.collect_list(F.struct("id", "v", "n"))).alias("items")
    )
    small = grouped.filter(F.size("items").between(2, max_bucket_size))
    items = small.select(F.col("items"))
    def _pair_cosine(a, b):
        d = a["n"] * b["n"]
        return F.round(
            F.when(d > 0, dot(a["v"], b["v"]) / d).otherwise(F.lit(0.0)), 6
        )

    pairs = items.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda a, i: F.transform(
                        F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                        lambda b: F.struct(
                            a["id"].alias("id_a"),
                            b["id"].alias("id_b"),
                            _pair_cosine(a, b).alias("cosine"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    # oversized buckets: two-hub expansion to the two smallest ids
    # instead of a silent drop (see dedup.minhash_lsh_pairs for the
    # recall reasoning) — cosine still verified on every emitted pair,
    # cost 2·O(size) not O(size²)
    big = grouped.filter(F.size("items") > max_bucket_size)
    star = big.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.slice(F.col("items"), 1, 2),
                    lambda h, i: F.transform(
                        F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                        lambda b: F.struct(
                            h["id"].alias("id_a"),
                            b["id"].alias("id_b"),
                            _pair_cosine(h, b).alias("cosine"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    return pairs.unionByName(star).filter(F.col("cosine") >= threshold).distinct()
