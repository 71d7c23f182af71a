"""Semantic deduplication — SemDeDup over an embedding column.

The embedding-space complement of the lexical dedup family (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023): cluster the embeddings with k-means, then
within each cluster drop near-duplicate pairs above a cosine
threshold, keeping the member FARTHEST from its centroid (the paper's
keeper rule — the most "extreme" exemplar of the semantic
neighborhood survives). Catches paraphrases and re-renders that
lexical MinHash/SimHash/ExactSubstr miss because the words differ.

Spark shape, by stage:

1. assignment — ``clustering.kmeans_assign`` (zero-shuffle codegen
   argmin for bounded k, GEMM beyond);
2. keeper rank — cosine to the OWN centroid via one broadcast join on
   the cluster id (k rows), rounded to 6 decimals so the rank compares
   identically in any engine;
3. pairing — pairs only form within a cluster, so the cost is
   Σ|cluster|² ≈ n²/k — **k is the scale knob** (SemDeDup runs
   k ≈ 50k at web scale precisely to bound cluster sizes; there is no
   silent cap here, choose k ∝ n). Two physical strategies, same
   answer (``pair_method``): one vectorized numpy scan per cluster
   group (default — the candidate superset resolves through the same
   Spark expressions), or a pure-Column self-join ON THE CLUSTER ID
   (a.id < b.id) with the rounded pair cosine filter;
4. survivors — a row is dropped iff it is the WORSE side of any
   ≥threshold pair (worse = closer to the centroid; ties → larger
   id). Every survivor is therefore the best-ranked member of its
   ≥threshold neighborhood — pairwise-exact, deterministic, and
   SQL-replayable with fixed centroids (no iterative component
   chasing; for clique-shaped duplicate groups this is exactly
   one-survivor-per-group).

Training the centroids is k-means (``clustering.kmeans_fit``, bounded
driver state); like BPE/PQ/the quality classifier, TRAINING is not
SQL-expressible but assignment + dedup over FIXED centroids is pure
arithmetic — the `ann_topk` gate's 'semdedup' rows replay every
assignment, rank, pair decision, and survivor in SQL via the
md5-sampled deterministic centroid rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.clustering import kmeans_assign
from cod_stats_spark.operators.similarity import dot, norm

#: Below this threshold the Arrow pairing path falls back to the
#: expression self-join: its Python prefilter keeps a pair only when
#: the exact cosine clears ``threshold - 1e-6``, and the guarded
#: zero-cosine pairs (null/NaN norms) that the expression path maps to
#: 0.0 are only droppable when the threshold itself is ≤ 0 — a regime
#: the prefilter cannot cover without emitting every pair.
_ARROW_PAIR_MIN_T = 1e-5

#: Pair-slice bound for the per-cluster fold loop — caps the scanner's
#: working set at a few 32 MB float64 arrays regardless of cluster size.
_PAIR_CHUNK = 1 << 22


def _pair_scan_fn(threshold: float):
    """Per-cluster candidate-pair scanner for the Arrow pairing path
    of :func:`semantic_dedup`.

    Emits a SUPERSET of the droppable pairs: every same-length pair
    whose exact (unrounded) cosine reaches ``threshold - 1e-6`` —
    round-half-up to 6 decimals moves a value by at most 5e-7, so no
    pair the expression path would drop can sit below the margin. The
    dot product is the bit pattern ``aggregate(zip_with(a, b,
    (x, y) -> x*y), 0.0, (acc, x) -> acc + x)`` produces: per-element
    products in index order, folded left-to-right into a 0.0 seed
    (``acc += M[ia, j] * M[ib, j]`` one dimension at a time — numpy
    elementwise ops round each partial sum exactly like the
    interpreted fold; pinned in tests/test_r16_optimizations.py).
    The FINAL decision — round(·, 6), the ≥-threshold compare, the
    NaN guard, and the worse-side choice — happens in Spark on the
    emitted (dot, n, centroid_cosine) columns, so every boundary case
    resolves through the identical expressions the self-join used.

    Pairs this scanner may skip, and why the expression path never
    drops them either: cross-length pairs (zip_with pads with null →
    null dot → null pair_cos → WHERE never passes), pairs with a
    null/NaN/zero norm on either side (denominator guard maps them to
    cosine 0.0 < threshold, which is why the Arrow path requires
    threshold > _ARROW_PAIR_MIN_T), and pairs touching a null-id row
    (the self-join's ``a._id < b._id`` condition evaluates null, so
    such rows never pair there either)."""
    margin = float(threshold) - 1e-6

    def scan(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["_id"].to_numpy()
        ns = pdf["_n"].to_numpy(dtype=np.float64, na_value=np.nan)
        cc = pdf["centroid_cosine"].to_numpy(
            dtype=np.float64, na_value=np.nan
        )
        vs = pdf["_v"].tolist()
        id_na = pd.isna(ids)
        by_len: dict[int, list[int]] = {}
        for i, v in enumerate(vs):
            if v is not None and not id_na[i]:
                by_len.setdefault(len(v), []).append(i)
        cols: list[list] = [[] for _ in range(7)]
        for idxs in by_len.values():
            m = len(idxs)
            if m < 2:
                continue
            sel = np.asarray(idxs)
            M = np.asarray(
                [np.asarray(vs[i], dtype=np.float64) for i in idxs]
            )
            ids_g, ns_g, cc_g = ids[sel], ns[sel], cc[sel]
            ii, jj = np.triu_indices(m, 1)
            for lo in range(0, ii.size, _PAIR_CHUNK):
                ia = ii[lo : lo + _PAIR_CHUNK]
                ib = jj[lo : lo + _PAIR_CHUNK]
                # inf/NaN products must PROPAGATE (the expression fold
                # propagates them too; the guards downstream resolve
                # them) — errstate only silences the warnings
                with np.errstate(
                    invalid="ignore", divide="ignore", over="ignore"
                ):
                    acc = np.zeros(ia.size, dtype=np.float64)
                    for j in range(M.shape[1]):
                        acc += M[ia, j] * M[ib, j]
                    den = ns_g[ia] * ns_g[ib]
                    cos = np.where(
                        den > 0, acc / np.where(den > 0, den, 1.0), 0.0
                    )
                    keep = cos >= margin  # NaN compares False
                if not keep.any():
                    continue
                ka, kb = ia[keep], ib[keep]
                for dst, arr in zip(
                    cols,
                    (
                        ids_g[ka], ids_g[kb], acc[keep],
                        ns_g[ka], ns_g[kb], cc_g[ka], cc_g[kb],
                    ),
                ):
                    dst.append(arr)
        names = ("a_id", "b_id", "_dot", "_na", "_nb", "_cca", "_ccb")
        if not cols[0]:
            f64 = np.float64
            return pd.DataFrame(
                {
                    n: pd.Series([], dtype=(ids.dtype if n.endswith("id") else f64))
                    for n in names
                }
            )
        return pd.DataFrame(
            {n: np.concatenate(c) for n, c in zip(names, cols)}
        )

    return scan


def centroid_ranked(
    spark, assigned: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """(_id, _v, _n, cluster, centroid_cosine) for the non-null-
    cluster rows of a ``kmeans_assign`` output — the keeper-rank
    projection shared by :func:`semantic_dedup` and the incremental
    state bootstrap (``streaming.semantic.build_semantic_state``).
    ONE definition on purpose: the bootstrap's contract is that its
    state rows are bit-identical to what the incremental path writes,
    which only a shared formula can guarantee.

    Cosine to the OWN centroid — one broadcast join on the k-row
    centroid relation; centroid norms fold in as driver-computed
    literals (bit-identical to a left-to-right SQL fold over the
    same doubles). NaN components make every comparison against
    them TRUE under Spark's NaN ordering (the anomaly-clamp
    lesson): a NaN cosine would pair with everything and rank above
    everything, so the rank is guarded explicitly — NaN vectors
    fall to score 0."""
    import math

    cent_rows = [
        (j, [float(x) for x in c], math.sqrt(sum(float(x) ** 2 for x in c)))
        for j, c in enumerate(centroids)
    ]
    cent = F.broadcast(
        spark.createDataFrame(
            cent_rows, "cluster int, _cv array<double>, _cn double"
        )
    )
    _raw_cc = dot(F.col("_v"), F.col("_cv")) / (F.col("_n") * F.col("_cn"))
    return (
        assigned.join(cent, "cluster")
        .withColumn("_n", norm(F.col("_v")))
        .select(
            "_id",
            "_v",
            "_n",
            "cluster",
            F.round(
                F.when(
                    (F.col("_n") * F.col("_cn") > 0) & ~F.isnan(_raw_cc),
                    _raw_cc,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("centroid_cosine"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    pair_method: str = "arrow",
) -> DataFrame:
    """Survivor rows of ``df`` + (cluster, centroid_cosine).

    ``centroids``: the trained k-means centers (list of float lists —
    the kmeans_fit output; fixed centroids keep the whole operator
    exactly replayable). ``threshold`` compares against the pair
    cosine ROUNDED to 6 decimals, the gate discipline that makes the
    boundary engine-independent.

    ``pair_method``: how stage 3's within-cluster pair cosines are
    computed — ``'arrow'`` (default) scans each cluster's pairs in one
    vectorized numpy pass per Arrow group (:func:`_pair_scan_fn`; the
    ``knn_join_gemm`` lesson, r16 — the self-join evaluated every
    Σ|cluster|²/2 dot products as interpreted HOF lambdas), ``'expr'``
    keeps the pure-Column self-join. SAME answer either way: the
    scanner only prefilters with an exact-cosine margin and replicates
    the fold's bit pattern; round/threshold/worse-side all evaluate in
    Spark expressions identical to the 'expr' path (parity pinned in
    tests/test_r16_optimizations.py). Thresholds ≤ 1e-5 force 'expr'
    (see _ARROW_PAIR_MIN_T)."""
    if not centroids:
        raise ValueError("semantic_dedup: centroids must be non-empty")
    if pair_method not in ("arrow", "expr"):
        raise ValueError(
            f"semantic_dedup: unknown pair_method {pair_method!r}"
        )
    spark = df.sparkSession
    from pyspark.storagelevel import StorageLevel

    use_arrow = pair_method == "arrow" and float(threshold) > _ARROW_PAIR_MIN_T
    v = F.col(vec_col).cast("array<double>")
    # persisted: the assignment projection (k dot products per row,
    # interpreted HOF lambdas) feeds FOUR consumers below (the null
    # pass-through, both sides of the pairing self-join, and the
    # survivor rank) — unpersisted, every consumer re-ran the full
    # argmin over the corpus (r16 optimization, guide §2.4). The cache
    # lives as long as the returned plan; callers that materialized
    # their result may release it via spark.catalog.clearCache() or by
    # dropping the plan. The count barrier (the dtf-barrier idiom —
    # consumers race inside one action otherwise) runs EAGERLY only on
    # the arrow branch, where the groupBy-applyInPandas consumers
    # otherwise recompute the argmin per group partition; the expr
    # branch stays a lazy plan builder (r17, ADVICE — plan-only
    # callers should not pay a corpus job at construction time).
    assigned = kmeans_assign(
        df.select(F.col(id_col).alias("_id"), v.alias("_v")), "_v", centroids
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if use_arrow:
        assigned.count()
    # null embeddings can't participate in a cosine decision — they
    # PASS THROUGH (null cluster/score); silently deleting them (the
    # inner joins below would) is data loss, not a dedup decision
    null_part = assigned.where(F.col("cluster").isNull()).select(
        "_id",
        F.col("cluster"),
        F.lit(None).cast("double").alias("centroid_cosine"),
    )
    assigned = assigned.where(F.col("cluster").isNotNull())
    ranked = centroid_ranked(spark, assigned, centroids)
    if use_arrow:
        # one shuffle by cluster, one vectorized scan per group; the
        # emitted candidate superset then resolves through the SAME
        # round/threshold/NaN/worse expressions as the 'expr' branch
        # (the worse formula is orientation-symmetric, so the
        # scanner's position-ordered pairs need no id ordering).
        # Null-id rows are dropped from the SCAN INPUT, not just
        # inside the scanner: a null in the Arrow batch makes pandas
        # deliver the whole id column as float64, corrupting non-null
        # ids above 2^53 on the round-trip (r17, ADVICE). Equivalent
        # by the same argument as the in-scanner skip — the expr
        # branch's a._id < b._id evaluates NULL for such rows, so
        # they never pair there either (and a pair decision only ever
        # emits one of its member ids).
        id_t = ranked.schema["_id"].dataType.simpleString()
        pairs = ranked.where(
            F.col("_id").isNotNull()
        ).groupBy("cluster").applyInPandas(
            _pair_scan_fn(float(threshold)),
            f"a_id {id_t}, b_id {id_t}, _dot double, _na double, "
            "_nb double, _cca double, _ccb double",
        )
        pair_cos = F.round(
            F.when(
                F.col("_na") * F.col("_nb") > 0,
                F.col("_dot") / (F.col("_na") * F.col("_nb")),
            ).otherwise(F.lit(0.0)),
            6,
        )
        worse = F.when(
            (F.col("_cca") > F.col("_ccb"))
            | (
                (F.col("_cca") == F.col("_ccb"))
                & (F.col("a_id") > F.col("b_id"))
            ),
            F.col("a_id"),
        ).otherwise(F.col("b_id"))
        dropped = (
            pairs.where(
                (pair_cos >= F.lit(float(threshold))) & ~F.isnan(pair_cos)
            )
            .select(worse.alias("_id"))
            .distinct()
        )
    else:
        a, b = ranked.alias("a"), ranked.alias("b")
        pair_cos = F.round(
            F.when(
                F.col("a._n") * F.col("b._n") > 0,
                dot(F.col("a._v"), F.col("b._v"))
                / (F.col("a._n") * F.col("b._n")),
            ).otherwise(F.lit(0.0)),
            6,
        )
        # worse side = CLOSER to the centroid (higher cc); ties →
        # larger id
        worse = F.when(
            (F.col("a.centroid_cosine") > F.col("b.centroid_cosine"))
            | (
                (F.col("a.centroid_cosine") == F.col("b.centroid_cosine"))
                & (F.col("a._id") > F.col("b._id"))
            ),
            F.col("a._id"),
        ).otherwise(F.col("b._id"))
        dropped = (
            a.join(
                b,
                (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .where(
                (pair_cos >= F.lit(float(threshold))) & ~F.isnan(pair_cos)
            )
            .select(worse.alias("_id"))
            .distinct()
        )
    survivors = (
        ranked.join(dropped, "_id", "left_anti")
        .select("_id", "cluster", "centroid_cosine")
        .unionByName(null_part)
    )
    return df.join(
        survivors.withColumnRenamed("_id", id_col), id_col
    )


def semantic_dedup_oracle_sql(
    k: int,
    threshold: float,
    src: str = "embeddings",
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
    pts_src: str | None = None,
) -> str:
    """DuckDB replica over the md5-sampled deterministic centroids
    (the IVF/k-means gate rule): assignment argmin, rounded centroid
    cosine, within-cluster pair decisions, and the worse-side drop —
    emitted as the survivor rows (id, cosine). ``pts_src``: optional
    separate relation for the DEDUPED points (the gate augments the
    corpus with synthetic near-dup copies there) while the centroid
    sample stays on ``src``."""
    return f"""
WITH cent AS (
  SELECT {vec_expr}::DOUBLE[] AS cv,
         row_number() OVER (ORDER BY md5({id_expr}::VARCHAR), {id_expr}) - 1 AS j
  FROM {src}
  ORDER BY md5({id_expr}::VARCHAR), {id_expr}
  LIMIT {k}
), pts AS (
  SELECT {id_expr} AS id, {vec_expr}::DOUBLE[] AS v FROM {pts_src or src}
), asg AS (
  SELECT id, v, j, round(list_cosine_similarity(v, cv), 6) AS cc
  FROM (
    SELECT p.id, p.v, c.j, c.cv,
           row_number() OVER (
             PARTITION BY p.id
             ORDER BY (list_dot_product(c.cv, c.cv)
                       - 2.0 * list_dot_product(p.v, c.cv)) ASC, c.j ASC
           ) AS rn
    FROM pts p CROSS JOIN cent c
  ) WHERE rn = 1
), dropped AS (
  SELECT DISTINCT CASE WHEN (a.cc > b.cc) OR (a.cc = b.cc AND a.id > b.id)
                       THEN a.id ELSE b.id END AS id
  FROM asg a JOIN asg b ON a.j = b.j AND a.id < b.id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
)
SELECT id, cc AS cosine FROM asg WHERE id NOT IN (SELECT id FROM dropped)
"""
