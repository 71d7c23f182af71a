"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM-pipeline contract (n-gram overlap decontamination, as
popularized by the GPT-3/PaLM appendices). Two query shapes:

- :func:`contaminated_docs` / :func:`decontaminate` — the CLEANING
  path: a corpus document is contaminated when at least
  ``min_overlap`` of its distinct word ``n``-grams occur anywhere in
  the benchmark UNION. Cost is linear in the corpus gram count: the
  benchmark reduces to one distinct n-gram SET, and each corpus gram
  matches it at most once. This is the path to run at 100 TB.
- :func:`contamination_pairs` — the REPORTING path: per
  (doc, bench_doc) overlap counts ("which benchmark did we hit?").
  Joining gram occurrences pairwise makes the intermediate
  Σ_g cnt_corpus(g)·cnt_bench(g) — fine at benchmark granularity
  and production n (8–13, where gram collisions are rare), but it
  grows superlinearly when the benchmark side scales with the corpus
  (the r7 sf10eq audit measured exactly that) — don't clean with it.

Broadcast posture: eval suites are MBs, so the benchmark gram set
normally broadcasts (zero shuffle on the corpus side). The decision is
ADAPTIVE by default: Catalyst's size estimate for the benchmark input,
times an n-gram expansion factor, is compared against the session's
autoBroadcastJoinThreshold — a benchmark that is secretly another
corpus degrades to a shuffled join (AQE may still convert at runtime
if the built side turns out small) instead of OOMing the build side.
Force with ``broadcast_benchmark=True``/``False``.

All pure Column expressions (reuses functions/text.py shingling — the
same normalization as the dedup family, so decontamination and dedup
agree on what a "word" is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import shingles
from cod_stats_spark.operators._util import spread


def _ngrams(df: DataFrame, text_col: str, id_col: str, n: int, out_id: str) -> DataFrame:
    # empty docs shingle to [''] — drop it so empty×empty never pairs.
    # spread(): the shingle explode is CPU-heavy interpreted HOF work —
    # widen a narrow local scan before it (no-op at real scale). The
    # column-NAME shingles path builds the one-SQL-string form with the
    # token array bound to a lambda variable (see functions/text.py).
    grams = F.filter(shingles(text_col, n), lambda g: g != F.lit(""))
    # one-element explode = Generate barrier: exploding the HOF chain
    # directly lets Generate re-evaluate the whole shingle+filter
    # expression per EMITTED row — O(len·ngrams) per doc (same trap as
    # retrieval.doc_term_freqs; measured there at 8×)
    pinned = spread(df).select(
        F.col(id_col).alias(out_id),
        F.explode(F.array(grams)).alias("_grams"),
    )
    return pinned.select(out_id, F.explode("_grams").alias("ngram"))


def _should_broadcast(
    benchmark: DataFrame, ngram_n: int, override: bool | None
) -> bool:
    """Adaptive broadcast decision for the benchmark gram set.

    Catalyst's estimate of the benchmark INPUT (file bytes for a scan)
    scaled by the n-gram expansion (each token starts ~one n-gram of
    ~n tokens, and parquet text decompresses a few ×) against the
    session's autoBroadcastJoinThreshold. Deliberately conservative:
    a false negative costs one extra shuffle that AQE can still undo
    at runtime; a false positive builds an unbounded hash relation on
    every executor."""
    if override is not None:
        return override
    try:
        est = int(benchmark._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        thr = int(
            benchmark.sparkSession._jsparkSession.sessionState()
            .conf()
            .autoBroadcastJoinThreshold()
        )
    except Exception:
        est, thr = 1 << 62, 0
    if thr <= 0:  # broadcast disabled session-wide
        return False
    if est >= 1 << 62:  # unknown (RDD-backed input): leave it to AQE,
        return False    # which converts to broadcast at runtime if small
    return est * ngram_n * 3 <= thr


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    ngram_n: int = 8,
    min_overlap: int = 1,
    broadcast_benchmark: bool | None = None,
    max_gram_df: int | None = None,
) -> DataFrame:
    """(doc_id, bench_id, n_overlap) for every corpus×benchmark pair
    sharing >= ``min_overlap`` distinct word n-grams — the REPORTING
    shape (see module docstring for why cleaning should use
    :func:`decontaminate` instead at scale).

    ``max_gram_df`` bounds the quadratic term structurally: grams
    occurring in more than that many BENCHMARK documents are dropped
    before pairing (the standard stop-gram practice for contamination
    reports — a gram shared by half the benchmark identifies nothing
    and multiplies every corpus occurrence by that half). With a cap
    c the per-gram fanout is ≤ c, so the intermediate is
    ≤ c·|corpus grams| — linear — at the cost of undercounting
    n_overlap for pairs whose overlap includes dropped boilerplate
    grams. Default None keeps exact counting."""
    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col
    corpus_grams = _ngrams(corpus, text_col, id_col, ngram_n, "doc_id")
    bench_grams = _ngrams(benchmark, bench_text_col, bench_id_col, ngram_n, "bench_id").distinct()
    if max_gram_df is not None:
        keep = (
            bench_grams.groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_gram_df)
            .select("ngram")
        )
        bench_grams = bench_grams.join(keep, "ngram", "left_semi")
    if _should_broadcast(benchmark, ngram_n, broadcast_benchmark):
        bench_grams = F.broadcast(bench_grams)
    return (
        corpus_grams.join(bench_grams, "ngram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    ngram_n: int = 8,
    min_overlap: int = 1,
    broadcast_benchmark: bool | None = None,
) -> DataFrame:
    """(doc_id, n_matched) for corpus docs whose distinct n-grams hit
    the benchmark UNION's gram set >= ``min_overlap`` times — the
    CLEANING shape: one distinct gram set, each corpus gram matched at
    most once, output linear in corpus grams. Slightly stricter than
    pair-level counting (k grams spread across k different benchmark
    docs count), which is the conservative direction for cleaning."""
    bench_text_col = bench_text_col or text_col
    corpus_grams = _ngrams(corpus, text_col, id_col, ngram_n, "doc_id")
    bench_set = (
        _ngrams(benchmark, bench_text_col, id_col, ngram_n, "_b")
        .select("ngram")
        .distinct()
    )
    if _should_broadcast(benchmark, ngram_n, broadcast_benchmark):
        bench_set = F.broadcast(bench_set)
    return (
        corpus_grams.join(bench_set, "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= min_overlap)
    )


def contaminated_doc_ids(pairs: DataFrame) -> DataFrame:
    """Distinct corpus doc ids flagged by ``contamination_pairs``."""
    return pairs.select("doc_id").distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    **kwargs,
) -> DataFrame:
    """Corpus rows with contaminated documents removed (left-anti join
    against the flagged id set — the write path for a clean corpus).
    Uses the linear doc-level gram-set match (:func:`contaminated_docs`),
    NOT the pairwise report."""
    flagged = contaminated_docs(corpus, benchmark, text_col, id_col, **kwargs)
    return corpus.join(
        flagged.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )


# ---------------------------------------------------------------------------
# Embedding-space (semantic) decontamination — the complement of the
# n-gram family above: a training document is contaminated when its
# EMBEDDING is within a cosine threshold of any benchmark embedding,
# catching paraphrased/reformatted eval material the word-n-gram match
# cannot see (the SemDeDup observation, operators/semantic.py, applied
# across datasets instead of within one).


def semantic_contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str,
    id_col: str,
    bench_vec_col: str | None = None,
    threshold: float = 0.95,
    method: str = "pairs",
    max_bench_rows: int = 100_000,
) -> DataFrame:
    """(doc_id, max_cosine) for corpus docs whose embedding reaches
    ``>= threshold`` cosine against ANY benchmark embedding. Per-pair
    cosines round to 6 dp BEFORE the max/threshold (engine- and
    path-identical decisions); zero-norm or NaN vectors score 0 on
    either side (the semantic.py guard — they can never flag).

    Eval suites are small BY CONTRACT (thousands of rows, not a
    corpus) — both methods ship the benchmark to the tasks and scan
    the corpus once, |corpus|·|bench| comparisons with no shuffle:

    - ``method="pairs"``: broadcast nested-loop join, pure Column
      cosine — fully SQL-replayable (the ann_topk 'semdecon' arm).
    - ``method="gemm"``: the at-scale path (the knn_join_gemm
      precedent) — the benchmark collects into ONE normalized numpy
      matrix (guarded by ``max_bench_rows``) and each Arrow batch
      scores against it as a single BLAS matmul; parity-tested
      against "pairs" on the rounded values.
    """
    from cod_stats_spark.operators.similarity import dot, norm

    bench_vec_col = bench_vec_col or vec_col
    if method == "pairs":
        b = F.broadcast(
            benchmark.select(
                F.col(bench_vec_col).cast("array<double>").alias("_bv")
            )
        )
        v, bv = F.col("_v"), F.col("_bv")
        raw = dot(v, bv) / (norm(v) * norm(bv))
        cos = F.round(
            F.when(
                (norm(v) * norm(bv) > 0) & ~F.isnan(raw), raw
            ).otherwise(F.lit(0.0)),
            6,
        )
        return (
            corpus.select(
                F.col(id_col).alias("doc_id"),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
            .crossJoin(b)
            .select("doc_id", cos.alias("_c"))
            .groupBy("doc_id")
            .agg(F.max("_c").alias("max_cosine"))
            .filter(F.col("max_cosine") >= F.lit(float(threshold)))
        )
    if method != "gemm":
        raise ValueError(f"unknown method: {method!r} (pairs|gemm)")

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = benchmark.select(
        F.col(bench_vec_col).cast("array<double>").alias("_bv")
    ).limit(max_bench_rows + 1).collect()
    if len(rows) > max_bench_rows:
        raise ValueError(
            f"semantic_contaminated_docs: benchmark exceeds "
            f"max_bench_rows={max_bench_rows} — an eval suite this "
            "large should be chunked, not silently truncated"
        )
    # NULL benchmark rows drop (they score 0 against everything on
    # the pairs path — dropping is equivalent); benchmark rows with
    # DIFFERING lengths are malformed and raise loudly — anchoring
    # the matrix to whichever length a nondeterministic collect
    # returned first would silently zero out the rest and let
    # contaminated docs through (r13 second review)
    bvecs = [r["_bv"] for r in rows if r["_bv"] is not None]
    bdims = sorted({len(v) for v in bvecs})
    if len(bdims) > 1:
        raise ValueError(
            "semantic_contaminated_docs: benchmark embeddings have "
            f"mixed lengths {bdims} — a ragged eval suite is malformed, "
            "fix it rather than letting one length win arbitrarily"
        )
    bdim = bdims[0] if bdims else 0

    id_field = corpus.schema[id_col]
    schema = T.StructType(
        [
            T.StructField("doc_id", id_field.dataType),
            T.StructField("max_cosine", T.DoubleType()),
        ]
    )
    if not bvecs or not bdim:
        # empty eval suite: a no-op like "pairs" — and no reason to
        # scan the corpus at all (r13 second review)
        return corpus.sparkSession.createDataFrame([], schema)

    bm = np.array(bvecs, dtype=np.float64)
    bn = np.linalg.norm(bm, axis=1)
    bn[bn == 0] = np.inf  # zero-norm bench rows score 0 vs all
    bm = bm / bn[:, None]
    np.nan_to_num(bm, copy=False)
    thr = float(threshold)

    src = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # corpus rows that are NULL or of the wrong length become
            # zero rows: they score 0, the pairs-path guard — never
            # numpy's ragged-sequence task kill
            m = np.zeros((len(pdf), bdim))
            for i, v in enumerate(pdf["_v"]):
                if v is not None and len(v) == bdim:
                    m[i] = v
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = np.inf
            m = m / n[:, None]
            np.nan_to_num(m, copy=False)
            mx = np.round((m @ bm.T).max(axis=1), 6)
            out = pd.DataFrame(
                {"doc_id": pdf["doc_id"], "max_cosine": mx}
            )
            yield out[out["max_cosine"] >= thr]

    return src.mapInPandas(score_batches, schema)


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str,
    id_col: str,
    **kwargs,
) -> DataFrame:
    """Corpus rows with embedding-contaminated documents removed
    (left-anti against :func:`semantic_contaminated_docs` — same
    write-path contract as :func:`decontaminate`)."""
    flagged = semantic_contaminated_docs(
        corpus, benchmark, vec_col, id_col, **kwargs
    )
    return corpus.join(
        flagged.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )


def semantic_contamination_oracle_sql(
    threshold: float,
    corpus_src: str,
    bench_src: str,
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
) -> str:
    """DuckDB replay of the "pairs" method — (doc_id, max_cosine)
    with the same round-6-before-max rule."""
    return f"""
SELECT doc_id, max(c) AS max_cosine
FROM (
  SELECT t.{id_expr} AS doc_id,
         round(CASE WHEN list_dot_product(t.v, t.v) > 0
                     AND list_dot_product(b.bv, b.bv) > 0
               THEN list_cosine_similarity(t.v, b.bv)
               ELSE 0.0 END, 6) AS c
  FROM (SELECT {id_expr}, {vec_expr}::DOUBLE[] AS v FROM {corpus_src}) t
  CROSS JOIN (SELECT {vec_expr}::DOUBLE[] AS bv FROM {bench_src}) b
)
GROUP BY doc_id
HAVING max(c) >= {float(threshold)!r}
"""
