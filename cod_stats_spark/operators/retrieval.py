"""Lexical retrieval scoring: TF-IDF / BM25 over a document corpus.

The training-data uses: relevance-filtering a crawl against a topic
query set, scoring documents for curriculum mixing, and lexical
retrieval baselines next to the embedding ANN operators
(operators/similarity.py).

Scale shape (100 TB corpus):

- ``doc_term_freqs`` explodes tokens once → one shuffle keyed on
  (doc, term) with map-side combine; doc lengths ride along in the
  same pass (no second scan).
- ``idf_table`` is a term-keyed aggregate of the DTF — output is the
  vocabulary, orders of magnitude smaller than the corpus.
- ``bm25_scores`` filters the DTF to the query's terms FIRST (an
  isin over a driver-side list — pushes into the scan of a persisted
  DTF table), broadcasts the matching idf rows, and sums per doc.
  Cost scales with documents containing query terms, never the
  corpus.

Tokenization reuses functions/text.py (lower + whitespace), so
retrieval agrees with dedup/quality on what a "word" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import words


def doc_term_freqs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc id, term, tf, doc_len): term frequencies + document length
    in ONE pass (explode → count, with the length computed per row
    before the explode and carried through the aggregate via first).

    The one-element explode is a Generate barrier (same trick as the
    shingle pipeline, operators/dedup.py): ``words()`` is an
    interpreted higher-order filter, and referencing it from both
    ``size()`` and the token ``explode`` — or letting the Generate
    re-evaluate its generator per emitted row — turns tokenization
    O(len) into O(len·tokens) per document (measured 8× on the DTF
    build at sf0.1)."""
    toks = words(F.lower(F.col(text_col)))
    pinned = docs.select(
        F.col(id_col),
        F.explode(F.array(toks)).alias("_toks"),
    )
    exploded = pinned.select(
        F.col(id_col),
        F.size("_toks").alias("_len"),
        F.explode("_toks").alias("term"),
    )
    return exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("_len").alias("doc_len"),
    )


def idf_table(dtf: DataFrame, n_docs: int, id_col: str = "doc_id") -> DataFrame:
    """(term, df, idf) with the BM25+ smoothed idf:
    ln(1 + (N − df + 0.5)/(df + 0.5)) — always positive, stable for
    terms present in most documents."""
    return dtf.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    ).select(
        "term",
        "df",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )


def bm25_scores(
    dtf: DataFrame,
    idf: DataFrame,
    query_terms: list[str],
    avg_doc_len: float,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc id, score): BM25 of each document against the query term
    list, descending-score ordering left to the caller. Documents
    sharing no term with the query never appear (and never shuffle)."""
    terms = [t.lower() for t in query_terms]
    matched = dtf.filter(F.col("term").isin(terms))
    scored = matched.join(F.broadcast(idf.filter(F.col("term").isin(terms))), "term")
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(float(avg_doc_len)))
    contrib = F.col("idf") * (tf * (k1 + 1.0)) / denom
    return scored.groupBy(id_col).agg(
        F.round(F.sum(contrib), 6).alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked result sets (the standard
    way to combine lexical BM25 with embedding ANN results without
    score calibration): each input must carry ``(id_col, rank)`` with
    rank starting at 1; fused score = Σ 1/(k + rank), summed over the
    lists the id appears in. Inputs are top-k lists (small) — the
    union + aggregate is trivially cheap at any corpus scale.
    """
    if not ranked_lists:
        raise ValueError("rrf_fuse requires at least one ranked list")
    tagged = None
    for df in ranked_lists:
        part = df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("_rr"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    return tagged.groupBy(id_col).agg(
        F.round(F.sum("_rr"), 6).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )


def bm25_rank_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    dtf: DataFrame | None = None,
) -> DataFrame:
    """Fully LAZY BM25 top-k with ranks: (doc id, score,
    n_matched_terms, rank), rank 1..k by (score desc, id asc).

    Unlike :func:`bm25_topk` this runs NO driver action: the corpus
    stats (N, avg doc length) join in as a broadcast one-row aggregate,
    so the whole retrieval is a single Catalyst plan — composable into
    gates/pipelines, and the production shape when the index is built
    and queried in one job. Scores are rounded to 6 dp BEFORE ranking
    so the ordering is reproducible across engines (cross-engine float
    sums agree to well beyond 6 dp; ranking on raw doubles would let a
    1-ulp disagreement flip near-ties).

    Scale: cost after the DTF build is ∝ documents containing query
    terms; the final top-k is TakeOrderedAndProject (per-partition
    heaps) + a k-row window for the rank column — no global sort.

    ``dtf``: pass a PREBUILT (ideally persisted) ``doc_term_freqs``
    table to share the index across queries — this one plan consumes
    the DTF three ways (doc lengths, vocabulary df, term matching),
    and without a materialized input each consumer re-runs the
    explode+shuffle. One query is fine lazy; a query SET should build
    the DTF once (the production posture is the same: the DTF is the
    index table you persist).
    """
    from pyspark.sql import Window

    terms = [t.lower() for t in query_terms]
    if dtf is None:
        dtf = doc_term_freqs(docs, text_col, id_col)
    doclens = dtf.groupBy(id_col).agg(F.first("doc_len").alias("doc_len"))
    stats = doclens.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("doc_len").alias("_avg_len"),
    )
    df_counts = dtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        df_counts.filter(F.col("term").isin(terms))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    matched = (
        dtf.filter(F.col("term").isin(terms))
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
    )
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("doc_len") / F.col("_avg_len"))
    contrib = F.col("idf") * (tf * (k1 + 1.0)) / denom
    scored = matched.groupBy(id_col).agg(
        F.round(F.sum(contrib), 6).alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w))


def bm25_rank_multi(
    docs: DataFrame,
    queries,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    dtf: DataFrame | None = None,
) -> DataFrame:
    """Rank a SET of term queries in ONE scoring pass:
    (tag, doc id, score, rank 1..k per tag).

    ``queries``: mapping of tag → term list. The per-query math is
    identical to :func:`bm25_rank_topk`; the difference is plan shape:
    the query set becomes a broadcast (tag, term) table joined into a
    single DTF traversal, so N queries cost one pass over the matched
    postings instead of N — the batch-retrieval shape (topic filtering
    against a query battery, RRF input generation).

    Top-k per tag is two-stage like knn_join: a per-partition
    row_number prunes to ≤ k rows per (tag, partition) BEFORE the
    exchange — the per-tag window never funnels every matching doc
    through one task. Both stages rank by (score desc, id asc) on the
    6-dp-rounded score, so the prune is lossless and the order
    reproduces across engines.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    if dtf is None:
        dtf = doc_term_freqs(docs, text_col, id_col)
    # dedupe (tag, term): the pairs table is JOINED, so a duplicated
    # term in one query's list would double-count its posting rows —
    # bm25_rank_topk's isin() filter is duplicate-immune and the two
    # paths must score identically
    pairs = sorted(
        {
            (tag, t.lower())
            for tag, terms in queries.items()
            for t in terms
        }
    )
    all_terms = sorted({t for _, t in pairs})
    qterms = F.broadcast(spark.createDataFrame(pairs, "tag string, term string"))
    doclens = dtf.groupBy(id_col).agg(F.first("doc_len").alias("doc_len"))
    stats = doclens.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("doc_len").alias("_avg_len"),
    )
    idf = (
        dtf.filter(F.col("term").isin(all_terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    matched = (
        dtf.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(idf), "term")
        .join(qterms, "term")
        .crossJoin(F.broadcast(stats))
    )
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("doc_len") / F.col("_avg_len"))
    contrib = F.col("idf") * (tf * (k1 + 1.0)) / denom
    scored = matched.groupBy("tag", id_col).agg(
        F.round(F.sum(contrib), 6).alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    order = [F.col("score").desc(), F.col(id_col).asc()]
    local = Window.partitionBy("tag", F.spark_partition_id()).orderBy(*order)
    pruned = (
        scored.withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    final = Window.partitionBy("tag").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """One-shot convenience: build DTF + IDF from the corpus and return
    the top-k docs for ``query``. For repeated queries, materialize
    ``doc_term_freqs``/``idf_table`` once (the index) and call
    ``bm25_scores`` directly — that is the production path."""
    dtf = doc_term_freqs(docs, text_col, id_col)
    stats = dtf.groupBy(id_col).agg(F.first("doc_len").alias("doc_len"))
    agg = stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avg_len")
    ).first()
    n_docs, avg_len = int(agg["n"]), float(agg["avg_len"] or 0.0) or 1.0
    idf = idf_table(dtf, n_docs, id_col)
    out = bm25_scores(
        dtf, idf, query.split(), avg_len, id_col, k1, b
    )
    return out.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
