"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM-pipeline contract (n-gram overlap decontamination, as
popularized by the GPT-3/PaLM appendices): a corpus document is
contaminated when it contains at least ``min_overlap`` distinct word
``n``-grams that also occur anywhere in the benchmark set.

Scale shape (100 TB corpus, benchmark sets are MBs–GBs):

- The benchmark side reduces to a DISTINCT n-gram set ONCE (tiny by
  construction: eval suites are orders of magnitude smaller than the
  corpus) and broadcasts.
- The corpus side explodes to (doc_id, ngram) — linear in corpus size,
  no shuffle for the join itself (broadcast hash join), one map-side-
  combined shuffle for the per-(doc, bench) overlap count.
- Nothing is ever all-pairs: docs with zero overlapping n-grams never
  leave the map side.

Set ``broadcast_benchmark=False`` if the benchmark side is too large
for a broadcast (e.g. decontaminating against another corpus) — the
join degrades gracefully to a shuffled hash join on the n-gram.

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


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    ngram_n: int = 8,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, n_overlap) for every corpus×benchmark pair
    sharing >= ``min_overlap`` distinct word n-grams."""
    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col
    corpus_grams = _ngrams(corpus, text_col, id_col, ngram_n, "doc_id")
    bench_grams = _ngrams(benchmark, bench_text_col, bench_id_col, ngram_n, "bench_id").distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (
        corpus_grams.join(bench_grams, "ngram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
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
    against the flagged id set — the write path for a clean corpus)."""
    flagged = contaminated_doc_ids(
        contamination_pairs(corpus, benchmark, text_col, id_col, **kwargs)
    )
    return corpus.join(
        flagged.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
