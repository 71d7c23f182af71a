"""Document-pipeline scale bench: synthesize N documents IN Spark
(vocab-sampled word sequences with planted near-duplicates) and time
the dedup/text/similarity operator stack.

Usage: python tools/dedup_bench.py [n_docs]
Prints one JSON line with per-stage wall seconds + result counts.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "data",
    "spark", "query", "join", "filter", "window", "stream", "batch", "table",
    "scan", "merge", "sort", "hash", "key", "value", "row", "group", "order",
    "fast", "slow", "big", "small", "line", "customer", "part", "and", "of",
]


def synth_docs(spark, n_docs: int, words_per_doc: int = 60, dup_rate: float = 0.1):
    """Deterministic docs; ~dup_rate of them are near-copies of doc i-1
    (same words, one substitution) to give the LSH something to find."""
    import pyspark.sql.functions as F

    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")

    def h(seed):
        return F.abs(F.xxhash64(F.col("doc_id"), F.lit(seed)))

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    # near-dup docs reuse the PREVIOUS doc's word seed, then we bump one word
    is_dup = (h(0) % F.lit(int(1 / dup_rate))) == 0
    seed_id = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda i: vocab[
            (F.abs(F.xxhash64(seed_id, i, F.lit(7))) % len(VOCAB)).cast("int")
        ],
    )
    words = F.when(
        is_dup, F.concat(F.slice(words, 1, words_per_doc - 1), F.array(F.lit("EDITED")))
    ).otherwise(words)
    return base.select(
        "doc_id", F.concat_ws(" ", words).alias("text")
    ).repartition(spark.sparkContext.defaultParallelism)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    import pyspark.sql.functions as F

    from cod_stats_spark.functions import text as T
    from cod_stats_spark.operators.components import dedup_clusters
    from cod_stats_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from cod_stats_spark.session import get_spark

    spark = get_spark("dedup-bench")
    docs = synth_docs(spark, n_docs).persist()
    docs.count()  # materialize the input outside the timings

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, fn):
        t0 = time.perf_counter()
        counts[name] = fn().count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {counts[name]} in {timings[name]}s", file=sys.stderr)

    run("exact_dedup", lambda: exact_dedup(docs, "text", "doc_id"))
    run("text_features", lambda: docs.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("q"),
        T.token_count_ws(F.col("text")).alias("n_tok"),
        T.fingerprint(F.col("text")).alias("fp"),
    ))
    run("minhash_pairs", lambda: minhash_lsh_pairs(docs, "text", "doc_id", 32, 16))
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", 32, 16).persist()
    pairs.count()
    run("jaccard_verify", lambda: ngram_jaccard_pairs(docs, "text", "doc_id", pairs, threshold=0.6))
    run("simhash_pairs", lambda: simhash_near_pairs(docs, "text", "doc_id", max_hamming=6))
    confirmed = ngram_jaccard_pairs(docs, "text", "doc_id", pairs, threshold=0.6)
    run("cluster_survivors", lambda: dedup_clusters(
        docs, confirmed.select("id_a", "id_b"), "doc_id"
    ).filter(F.col("is_canonical")))

    print(
        json.dumps(
            {
                "metric": "dedup_stack_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "n_docs": n_docs,
                "stages": timings,
                "counts": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
