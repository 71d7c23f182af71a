"""End-to-end corpus curation (plans/curation.py): planted junk,
duplicates, and contamination must each die at their own stage, and
the written shards must carry exactly the survivors."""

from __future__ import annotations


def _corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a warm windowsill in the late afternoon sun with calm"
    )
    alt = (
        "distributed query engines shuffle partition and aggregate large "
        "tables across many executor cores with columnar storage formats"
    )
    rows = [
        (1, base + " extra tail one"),                       # keeper
        (2, base + " extra tail one"),                       # exact dup of 1
        (3, base + " extra tail one two"),                   # near dup of 1
        (4, alt + " unique closing words here"),             # keeper
        (5, "!!!! ???? ...."),                               # junk (quality)
        (6, "benchmark secret passage that must not leak into training at all "
            + alt),                                          # contaminated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_stages_and_written_corpus(spark, tmp_path):
    from cod_stats_spark.plans.curation import curate_corpus

    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "benchmark secret passage that must not leak into training at all")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "curated")
    manifest, stats = curate_corpus(
        docs, bench, out, min_quality=0.5, token_budget=64, decontam_ngram_n=8
    )
    assert stats["input"] == 6
    assert stats["after_quality"] == 5            # junk 5 dies
    assert stats["after_dedup"] == 3              # 2 (exact) + 3 (near) die
    assert stats["after_decontamination"] == 2    # 6 dies
    written = spark.read.parquet(out)
    assert {r["doc_id"] for r in written.select("doc_id").collect()} == {1, 4}
    assert stats["shards"] == manifest.count() >= 1
    # manifest token totals describe the bytes on disk
    m = manifest.agg({"n_docs": "sum"}).first()[0]
    assert m == 2


def test_funnel_without_benchmark(spark, tmp_path):
    from cod_stats_spark.plans.curation import curate_corpus

    docs = _corpus(spark)
    out = str(tmp_path / "curated_nb")
    _, stats = curate_corpus(docs, None, out, min_quality=0.5, token_budget=64)
    assert stats["after_decontamination"] == stats["after_dedup"] == 3
