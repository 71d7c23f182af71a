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


def test_funnel_with_splits(spark, tmp_path):
    """splits= writes per-split shard trees: every cleaned doc lands in
    exactly one split, per-split counts sum to the cleaned corpus, the
    manifest carries the split column, and the on-disk trees are
    disjoint; assignment is deterministic across reruns."""
    import glob
    import os

    from cod_stats_spark.plans.curation import curate_corpus

    rows = [
        (i, f"document number {i} with plenty of reasonable english text "
            "about the quick brown fox and the lazy dog crossing town")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "curated_splits")
    splits = {"train": 0.7, "val": 0.15, "test": 0.15}
    manifest, stats = curate_corpus(
        docs, None, out, min_quality=0.2, token_budget=64, splits=splits
    )
    cleaned = stats["after_decontamination"]
    per = {k[len("split_"):]: v for k, v in stats.items() if k.startswith("split_")}
    assert set(per) == set(splits)
    assert sum(per.values()) == cleaned
    assert set(
        r["split"] for r in manifest.select("split").distinct().collect()
    ) <= set(splits)
    # disjoint trees on disk, doc ids never shared between splits
    seen: dict[int, str] = {}
    for name in splits:
        files = glob.glob(os.path.join(out, f"split={name}", "**", "*.parquet"),
                          recursive=True)
        if per[name] == 0:
            continue
        assert files
        ids = {r["doc_id"] for r in spark.read.parquet(
            os.path.join(out, f"split={name}")).select("doc_id").collect()}
        assert len(ids) == per[name]
        for i in ids:
            assert i not in seen, f"doc {i} in {seen.get(i)} and {name}"
            seen[i] = name
    assert len(seen) == cleaned

    # deterministic: rerun assigns identical splits
    out2 = str(tmp_path / "curated_splits2")
    _, stats2 = curate_corpus(
        docs, None, out2, min_quality=0.2, token_budget=64, splits=splits
    )
    assert {k: v for k, v in stats2.items() if k.startswith("split_")} == {
        f"split_{k}": v for k, v in per.items()
    }
