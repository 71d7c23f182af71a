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


def test_append_equals_rebuild(spark, tmp_path):
    """Incremental curation: two sequential curate_corpus_append
    batches against a fresh state dir must keep exactly the docs the
    one-shot funnel keeps on the union (the data has no cross-batch
    transitive chains, so append == rebuild), the compacted shard
    tree must carry them with ONE global contiguous shard sequence,
    and each shard directory must compact to one file."""
    import glob
    import os

    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )

    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "benchmark secret passage that must not leak into training at all")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    kw = dict(min_quality=0.5, token_budget=64, decontam_ngram_n=8)
    # batch 1: odd ids (keeper 1 + its near-dup 3, junk 5)
    # batch 2: even ids (exact dup 2 of corpus doc 1, keeper 4, contaminated 6)
    from pyspark.sql import functions as F

    _, s1 = curate_corpus_append(
        spark, docs.filter(F.col("doc_id") % 2 == 1), bench, state, batch_id=1, **kw
    )
    _, s2 = curate_corpus_append(
        spark, docs.filter(F.col("doc_id") % 2 == 0), bench, state, batch_id=2, **kw
    )
    assert s1["after_quality"] == 2          # junk 5 dies
    assert s1["after_dedup"] == 1            # near-dup 3 dies vs 1
    assert s2["after_dedup"] == 2            # exact dup 2 dies vs state
    assert s2["after_decontamination"] == 1  # contaminated 6 dies (kept: 4)

    compacted = compact_curated_shards(spark, state)
    got = {r["doc_id"] for r in compacted.select("doc_id").collect()}

    rebuilt_out = str(tmp_path / "rebuild")
    _, _ = curate_corpus(docs, bench, rebuilt_out, **kw)
    want = {
        r["doc_id"]
        for r in spark.read.parquet(rebuilt_out).select("doc_id").collect()
    }
    assert got == want == {1, 4}

    # global contiguous shard sequence, one file per shard dir
    shard_ids = sorted(
        r["shard_id"]
        for r in compacted.select("shard_id").distinct().collect()
    )
    assert shard_ids == list(range(len(shard_ids)))
    for sd in glob.glob(os.path.join(state, "shards", "shard_id=*")):
        files = [f for f in os.listdir(sd) if f.endswith(".parquet")]
        assert len(files) == 1, f"{sd} not compacted: {files}"


def test_append_equals_rebuild_with_substring_stage(spark, tmp_path):
    """r10: the incremental funnel's ExactSubstr census stage — a >=8
    token passage whose FIRST occurrence ships in batch 1 and whose
    second arrives in batch 2 must be scrubbed from the batch-2 doc
    exactly as the one-shot funnel (keep_first=True) scrubs it. Ids
    increase across batches, so append == rebuild must hold doc for
    doc AND byte for byte on the scrubbed text."""
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, passage
            + " and the quick brown fox then runs across the quiet field"),
        (2, "a completely different document about distributed query engines "
            "that shuffle and aggregate large tables across many cores"),
        (3, "prefix words lead in here and then " + passage
            + " with trailing words to close it out"),
        (4, "another unrelated document with enough plain english words in "
            "it to pass the quality gate without any trouble at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.25, token_budget=64, substring_n=8)
    state = str(tmp_path / "state_ss")
    _, s1 = curate_corpus_append(
        spark, docs.filter("doc_id <= 2"), None, state, batch_id=1, **kw
    )
    _, s2 = curate_corpus_append(
        spark, docs.filter("doc_id > 2"), None, state, batch_id=2, **kw
    )
    assert s1["after_substring"] == 2 and s2["after_substring"] == 2
    compacted = compact_curated_shards(spark, state)
    got = {
        (r["doc_id"], r["text"])
        for r in compacted.select("doc_id", "text").collect()
    }

    out = str(tmp_path / "rebuild_ss")
    curate_corpus(docs, None, out, **kw)
    want = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert got == want
    by_id = dict(got)
    assert len(by_id) == 4
    # first-in-time occurrence stands; the cross-batch repeat is gone
    assert passage in by_id[1]
    assert passage not in by_id[3]
    # scrubbed doc keeps its non-span tokens (normalized form)
    assert "prefix words lead in here and then" in by_id[3]


def test_model_gate_stage_drops_classifier_junk(spark, tmp_path):
    """r10: the trained-classifier gate — reversed-word junk that
    PASSES the heuristic quality gate (normal lengths/punct) must die
    at the model stage, in both the one-shot and the append funnel,
    and append == rebuild with the stage on."""
    from pyspark.sql import functions as F

    from cod_stats_spark.operators.quality_classifier import (
        quality_classifier_fit,
    )
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )

    fluent = [
        (i, 1, f"the quick brown fox number {i} jumps over the lazy dog "
               "while the curious cat watches from the warm windowsill")
        for i in range(30)
    ]
    train = spark.createDataFrame(
        fluent, "doc_id long, label int, text string"
    )
    train = train.unionByName(
        train.select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.lit(0).alias("label"),
            F.reverse(F.col("text")).alias("text"),
        )
    )
    model = quality_classifier_fit(
        train, dim=1 << 10, ngrams=1, iters=12, lr=10.0
    )

    rows = [
        (1, "the small dog jumps over the brown fence while the happy "
            "cat watches from the quiet garden"),
        (2, "a different fluent document where the calm fox naps under "
            "the old tree near the warm meadow"),
        (3, "wodaem mraw eht raen eert dlo eht rednu span xof mlac"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.0, token_budget=64, qc_model=model,
              min_qc_score=0.5)

    out = str(tmp_path / "model_gated")
    _, stats = curate_corpus(docs, None, out, **kw)
    assert stats["after_quality"] == 3
    assert stats["after_model_gate"] == 2      # doc 3 dies at the model
    want = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert want == {1, 2}

    state = str(tmp_path / "model_state")
    _, s1 = curate_corpus_append(
        spark, docs.filter("doc_id <= 2"), None, state, batch_id=1, **kw
    )
    _, s2 = curate_corpus_append(
        spark, docs.filter("doc_id > 2"), None, state, batch_id=2, **kw
    )
    assert s1["after_model_gate"] == 2 and s2["after_model_gate"] == 0
    got = {
        r["doc_id"]
        for r in compact_curated_shards(spark, state)
        .select("doc_id")
        .collect()
    }
    assert got == want


def test_semantic_stage_collapses_paraphrases(spark, tmp_path):
    """r10: a paraphrase pair — different WORDS (lexical dedup can't
    see it), same embedding neighborhood — must collapse at the
    semantic stage to the farthest-from-centroid exemplar; unrelated
    docs survive."""
    from cod_stats_spark.plans.curation import curate_corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the barn",
         [1.0, 0.02, 0.0, 0.0]),
        (2, "a swift russet fox leaps above an idle hound by the stable",
         [0.97, 0.05, 0.0, 0.0]),          # paraphrase of 1
        (3, "distributed query engines shuffle and aggregate large tables",
         [0.0, 0.0, 1.0, 0.0]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    out = str(tmp_path / "semantic_gated")
    _, stats = curate_corpus(
        docs,
        None,
        out,
        min_quality=0.0,
        token_budget=64,
        semantic_centroids=[[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]],
        semantic_threshold=0.99,
    )
    assert stats["after_dedup"] == 3          # lexically all distinct
    assert stats["after_semantic"] == 2       # the paraphrase collapses
    kept = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    # doc 2 is farther from the centroid than doc 1 → 2 is the keeper
    assert kept == {2, 3}


def test_append_semantic_stage_shipped_wins(spark, tmp_path):
    """r10: the incremental funnel's SemDeDup stage — a batch-2
    paraphrase of a SHIPPED batch-1 doc dies (shipped wins, even
    though the newcomer is farther from the centroid); unrelated
    batch-2 docs survive."""
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus_append,
    )

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    rows1 = [
        (1, "the quick brown fox jumps over the lazy dog near the barn",
         [1.0, 0.02, 0.0, 0.0]),
    ]
    rows2 = [
        (2, "a swift russet fox leaps above an idle hound by the stable",
         [0.97, 0.05, 0.0, 0.0]),          # paraphrase of shipped 1
        (3, "distributed query engines shuffle and aggregate large tables",
         [0.0, 0.0, 1.0, 0.0]),
    ]
    schema = "doc_id long, text string, embedding array<double>"
    state = str(tmp_path / "state_sem")
    kw = dict(min_quality=0.0, token_budget=64,
              semantic_centroids=cents, semantic_threshold=0.99)
    _, s1 = curate_corpus_append(
        spark, spark.createDataFrame(rows1, schema), None, state,
        batch_id=1, **kw,
    )
    _, s2 = curate_corpus_append(
        spark, spark.createDataFrame(rows2, schema), None, state,
        batch_id=2, **kw,
    )
    assert s1["after_semantic"] == 1
    assert s2["after_dedup"] == 2            # lexically distinct
    assert s2["after_semantic"] == 1         # the paraphrase dies
    got = {
        r["doc_id"]
        for r in compact_curated_shards(spark, state)
        .select("doc_id")
        .collect()
    }
    assert got == {1, 3}


def test_replayed_append_epoch_is_idempotent(spark, tmp_path):
    """r10: foreachBatch is at-least-once — replaying an epoch through
    curate_corpus_append must reproduce the SAME survivors and shard
    fragments, not collide with its own first-run index rows, come
    back empty, and overwrite the fragment tree with nothing."""
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus_append,
    )

    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "benchmark secret passage that must not leak into training "
               "at all")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    kw = dict(min_quality=0.5, token_budget=64, decontam_ngram_n=8)
    from pyspark.sql import functions as F

    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    _, s1 = curate_corpus_append(spark, b1, bench, state, batch_id=1, **kw)
    # replay epoch 1 (same batch, same id)
    _, s1r = curate_corpus_append(spark, b1, bench, state, batch_id=1, **kw)
    assert s1r["after_dedup"] == s1["after_dedup"] == 1
    assert s1r["shards"] == s1["shards"] >= 1
    # the fragment tree still carries the survivors
    frag = spark.read.parquet(f"{state}/shards_frag/batch=1")
    assert {r["doc_id"] for r in frag.select("doc_id").collect()} == {1}
    # the index was not doubled: a LATER batch still dedups correctly
    _, s2 = curate_corpus_append(
        spark, docs.filter(F.col("doc_id") % 2 == 0), bench, state,
        batch_id=2, **kw,
    )
    assert s2["after_dedup"] == 2              # exact dup 2 dies vs state
    got = {
        r["doc_id"]
        for r in compact_curated_shards(spark, state).select("doc_id").collect()
    }
    assert got == {1, 4}


def test_stream_curate_to_corpus(spark, tmp_path):
    """The streaming wrapper drives the full incremental funnel per
    micro-batch: quality junk, near-dups (within and across batches),
    and contaminated docs all die; survivors land in per-epoch
    fragment shard trees that the maintenance pass compacts into one
    contiguous sequence."""
    import glob
    import json as js
    import os

    from pyspark.sql import functions as F  # noqa: F401 (parity with peers)

    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        stream_curate_to_corpus,
    )

    docs = {r[0]: r[1] for r in _corpus(spark).collect()}
    bench = spark.createDataFrame(
        [(100, "benchmark secret passage that must not leak into training at all")],
        "doc_id long, text string",
    )
    src = tmp_path / "incoming"
    src.mkdir()
    state = str(tmp_path / "state")
    # epoch 0: keeper 1, near-dup 3, junk 5; epoch 1: exact dup 2,
    # keeper 4, contaminated 6
    with open(src / "b1.json", "w") as f:
        for i in (1, 3, 5):
            f.write(js.dumps({"doc_id": i, "text": docs[i]}) + "\n")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_curate_to_corpus(
        spark, stream, bench, state, str(tmp_path / "ckpt"),
        compact_every=2,  # in-loop maintenance fires after epoch 1
        min_quality=0.5, token_budget=64, decontam_ngram_n=8,
    )
    try:
        q.processAllAvailable()
        with open(src / "b2.json", "w") as f:
            for i in (2, 4, 6):
                f.write(js.dumps({"doc_id": i, "text": docs[i]}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    frag_batches = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(state, "shards_frag", "batch=*"))
    )
    assert len(frag_batches) == 2
    # compact_every=2 ran the whole maintenance pass in-loop after
    # epoch 1: the global shard table already exists, and the dedup
    # index trees are at ≤1 file per partition dir
    inloop = spark.read.parquet(os.path.join(state, "shards"))
    assert {r["doc_id"] for r in inloop.select("doc_id").collect()} == {1, 4}
    for sub in ("fingerprints", "bands"):
        root = os.path.join(state, "index", sub)
        for d in os.listdir(root):
            if d.startswith("pb="):
                files = [
                    n for n in os.listdir(os.path.join(root, d))
                    if not n.startswith(("_", "."))
                ]
                assert len(files) <= 1, (sub, d, files)
    # the manual maintenance call stays idempotent after the in-loop one
    compacted = compact_curated_shards(spark, state)
    assert {r["doc_id"] for r in compacted.select("doc_id").collect()} == {1, 4}
    shard_ids = sorted(
        r["shard_id"] for r in compacted.select("shard_id").distinct().collect()
    )
    assert shard_ids == list(range(len(shard_ids)))


def test_compact_before_first_batch_is_a_noop(spark, tmp_path):
    """r8 ADVICE: scheduled compaction must be safe before the first
    batch lands (no fragment tree at all -> None; fragments already
    consumed but a compacted table present -> that table)."""
    from cod_stats_spark.plans.curation import compact_curated_shards

    state = str(tmp_path / "state")
    assert compact_curated_shards(spark, state) is None

    # an existing compacted tree with no fresh fragments is returned as-is
    import os

    dest = os.path.join(state, "shards")
    spark.createDataFrame(
        [(1, "kept doc", 0)], "doc_id long, text string, shard_id int"
    ).write.partitionBy("shard_id").parquet(dest)
    out = compact_curated_shards(spark, state)
    assert out is not None and out.count() == 1


def test_substring_stage_scrubs_cross_doc_boilerplate(spark, tmp_path):
    """substring_n plants an ExactSubstr stage between near-dedup and
    decontamination: boilerplate shared by otherwise-DIFFERENT docs
    (invisible to whole-doc near-dup removal) is kept at its first
    site and scrubbed from every other survivor; docs scrubbed to
    nothing die at the stage."""
    from cod_stats_spark.plans.curation import curate_corpus

    boiler = ("subscribe to our newsletter for updates terms of service "
              "apply all rights reserved contact us for more information")
    rows = [
        (1, "completely original research findings about spark engines "
            + boiler),
        (2, boiler + " a different and equally original discussion of "
            "columnar storage internals"),
        (3, boiler),                       # nothing but boilerplate: dies
        (4, "no shared passages in this document at all just plain text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    manifest, stats = curate_corpus(
        docs, None, out, min_quality=0.0, token_budget=64, substring_n=8,
    )
    assert stats["after_dedup"] == 4
    assert stats["after_substring"] == 3            # doc 3 scrubbed empty
    kept = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert set(kept) == {1, 2, 4}
    survivors_with_boiler = [d for d, t in kept.items() if "newsletter" in t]
    assert len(survivors_with_boiler) == 1          # exactly one copy kept
    assert "original research" in kept[1]
    assert "columnar storage internals" in kept[2]


class TestIncrementalShardCompaction:
    """r12: compact_curated_shards consumes each fragment batch
    exactly once (``_APPLIED.b{b}.o{o}.n{n}`` markers), continues the
    global shard sequence from the recorded tail, and rewrites only
    the NEW shard dirs — per-cycle cost proportional to new
    fragments, not corpus size."""

    KW = dict(min_quality=0.5, token_budget=64, decontam_ngram_n=8)

    def _bench(self, spark):
        return spark.createDataFrame(
            [(100, "benchmark secret passage that must not leak into "
                   "training at all")],
            "doc_id long, text string",
        )

    def _snapshot(self, root):
        """(relative path -> (size, mtime_ns)) for every parquet file."""
        import os

        out = {}
        for r, _d, names in os.walk(root):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(r, n)
                    st = os.stat(p)
                    out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
        return out

    def _markers(self, dest):
        import os

        return sorted(
            n for n in os.listdir(dest) if n.startswith("_APPLIED.")
        )

    def test_compaction_boundary_append_equals_rebuild(self, spark, tmp_path):
        """Compact after EACH batch; the two-cycle result must equal
        the one-shot compaction of both batches (same docs, same
        contiguous sequence), and cycle 2 must not touch cycle 1's
        frozen shard dirs."""
        import os

        from pyspark.sql import functions as F

        from cod_stats_spark.plans.curation import (
            compact_curated_shards,
            curate_corpus_append,
        )

        docs = _corpus(spark)
        bench = self._bench(spark)

        # two-cycle incremental posture
        state = str(tmp_path / "state_inc")
        dest = os.path.join(state, "shards")
        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == 1), bench, state,
            batch_id=1, **self.KW,
        )
        t1 = compact_curated_shards(spark, state)
        ids1 = {r["doc_id"] for r in t1.select("doc_id").collect()}
        assert ids1 == {1}
        frozen = self._snapshot(dest)
        m1 = self._markers(dest)
        assert len(m1) == 1 and m1[0].startswith("_APPLIED.b1.o0.")

        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == 0), bench, state,
            batch_id=2, **self.KW,
        )
        t2 = compact_curated_shards(spark, state)
        got = {
            (r["doc_id"], r["shard_id"])
            for r in t2.select("doc_id", "shard_id").collect()
        }

        # one-shot posture: same batches, single compaction at the end
        state_one = str(tmp_path / "state_one")
        for b, parity in ((1, 1), (2, 0)):
            curate_corpus_append(
                spark, docs.filter(F.col("doc_id") % 2 == parity), bench,
                state_one, batch_id=b, **self.KW,
            )
        want = {
            (r["doc_id"], r["shard_id"])
            for r in compact_curated_shards(spark, state_one)
            .select("doc_id", "shard_id")
            .collect()
        }
        assert got == want and {d for d, _s in got} == {1, 4}

        # contiguous global sequence from zero
        sids = sorted({s for _d, s in got})
        assert sids == list(range(len(sids)))

        # cycle 2 consumed ONLY batch 2: cycle-1 dirs byte-untouched
        after = self._snapshot(dest)
        for rel, sig in frozen.items():
            assert after[rel] == sig, f"frozen shard file rewritten: {rel}"
        assert len(self._markers(dest)) == 2

    def test_noop_rerun_and_consumed_fragments_ignored(self, spark, tmp_path):
        """A cycle with nothing new is a no-op (no marker, no file
        touched); a replayed epoch rewriting an already-consumed
        fragment dir is ignored — the marker is the consumption
        record."""
        import os

        from pyspark.sql import functions as F

        from cod_stats_spark.plans.curation import (
            compact_curated_shards,
            curate_corpus_append,
        )

        docs = _corpus(spark)
        state = str(tmp_path / "state")
        dest = os.path.join(state, "shards")
        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == 1), self._bench(spark),
            state, batch_id=1, **self.KW,
        )
        t1 = compact_curated_shards(spark, state)
        snap = self._snapshot(dest)
        markers = self._markers(dest)

        # no new fragments -> no-op returning the existing table
        t2 = compact_curated_shards(spark, state)
        assert {r["doc_id"] for r in t2.collect()} == {
            r["doc_id"] for r in t1.collect()
        }
        assert self._snapshot(dest) == snap
        assert self._markers(dest) == markers

        # replayed epoch: fragment batch=1 rewritten (identical
        # content by the funnel's replay contract) -> still ignored
        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == 1), self._bench(spark),
            state, batch_id=1, **self.KW,
        )
        compact_curated_shards(spark, state)
        assert self._snapshot(dest) == snap
        assert self._markers(dest) == markers

    def test_crash_residue_converges(self, spark, tmp_path):
        """Shard dirs written but markers missing (crash between the
        write and the marker) must converge on rerun: same offsets
        recomputed, dynamic overwrite rewrites the same dirs."""
        import os

        from pyspark.sql import functions as F

        from cod_stats_spark.plans.curation import (
            compact_curated_shards,
            curate_corpus_append,
        )

        docs = _corpus(spark)
        state = str(tmp_path / "state")
        dest = os.path.join(state, "shards")
        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == 1), self._bench(spark),
            state, batch_id=1, **self.KW,
        )
        compact_curated_shards(spark, state)
        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == 0), self._bench(spark),
            state, batch_id=2, **self.KW,
        )
        t = compact_curated_shards(spark, state)
        want = {
            (r["doc_id"], r["shard_id"])
            for r in t.select("doc_id", "shard_id").collect()
        }
        # simulate the crash: batch-2 shards landed, marker did not
        b2 = [m for m in self._markers(dest) if m.startswith("_APPLIED.b2.")]
        assert len(b2) == 1
        os.remove(os.path.join(dest, b2[0]))

        got = {
            (r["doc_id"], r["shard_id"])
            for r in compact_curated_shards(spark, state)
            .select("doc_id", "shard_id")
            .collect()
        }
        assert got == want
        assert [
            m for m in self._markers(dest) if m.startswith("_APPLIED.b2.")
        ] == b2

    def test_prune_fragments_and_full_rebuild(self, spark, tmp_path):
        """prune_fragments deletes consumed fragment dirs marker-first;
        full_rebuild=True re-derives the tree from retained fragments
        and refreshes the markers to match."""
        import os

        from pyspark.sql import functions as F

        from cod_stats_spark.plans.curation import (
            compact_curated_shards,
            curate_corpus_append,
        )

        docs = _corpus(spark)
        state = str(tmp_path / "state")
        frag = os.path.join(state, "shards_frag")
        dest = os.path.join(state, "shards")
        for b, parity in ((1, 1), (2, 0)):
            curate_corpus_append(
                spark, docs.filter(F.col("doc_id") % 2 == parity),
                self._bench(spark), state, batch_id=b, **self.KW,
            )
        t = compact_curated_shards(spark, state, prune_fragments=True)
        want = {
            (r["doc_id"], r["shard_id"])
            for r in t.select("doc_id", "shard_id").collect()
        }
        assert not any(
            n.startswith("batch=") for n in os.listdir(frag)
        ), "consumed fragment dirs not pruned"
        # pruned state still no-ops cleanly
        t2 = compact_curated_shards(spark, state, prune_fragments=True)
        assert {
            (r["doc_id"], r["shard_id"])
            for r in t2.select("doc_id", "shard_id").collect()
        } == want

        # full_rebuild needs the fragments: fresh state, keep them
        state_fr = str(tmp_path / "state_fr")
        for b, parity in ((1, 1), (2, 0)):
            curate_corpus_append(
                spark, docs.filter(F.col("doc_id") % 2 == parity),
                self._bench(spark), state_fr, batch_id=b, **self.KW,
            )
            compact_curated_shards(spark, state_fr)
        before = self._markers(os.path.join(state_fr, "shards"))
        assert len(before) == 2
        tr = compact_curated_shards(spark, state_fr, full_rebuild=True)
        assert {
            (r["doc_id"], r["shard_id"])
            for r in tr.select("doc_id", "shard_id").collect()
        } == want
        after = self._markers(os.path.join(state_fr, "shards"))
        assert len(after) == 2 and all(m.startswith("_APPLIED.b") for m in after)


def test_html_stage_zero_both_postures(spark, tmp_path):
    """r12: html_input=True runs HTML→text extraction + C4 line
    cleaning as the funnel's stage zero in BOTH postures — the same
    docs survive with the same extracted text, markup-only docs die
    at the stage, and append == rebuild holds (the stage is
    stateless)."""
    import os

    from pyspark.sql import functions as F

    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )

    body1 = ("the quick brown fox jumps over the lazy dog while the "
             "curious cat watches from a warm windowsill in the sun.")
    body2 = ("distributed query engines shuffle partition and aggregate "
             "large tables across many executor cores with columnar files.")
    rows = [
        (1, "<html><head><script>var x = 1;</script></head><body><p>"
            + body1 + "</p><p>All rights reserved.</p></body></html>"),
        (2, "<div><p>" + body2 + "</p><!-- tracking pixel --></div>"),
        (3, "<body><p>too short.</p><p>Subscribe now</p></body>"),  # dies
        (4, "<style>.x{}</style><ul><li>a plain markup shell with no "
            "sentences at all and no terminal marks</li></ul>"),    # dies
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = str(tmp_path / "one_shot")
    _, stats = curate_corpus(
        docs, None, out, min_quality=0.25, token_budget=64,
        html_input=True,
    )
    assert stats["input"] == 4 and stats["after_html"] == 2
    one_shot = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert {d for d, _t in one_shot} == {1, 2}
    by_id = dict(one_shot)
    assert by_id[1] == body1              # script + boilerplate line gone
    assert by_id[2] == body2              # comment gone, tags stripped

    state = str(tmp_path / "state")
    for b, pred in ((1, "doc_id <= 2"), (2, "doc_id > 2")):
        curate_corpus_append(
            spark, docs.filter(pred), None, state, batch_id=b,
            min_quality=0.25, token_budget=64, html_input=True,
        )
    compacted = compact_curated_shards(spark, state)
    appended = {
        (r["doc_id"], r["text"])
        for r in compacted.select("doc_id", "text").collect()
    }
    assert appended == one_shot


def test_full_rebuild_clears_stale_dirs_and_guards_pruned(spark, tmp_path):
    """r12 review: full_rebuild must DELETE the destination tree
    first — dynamic overwrite alone leaves shard dirs beyond the
    rebuilt range (stale rows mixed into the returned table) — and
    must refuse when a consumed batch's fragments were pruned (its
    shards exist only in the tree the rebuild deletes)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus_append,
    )

    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "benchmark secret passage that must not leak into "
               "training at all")],
        "doc_id long, text string",
    )
    kw = dict(min_quality=0.5, token_budget=8, decontam_ngram_n=8)
    state = str(tmp_path / "state")
    for b, parity in ((1, 1), (2, 0)):
        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == parity), bench,
            state, batch_id=b, **kw,
        )
    before = compact_curated_shards(spark, state)
    n_shards_before = before.select("shard_id").distinct().count()
    # shrink batch 2's fragments in place (the docstring's stated
    # full_rebuild use case), then rebuild: no stale dirs may survive
    frag2 = os.path.join(state, "shards_frag", "batch=2")
    import shutil

    shutil.rmtree(frag2)
    curate_corpus_append(
        spark,
        docs.filter(F.col("doc_id") == 4),
        bench,
        str(tmp_path / "scratch"),
        batch_id=2,
        **kw,
    )
    # write a smaller batch-2 fragment tree under the original state
    shutil.move(
        os.path.join(str(tmp_path / "scratch"), "shards_frag", "batch=2"),
        frag2,
    )
    rebuilt = compact_curated_shards(spark, state, full_rebuild=True)
    shard_ids = sorted(
        r["shard_id"]
        for r in rebuilt.select("shard_id").distinct().collect()
    )
    assert shard_ids == list(range(len(shard_ids)))
    assert len(shard_ids) <= n_shards_before
    dirs = sorted(
        int(n.split("=")[1])
        for n in os.listdir(os.path.join(state, "shards"))
        if n.startswith("shard_id=")
    )
    assert dirs == shard_ids, f"stale shard dirs survived: {dirs}"

    # pruned fragments -> full_rebuild refuses instead of losing data
    state2 = str(tmp_path / "state2")
    for b, parity in ((1, 1), (2, 0)):
        curate_corpus_append(
            spark, docs.filter(F.col("doc_id") % 2 == parity), bench,
            state2, batch_id=b, **kw,
        )
    compact_curated_shards(spark, state2, prune_fragments=True)
    with pytest.raises(ValueError, match="no fragments"):
        compact_curated_shards(spark, state2, full_rebuild=True)


def test_lm_gate_both_postures(spark, tmp_path):
    """r12: the CCNet LM-perplexity gate — a FIXED reference model +
    threshold drops out-of-distribution docs identically in the
    one-shot and append postures (stateless, so append == rebuild)."""
    from pyspark.sql import functions as F

    from cod_stats_spark.operators.lm_score import unigram_lm_fit
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )

    # reference model fitted on in-distribution english (the CCNet
    # posture: the model comes from a REFERENCE corpus, not the data)
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and "
             "again while the curious cat watches the quiet field")
         for i in range(5)],
        "doc_id long, text string",
    )
    model = unigram_lm_fit(ref)
    rows = [
        (1, "the quick brown fox jumps over the lazy dog while the cat "
            "watches the field"),                      # in-distribution
        (2, "the curious cat watches the quiet field while the fox "
            "jumps again"),                            # in-distribution
        (3, "zxqv flrm wqpt gkjh bnmd zzzz qqqq wwww rrrr tttt yyyy "
            "uuuu iiii oooo"),                         # OOV junk: dies
        (4, "the lazy dog jumps over the quick brown fox again and "
            "again while the cat watches"),            # in-distribution
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.0, token_budget=64,
              lm_model=model, max_lm_nll=3.5)

    out = str(tmp_path / "one")
    _, stats = curate_corpus(docs, None, out, **kw)
    assert stats["after_lm_gate"] == 3
    one = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert one == {1, 2, 4}

    state = str(tmp_path / "state")
    for b, pred in ((1, "doc_id <= 2"), (2, "doc_id > 2")):
        _, s = curate_corpus_append(
            spark, docs.filter(pred), None, state, batch_id=b, **kw
        )
    compacted = compact_curated_shards(spark, state)
    appended = {r["doc_id"] for r in compacted.select("doc_id").collect()}
    assert appended == one


def test_lm_gate_drops_tokenless_docs_and_rejects_half_config(spark, tmp_path):
    """r12 review (3rd pass): zero-token docs score a perfect 0.0 NLL
    and must NOT pass the gate; lm_model without max_lm_nll raises
    instead of silently skipping the stage."""
    import pytest

    from cod_stats_spark.operators.lm_score import unigram_lm_fit
    from cod_stats_spark.plans.curation import curate_corpus

    ref = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    model = unigram_lm_fit(ref)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "   ")],          # whitespace-only: zero tokens
        "doc_id long, text string",
    )
    out = str(tmp_path / "o")
    _, stats = curate_corpus(
        docs, None, out, min_quality=0.0,
        lm_model=model, max_lm_nll=3.0, token_budget=64,
    )
    assert stats["after_lm_gate"] == 1
    kept = {
        r["doc_id"] for r in
        spark.read.parquet(out).select("doc_id").collect()
    }
    assert kept == {1}
    with pytest.raises(ValueError, match="together"):
        curate_corpus(
            docs, None, str(tmp_path / "x"), min_quality=0.0,
            lm_model=model, token_budget=64,
        )


def test_dsir_gate_both_postures(spark, tmp_path):
    """r13: the DSIR domain-match gate — a FIXED importance model +
    threshold drops off-target docs identically in the one-shot and
    append postures (the threshold form is stateless, so
    append == rebuild); half a config raises at entry."""
    import pytest
    from pyspark.sql import functions as F

    from cod_stats_spark.operators.dsir import dsir_fit
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )

    sci = ("the experiment measured the electron energy spectrum while "
           "the detector recorded the particle decay in the chamber")
    spam = ("click here winner free prize casino jackpot buy now limited "
            "offer click click prize winner casino")
    target = spark.createDataFrame(
        [(100 + i, sci + f" run {i}") for i in range(5)],
        "doc_id long, text string",
    )
    raw = target.unionByName(
        spark.createDataFrame(
            [(200 + i, spam + f" deal {i}") for i in range(5)],
            "doc_id long, text string",
        )
    )
    model = dsir_fit(target, raw, dim=1 << 10, ngrams=1)
    rows = [
        (1, sci + " with calibration notes appended for the archive"),
        (2, sci + " and the second detector confirmed the measurement"),
        (3, spam + " unbeatable deal ends tonight"),       # off-target: dies
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.0, token_budget=64,
              dsir_model=model, min_dsir_logw=0.0)

    out = str(tmp_path / "one")
    _, stats = curate_corpus(docs, None, out, **kw)
    assert stats["after_dsir_gate"] == 2
    one = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert one == {1, 2}

    state = str(tmp_path / "state")
    for b, pred in ((1, "doc_id <= 1"), (2, "doc_id > 1")):
        curate_corpus_append(
            spark, docs.filter(pred), None, state, batch_id=b, **kw
        )
    compacted = compact_curated_shards(spark, state)
    appended = {r["doc_id"] for r in compacted.select("doc_id").collect()}
    assert appended == one

    with pytest.raises(ValueError, match="min_dsir_logw"):
        curate_corpus(docs, None, str(tmp_path / "half"), dsir_model=model)


def test_semantic_decon_stage_both_postures(spark, tmp_path):
    """r13: embedding-space decontamination — a doc whose embedding
    sits on an eval-set embedding dies in BOTH postures even though
    its WORDS share nothing with the benchmark (the case n-gram
    decontamination cannot see); stateless vs the fixed benchmark,
    so append == rebuild."""
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the barn",
         [1.0, 0.0, 0.0, 0.0]),
        (2, "distributed query engines shuffle and aggregate large tables",
         [0.0, 1.0, 0.0, 0.0]),
        # paraphrased eval item: zero word overlap with the benchmark
        # text below, embedding within the cosine threshold
        (3, "a swift russet animal vaults an idle hound beside stables",
         [0.0, 0.0, 0.99, 0.01]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    bench = spark.createDataFrame(
        [(900, "benchmark phrasing entirely different words",
          [0.0, 0.0, 1.0, 0.0])],
        "doc_id long, text string, embedding array<double>",
    )
    kw = dict(min_quality=0.0, token_budget=64,
              semantic_benchmark=bench, semantic_decon_threshold=0.95)

    out = str(tmp_path / "one")
    _, stats = curate_corpus(docs, None, out, **kw)
    assert stats["after_decontamination"] == 3
    assert stats["after_semantic_decon"] == 2
    one = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert one == {1, 2}

    # the "pairs" method must make the identical decision
    out2 = str(tmp_path / "one_pairs")
    _, stats2 = curate_corpus(
        docs, None, out2, semantic_decon_method="pairs", **{
            k: v for k, v in kw.items() if k != "semantic_decon_method"
        }
    )
    assert stats2["after_semantic_decon"] == 2

    state = str(tmp_path / "state")
    for b, pred in ((1, "doc_id <= 2"), (2, "doc_id > 2")):
        curate_corpus_append(
            spark, docs.filter(pred), None, state, batch_id=b, **kw
        )
    compacted = compact_curated_shards(spark, state)
    appended = {r["doc_id"] for r in compacted.select("doc_id").collect()}
    assert appended == one


def test_mixture_stage_rebalances_and_guards_split_leakage(spark, tmp_path):
    """r13: the temperature-mixture stage replicates low-resource
    domains after cleaning (stats gains after_mixture, shards key on
    epoch_key), and with splits every replica of a doc lands in ONE
    split (assignment hashes the original id)."""
    from collections import defaultdict

    from cod_stats_spark.plans.curation import curate_corpus

    # lexically DISTINCT docs (rotated content words) — one-token
    # variations of a template would collapse at the near-dup stage
    # and leave nothing for the mixture to rebalance
    w = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima"]
    rows = [
        (i, f"the {w[i]} report covers {w[(i+3) % 12]} metrics while "
            f"the {w[(i+5) % 12]} pipeline stage runs {w[(i+7) % 12]} "
            f"checks over the {w[(i+9) % 12]} cluster nodes", "en")
        for i in range(12)
    ] + [
        (100, "der schnelle braune fuchs springt ueber den faulen hund "
              "waehrend die graue katze vom fenster aus zuschaut", "de"),
        (101, "die alte muehle am fluss mahlt das korn des dorfes seit "
              "vielen jahren ohne eine einzige pause", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "mixed")
    _, stats = curate_corpus(
        docs, None, out,
        min_quality=0.0, token_budget=64,
        mixture_alpha=0.3, mixture_domain_col="lang", mixture_max_weight=4.0,
        splits={"train": 0.6, "val": 0.4},
    )
    # de (2 docs) must replicate, en (12) must thin — and the totals
    # must match what the written shards carry
    assert stats["after_mixture"] > 0
    written = []
    for split in ("train", "val"):
        p = f"{out}/split={split}"
        import glob
        import os

        if os.path.isdir(p) and glob.glob(f"{p}/**/*.parquet", recursive=True):
            for r in spark.read.parquet(p).select("epoch_key").collect():
                written.append((split, r["epoch_key"]))
    assert len(written) == stats["after_mixture"]
    de_copies = [k for _, k in written if k.startswith("1")
                 and int(k.split(":")[0]) >= 100]
    assert len(de_copies) > 2            # upsampled
    en_copies = [k for _, k in written if int(k.split(":")[0]) < 100]
    assert len(en_copies) < 12           # thinned
    # leakage guard: all replicas of one doc share a split
    by_doc = defaultdict(set)
    for split, k in written:
        by_doc[k.split(":")[0]].add(split)
    assert all(len(s) == 1 for s in by_doc.values())
