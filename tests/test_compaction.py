"""State-tree compaction (streaming/compaction.py, r11): N batches of
appends collapse to <=1 file per partition, probe decisions and replay
tags survive, crash residue (duplicated rows) converges, markers are
never touched."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep green forest to hide from the hunters"
)


def _parquet_files(root):
    out = []
    for r, _d, names in os.walk(root):
        out.extend(
            os.path.join(r, n)
            for n in names
            if not n.startswith(("_", "."))
        )
    return out


def _novel(i: int) -> str:
    return (
        f"document number {i} talks about topic {i * 37 % 101} and "
        f"subject {i * 53 % 97} in entirely distinct terms {i}"
    )


class TestCompactDedupIndex:
    def _drive(self, spark, tmp_path, n_batches=4, per_batch=3):
        from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        for b in range(n_batches):
            rows = [
                (b * per_batch + i, _novel(b * per_batch + i))
                for i in range(per_batch)
            ]
            dedup_batch_against_corpus(
                spark,
                spark.createDataFrame(rows, "doc_id long, text string"),
                "text", "doc_id", corpus, index,
                threshold=0.6, batch_id=b,
                fp_buckets=4, band_buckets=4,
            ).collect()
        return corpus, index

    def test_file_count_bounded_and_probes_unchanged(self, spark, tmp_path):
        from cod_stats_spark.streaming import compact_dedup_index
        from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

        corpus, index = self._drive(spark, tmp_path)
        fp_dir = os.path.join(index, "fingerprints")
        bands_dir = os.path.join(index, "bands")
        before_rows = sorted(
            tuple(r)
            for r in spark.read.parquet(fp_dir)
            .select("id", "fp", "b", "pb").collect()
        )
        assert len(_parquet_files(fp_dir)) > 4  # one file per batch/bucket

        out = compact_dedup_index(spark, index)
        assert out["fingerprints"]["files_after"] < out["fingerprints"][
            "files_before"
        ]
        # <= 1 file per pb= partition directory
        for root in (fp_dir, bands_dir):
            for d in os.listdir(root):
                if d.startswith("pb="):
                    files = [
                        n
                        for n in os.listdir(os.path.join(root, d))
                        if not n.startswith(("_", "."))
                    ]
                    assert len(files) <= 1, (root, d, files)
        # rows identical (b replay tags included)
        after_rows = sorted(
            tuple(r)
            for r in spark.read.parquet(fp_dir)
            .select("id", "fp", "b", "pb").collect()
        )
        assert after_rows == before_rows
        # markers preserved
        assert any(n.startswith("_LAYOUT") for n in os.listdir(index))
        assert any(n.startswith("_APPLIED") for n in os.listdir(index))
        # the next batch still probes correctly: dup of doc 0 dies,
        # novel survives — and a REPLAYED earlier batch stays idempotent
        nxt = spark.createDataFrame(
            [(100, _novel(0)), (101, "totally new words never seen before "
                                     "anywhere in this corpus at all")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]
            for r in dedup_batch_against_corpus(
                spark, nxt, "text", "doc_id", corpus, index,
                threshold=0.6, batch_id=99,
            ).collect()
        }
        assert got == {101}

    def test_crash_residue_duplicates_converge(self, spark, tmp_path):
        """A crash between the compacted append and the old-file
        deletes leaves rows duplicated; the probe is unaffected and
        the next compaction collapses them (dropDuplicates)."""
        from cod_stats_spark.streaming import compact_state_tree
        from cod_stats_spark.streaming.dedup import FP_SCHEMA

        _corpus, index = self._drive(spark, tmp_path, n_batches=2)
        fp_dir = os.path.join(index, "fingerprints")
        clean = sorted(
            tuple(r) for r in spark.read.parquet(fp_dir).collect()
        )
        # simulate the crash: append a full copy (the compacted files
        # landed, the deletes never ran)
        spark.read.parquet(fp_dir).write.mode("append").partitionBy(
            "pb"
        ).parquet(fp_dir)
        assert spark.read.parquet(fp_dir).count() == 2 * len(clean)
        compact_state_tree(spark, fp_dir, partition_col="pb")
        after = sorted(
            tuple(r) for r in spark.read.parquet(fp_dir).collect()
        )
        assert after == clean

    def test_missing_or_empty_tree_is_noop(self, spark, tmp_path):
        from cod_stats_spark.streaming import (
            compact_dedup_index,
            compact_state_tree,
        )

        assert compact_dedup_index(spark, str(tmp_path / "nope")) == {}
        os.makedirs(tmp_path / "empty")
        assert compact_dedup_index(spark, str(tmp_path / "empty")) == {}
        # and no layout marker appeared as a side effect
        assert os.listdir(tmp_path / "empty") == []
        out = compact_state_tree(spark, str(tmp_path / "nope2"))
        assert out["files_before"] == 0

    def test_already_compact_partitioned_tree_is_noop(self, spark, tmp_path):
        """The no-op check is per leaf dir: a compacted 4-bucket tree
        has 4 files total, and a second maintenance pass must NOT
        re-read and re-write the whole index for zero net change."""
        from cod_stats_spark.streaming import compact_state_tree

        p = str(tmp_path / "t")
        spark.range(100).withColumn("pb", F.col("id") % 4).repartition(
            F.col("pb")
        ).write.partitionBy("pb").parquet(p)
        names_before = sorted(_parquet_files(p))
        assert len(names_before) == 4
        out = compact_state_tree(spark, p, partition_col="pb")
        assert out == {"files_before": 4, "files_after": 4}
        # identical FILE NAMES — proof nothing was rewritten
        assert sorted(_parquet_files(p)) == names_before

    def test_mixed_schema_tree_keeps_replay_tags(self, spark, tmp_path):
        """A legacy tree whose older files lack the 'b' replay column
        must compact WITH the tags: schema inference from one b-less
        footer would silently drop the column for every row."""
        from cod_stats_spark.streaming import compact_state_tree

        p = str(tmp_path / "t")
        # legacy files first (no b), then tagged files
        spark.createDataFrame(
            [(1, "x", 0), (2, "y", 1)], "id long, fp string, pb int"
        ).repartition(F.col("pb")).write.partitionBy("pb").parquet(p)
        spark.createDataFrame(
            [(3, "z", 7, 0), (4, "w", 7, 1)],
            "id long, fp string, b long, pb int",
        ).repartition(F.col("pb")).write.mode("append").partitionBy(
            "pb"
        ).parquet(p)
        compact_state_tree(spark, p, partition_col="pb")
        rows = {
            r["id"]: r["b"]
            for r in spark.read.option("mergeSchema", "true")
            .parquet(p).collect()
        }
        assert rows == {1: None, 2: None, 3: 7, 4: 7}

    def test_target_files_gt_one_splits_partitions(self, spark, tmp_path):
        """target_files=N must produce up to N files per partition dir
        (deterministic content salt), not 1 giant file."""
        from cod_stats_spark.streaming import compact_state_tree

        p = str(tmp_path / "t")
        for _ in range(3):  # 3 appends -> 3 files per dir
            spark.range(600).withColumn(
                "pb", F.col("id") % 2
            ).repartition(F.col("pb")).write.mode("append").partitionBy(
                "pb"
            ).parquet(p)
        # distinct: the 3 identical appends are exactly the duplicate
        # residue compaction collapses
        before = sorted({tuple(r) for r in spark.read.parquet(p).collect()})
        compact_state_tree(spark, p, partition_col="pb", target_files=2)
        for d in os.listdir(p):
            if d.startswith("pb="):
                files = [
                    n
                    for n in os.listdir(os.path.join(p, d))
                    if not n.startswith(("_", "."))
                ]
                assert 1 <= len(files) <= 2, (d, files)
        assert len(_parquet_files(p)) > 2  # genuinely split, not 1 total
        after = sorted(tuple(r) for r in spark.read.parquet(p).collect())
        assert after == before  # deduped exactly, no rows lost

    def test_partial_compaction_leaves_compact_dirs_untouched(
        self, spark, tmp_path
    ):
        """When only SOME partition dirs exceed the target, the
        rewrite must scope to them — in-loop scheduled compaction
        would otherwise pay a whole-tree read+write every epoch
        (r11 review). Proof = file identity on the untouched dir."""
        from cod_stats_spark.streaming import compact_state_tree

        p = str(tmp_path / "t")
        # pb=0 compact (1 file), pb=1 fragmented (3 files)
        spark.createDataFrame(
            [(i, 0) for i in range(10)], "id long, pb int"
        ).repartition(F.col("pb")).write.partitionBy("pb").parquet(p)
        for k in range(3):
            spark.createDataFrame(
                [(100 + 10 * k + i, 1) for i in range(10)],
                "id long, pb int",
            ).repartition(F.col("pb")).write.mode("append").partitionBy(
                "pb"
            ).parquet(p)
        untouched = sorted(_parquet_files(os.path.join(p, "pb=0")))
        before_rows = sorted(
            tuple(r) for r in spark.read.parquet(p).collect()
        )
        out = compact_state_tree(spark, p, partition_col="pb")
        assert out == {"files_before": 4, "files_after": 2}
        # pb=0's file is bit-identical (same name -> never rewritten)
        assert sorted(_parquet_files(os.path.join(p, "pb=0"))) == untouched
        assert len(_parquet_files(os.path.join(p, "pb=1"))) == 1
        after_rows = sorted(
            tuple(r) for r in spark.read.parquet(p).collect()
        )
        assert after_rows == before_rows

    def test_partition_col_validation(self, spark, tmp_path):
        from cod_stats_spark.streaming import compact_state_tree

        p = str(tmp_path / "t")
        spark.range(10).withColumn("g", F.col("id") % 2).write.partitionBy(
            "g"
        ).parquet(p)
        # force >1 file so validation is reached
        spark.range(10, 20).withColumn(
            "g", F.col("id") % 2
        ).write.mode("append").partitionBy("g").parquet(p)
        with pytest.raises(ValueError, match="partition column"):
            compact_state_tree(spark, p, partition_col="wrong")


class TestScheduledCompaction:
    def test_stream_dedup_compact_every(self, spark, tmp_path):
        """compact_every=1 on the stream wrapper keeps the index at
        ≤1 file per partition dir after every epoch — the in-loop
        maintenance schedule the append-only trees need."""
        from cod_stats_spark.streaming import stream_dedup_to_corpus

        src = tmp_path / "in"
        for b in range(3):
            spark.createDataFrame(
                [(b * 2 + i, _novel(b * 2 + i)) for i in range(2)],
                "doc_id long, text string",
            ).coalesce(1).write.parquet(f"{src}/b{b}")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        q = stream_dedup_to_corpus(
            spark, stream, "text", "doc_id", corpus, index,
            checkpoint_path=str(tmp_path / "ckpt"),
            threshold=0.6, fp_buckets=4, band_buckets=4,
            compact_every=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert spark.read.parquet(corpus).count() == 6
        for sub in ("fingerprints", "bands"):
            root = os.path.join(index, sub)
            for d in os.listdir(root):
                if d.startswith("pb="):
                    files = [
                        n for n in os.listdir(os.path.join(root, d))
                        if not n.startswith(("_", "."))
                    ]
                    assert len(files) <= 1, (sub, d, files)

    def test_stream_semantic_compact_every(self, spark, tmp_path):
        from cod_stats_spark.streaming import stream_semantic_dedup

        src = tmp_path / "in"
        vecs = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [0.7, 0.7, 0.0, 0.0]),
        ]
        for i, row in enumerate(vecs):
            spark.createDataFrame(
                [row], "doc_id long, embedding array<double>"
            ).coalesce(1).write.parquet(f"{src}/b{i}")
        stream = (
            spark.readStream.schema("doc_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        state = str(tmp_path / "state")
        q = stream_semantic_dedup(
            stream, state, str(tmp_path / "out"),
            [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]],
            threshold=0.99,
            checkpoint_path=str(tmp_path / "ckpt"),
            compact_every=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        for d in os.listdir(state):
            if d.startswith("cluster="):
                files = [
                    n for n in os.listdir(os.path.join(state, d))
                    if not n.startswith(("_", "."))
                ]
                assert len(files) <= 1, (d, files)


class TestCompactSemanticState:
    def test_semantic_state_compacts_and_shipped_wins_holds(
        self, spark, tmp_path
    ):
        from cod_stats_spark.streaming import (
            compact_semantic_state,
            semantic_batch_against_corpus,
        )

        centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
        state = str(tmp_path / "state")
        for b, rows in enumerate(
            [
                [(1, [1.0, 0.0, 0.0, 0.0])],
                [(2, [0.0, 0.0, 1.0, 0.0])],
                [(3, [0.0, 1.0, 0.0, 0.0])],
            ]
        ):
            semantic_batch_against_corpus(
                spark,
                spark.createDataFrame(
                    rows, "doc_id long, embedding array<double>"
                ),
                state, centroids, threshold=0.99, batch_id=b,
            ).collect()
        out = compact_semantic_state(spark, state)
        assert out["files_after"] <= out["files_before"]
        for d in os.listdir(state):
            if d.startswith("cluster="):
                files = [
                    n
                    for n in os.listdir(os.path.join(state, d))
                    if not n.startswith(("_", "."))
                ]
                assert len(files) <= 1
        # shipped-wins still kills a near-dup of compacted history
        got = {
            r["doc_id"]
            for r in semantic_batch_against_corpus(
                spark,
                spark.createDataFrame(
                    [(9, [0.99, 0.01, 0.0, 0.0]),
                     (10, [0.0, 0.01, 0.99, 0.0])],
                    "doc_id long, embedding array<double>",
                ),
                state, centroids, threshold=0.99, batch_id=9,
            ).collect()
        }
        assert got == set()
