"""Bucketed layout for the incremental lexical dedup index
(streaming/dedup.py, r11): Hive-partitioned fingerprint/band trees,
statically pruned probes (PartitionFilters), the _LAYOUT marker
contract, legacy flat-tree fallback, and replay idempotence over the
partitioned layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep green forest to hide from the hunters"
)
NOVEL = (
    "a genuinely novel document mentioning broadcast joins bloom "
    "filters and partition pruning tricks at terabyte scale"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBucketedIndexLayout:
    def test_index_trees_are_hive_partitioned(self, spark, tmp_path):
        """Appends land under pb= directories; the _LAYOUT marker
        records the bucket counts chosen at creation."""
        from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        dedup_batch_against_corpus(
            spark, _docs(spark, [(1, BASE), (2, NOVEL)]),
            "text", "doc_id", corpus, index,
            threshold=0.6, fp_buckets=8, band_buckets=16,
        ).collect()
        assert os.path.exists(os.path.join(index, "_LAYOUT.fp8.bh16"))
        fp_dirs = [
            n for n in os.listdir(os.path.join(index, "fingerprints"))
            if n.startswith("pb=")
        ]
        band_dirs = [
            n for n in os.listdir(os.path.join(index, "bands"))
            if n.startswith("pb=")
        ]
        assert fp_dirs and band_dirs
        assert all(0 <= int(n[3:]) < 8 for n in fp_dirs)
        assert all(0 <= int(n[3:]) < 16 for n in band_dirs)
        # the partition column reads back and matches the bucket rule
        fps = spark.read.parquet(os.path.join(index, "fingerprints"))
        bad = fps.where(
            F.col("pb")
            != F.pmod(F.xxhash64(F.col("fp")), F.lit(8)).cast("int")
        )
        assert bad.count() == 0

    def test_probe_plan_has_partition_filters(self, spark, tmp_path):
        """The probe-side scan prunes on the partition column as a
        PartitionFilter (static, provable), not a post-scan row
        filter — the write_lsh_index assertion template."""
        from cod_stats_spark.streaming.dedup import (
            BANDS_SCHEMA,
            FP_SCHEMA,
            _pruned_index,
            dedup_batch_against_corpus,
        )

        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        dedup_batch_against_corpus(
            spark, _docs(spark, [(1, BASE), (2, NOVEL)]),
            "text", "doc_id", corpus, index,
            threshold=0.6, fp_buckets=8, band_buckets=16,
        ).collect()
        fp_probe = _pruned_index(
            spark, os.path.join(index, "fingerprints"), FP_SCHEMA, 8, [1, 3]
        )
        plan = fp_probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "pb" in plan.split("PartitionFilters", 1)[1][:200]
        band_probe = _pruned_index(
            spark, os.path.join(index, "bands"), BANDS_SCHEMA, 16, [2]
        )
        plan = band_probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "pb" in plan.split("PartitionFilters", 1)[1][:200]

    def test_bucketed_results_match_contract(self, spark, tmp_path):
        """Same dedup decisions as the flat layout: exact + near dups
        of the corpus die, novel docs survive, across batches."""
        from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        out1 = {
            r["doc_id"]
            for r in dedup_batch_against_corpus(
                spark, _docs(spark, [(1, BASE), (2, BASE), (3, NOVEL)]),
                "text", "doc_id", corpus, index,
                threshold=0.6, fp_buckets=4, band_buckets=4,
            ).collect()
        }
        assert out1 == {1, 3}
        out2 = {
            r["doc_id"]
            for r in dedup_batch_against_corpus(
                spark,
                _docs(
                    spark,
                    [
                        (10, BASE),  # exact dup of corpus 1
                        (11, BASE.replace("hunters", "wolves")),  # near dup
                        (12, "entirely fresh words about watermarks and "
                             "stateful streaming aggregation semantics"),
                    ],
                ),
                "text", "doc_id", corpus, index, threshold=0.6,
            ).collect()
        }
        assert out2 == {12}
        kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert kept == {1, 3, 12}

    def test_bucket_count_mismatch_rejected(self, spark, tmp_path):
        """Probing under a different bucket count than the tree was
        built with would silently hide history — refuse it."""
        from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        dedup_batch_against_corpus(
            spark, _docs(spark, [(1, BASE)]), "text", "doc_id",
            corpus, index, fp_buckets=8, band_buckets=8,
        ).collect()
        with pytest.raises(ValueError, match="fp_buckets"):
            dedup_batch_against_corpus(
                spark, _docs(spark, [(2, NOVEL)]), "text", "doc_id",
                corpus, index, fp_buckets=16, band_buckets=8,
            )
        # None = follow the tree's own layout — allowed
        dedup_batch_against_corpus(
            spark, _docs(spark, [(2, NOVEL)]), "text", "doc_id",
            corpus, index,
        ).collect()

    def test_legacy_flat_tree_still_probes_and_appends(self, spark, tmp_path):
        """A pre-r11 flat index (no _LAYOUT marker, files at the tree
        root) keeps working: full-scan probes, flat appends, correct
        decisions — no mixed layout is ever written."""
        from cod_stats_spark.functions.text import fingerprint
        from cod_stats_spark.operators.dedup import minhash_band_keys
        from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        seed = _docs(spark, [(1, BASE)])
        seed.write.parquet(corpus)
        seed.select(
            F.col("doc_id").alias("id"),
            fingerprint(F.col("text")).alias("fp"),
            F.lit(None).cast("long").alias("b"),
        ).write.parquet(os.path.join(index, "fingerprints"))
        minhash_band_keys(seed, "text", "doc_id", 32, 16, 3).withColumn(
            "b", F.lit(None).cast("long")
        ).write.parquet(os.path.join(index, "bands"))

        out = {
            r["doc_id"]
            for r in dedup_batch_against_corpus(
                spark,
                _docs(
                    spark,
                    [(10, BASE), (11, BASE.replace("hunters", "wolves")),
                     (12, NOVEL)],
                ),
                "text", "doc_id", corpus, index, threshold=0.6,
            ).collect()
        }
        assert out == {12}
        # appends stayed flat: no pb= dirs, no layout marker appeared
        assert not any(
            n.startswith("pb=")
            for n in os.listdir(os.path.join(index, "fingerprints"))
        )
        assert not any(n.startswith("_LAYOUT") for n in os.listdir(index))

    def test_bootstrap_equals_sequential_ingestion(self, spark, tmp_path):
        """build_dedup_index over an existing corpus must leave a
        probe-equivalent index to having driven the same docs through
        incremental batches: an identical follow-up batch gets the
        same survivors against either history."""
        from cod_stats_spark.streaming.dedup import (
            build_dedup_index,
            dedup_batch_against_corpus,
        )

        docs = [(1, BASE), (2, NOVEL)]
        # history A: sequential ingestion
        ca, ia = str(tmp_path / "ca"), str(tmp_path / "ia")
        for i, (did, txt) in enumerate(docs):
            dedup_batch_against_corpus(
                spark, _docs(spark, [(did, txt)]),
                "text", "doc_id", ca, ia,
                threshold=0.6, batch_id=i,
                fp_buckets=8, band_buckets=8,
            ).collect()
        # history B: the same corpus written by a batch job, bootstrapped
        cb, ib = str(tmp_path / "cb"), str(tmp_path / "ib")
        _docs(spark, docs).write.parquet(cb)
        counts = build_dedup_index(
            spark, cb, "text", "doc_id", ib,
            fp_buckets=8, band_buckets=8,
        )
        assert counts["fingerprints"] == 2 and counts["bands"] > 0
        probe = _docs(
            spark,
            [(10, BASE),                       # exact dup of shipped 1
             (11, BASE + " slightly changed"),  # near dup of shipped 1
             (12, "completely different words about maritime law and "
                  "container shipping logistics in the baltic sea")],
        )
        got = []
        for c, i in ((ca, ia), (cb, ib)):
            got.append({
                r["doc_id"]
                for r in dedup_batch_against_corpus(
                    spark, probe, "text", "doc_id", c, i,
                    threshold=0.6, batch_id=50,
                ).collect()
            })
        assert got[0] == got[1] == {12}

    def test_bootstrap_guards(self, spark, tmp_path):
        """Refuses a LIVE index (ingested batches would be erased) and
        a legacy flat tree; a rerun over a partial bootstrap repairs
        it (overwrite semantics, no duplicated rows)."""
        from cod_stats_spark.streaming.dedup import (
            build_dedup_index,
            dedup_batch_against_corpus,
        )

        corpus = str(tmp_path / "c")
        _docs(spark, [(1, BASE), (2, NOVEL)]).write.parquet(corpus)
        idx = str(tmp_path / "i")
        first = build_dedup_index(spark, corpus, "text", "doc_id", idx)
        again = build_dedup_index(spark, corpus, "text", "doc_id", idx)
        assert first == again  # rerun = repair, not double
        # live index: one incremental batch with a batch id
        live_c, live_i = str(tmp_path / "lc"), str(tmp_path / "li")
        dedup_batch_against_corpus(
            spark, _docs(spark, [(5, NOVEL)]), "text", "doc_id",
            live_c, live_i, threshold=0.6, batch_id=0,
        ).collect()
        with pytest.raises(ValueError, match="LIVE"):
            build_dedup_index(spark, corpus, "text", "doc_id", live_i)
        # legacy flat tree WITH data: the live-data guard fires first
        # (flat rows are ingested history too — r11 review)
        flat = str(tmp_path / "flat")
        os.makedirs(os.path.join(flat, "fingerprints"))
        spark.createDataFrame(
            [(1, "aa", None)], "id long, fp string, b long"
        ).write.mode("overwrite").parquet(
            os.path.join(flat, "fingerprints")
        )
        with pytest.raises(ValueError, match="LIVE"):
            build_dedup_index(spark, corpus, "text", "doc_id", flat)
        # data-free legacy dirs (no _LAYOUT marker): the layout
        # refusal names the real problem
        empty_flat = str(tmp_path / "empty_flat")
        os.makedirs(os.path.join(empty_flat, "fingerprints"))
        with pytest.raises(ValueError, match="legacy flat"):
            build_dedup_index(spark, corpus, "text", "doc_id", empty_flat)

    def test_sketch_params_fixed_for_index_lifetime(self, spark, tmp_path):
        """The _SKETCH marker records (num_hashes, bands, shingle_n)
        at creation; probing under DIFFERENT sketch params would
        silently never collide with history (the bucket-count hazard
        class, r11 review) — refuse instead."""
        from cod_stats_spark.streaming.dedup import (
            build_dedup_index,
            dedup_batch_against_corpus,
        )

        corpus = str(tmp_path / "c")
        _docs(spark, [(1, BASE)]).write.parquet(corpus)
        idx = str(tmp_path / "i")
        build_dedup_index(
            spark, corpus, "text", "doc_id", idx, num_hashes=32, bands=16
        )
        assert any(
            n.startswith("_SKETCH.h32.b16.s3") for n in os.listdir(idx)
        )
        with pytest.raises(ValueError, match="sketch"):
            dedup_batch_against_corpus(
                spark, _docs(spark, [(9, NOVEL)]), "text", "doc_id",
                corpus, idx, num_hashes=16, bands=8, batch_id=0,
            )
        # matching params proceed
        dedup_batch_against_corpus(
            spark, _docs(spark, [(9, NOVEL)]), "text", "doc_id",
            corpus, idx, num_hashes=32, bands=16, batch_id=0,
        ).collect()

    def test_bootstrap_refuses_batch_populated_index(self, spark, tmp_path):
        """batch_id=None ingestion writes no markers at all — the
        bootstrap must still detect the data files and refuse to
        overwrite them (r11 review: the _APPLIED-only guard missed
        this path)."""
        from cod_stats_spark.streaming.dedup import (
            build_dedup_index,
            dedup_batch_against_corpus,
        )

        corpus, idx = str(tmp_path / "c"), str(tmp_path / "i")
        dedup_batch_against_corpus(
            spark, _docs(spark, [(1, BASE)]), "text", "doc_id",
            corpus, idx, threshold=0.6,  # no batch_id -> no markers
        ).collect()
        with pytest.raises(ValueError, match="LIVE"):
            build_dedup_index(spark, corpus, "text", "doc_id", idx)

    def test_replay_idempotent_over_partitioned_layout(self, spark, tmp_path):
        """The r10 at-least-once guard holds over pb= partitions: a
        replayed batch id recomputes the same survivors and does not
        double the index."""
        from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

        corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
        dedup_batch_against_corpus(
            spark, _docs(spark, [(1, BASE)]), "text", "doc_id",
            corpus, index, threshold=0.6, batch_id=0,
            fp_buckets=4, band_buckets=4,
        ).collect()
        b2 = _docs(spark, [(10, BASE), (12, NOVEL)])
        first = {
            r["doc_id"]
            for r in dedup_batch_against_corpus(
                spark, b2, "text", "doc_id", corpus, index,
                threshold=0.6, batch_id=1,
            ).collect()
        }
        replay = {
            r["doc_id"]
            for r in dedup_batch_against_corpus(
                spark, b2, "text", "doc_id", corpus, index,
                threshold=0.6, batch_id=1,
            ).collect()
        }
        assert first == replay == {12}
        fps = spark.read.parquet(os.path.join(index, "fingerprints"))
        assert sorted(r["id"] for r in fps.collect()) == [1, 12]
