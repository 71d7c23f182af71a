"""Table profiling + training-shard export pipeline tests."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestProfileTable:
    def test_long_form_stats(self, spark):
        from cod_stats_spark.operators.profiling import profile_table

        df = spark.createDataFrame(
            [(1, "a", 10.0, [1]), (2, "b", 20.0, [2]), (3, None, None, None), (3, "a", 40.0, [])],
            "id long, s string, v double, arr array<int>",
        )
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert set(prof) == {"id", "s", "v", "arr"}
        assert all(r["n_rows"] == 4 for r in prof.values())

        assert prof["id"]["n_null"] == 0
        assert prof["id"]["approx_distinct"] == 3
        assert (prof["id"]["min_value"], prof["id"]["max_value"]) == ("1", "3")
        assert prof["id"]["mean"] == 2.25

        assert prof["s"]["n_null"] == 1
        assert (prof["s"]["min_value"], prof["s"]["max_value"]) == ("a", "b")
        assert prof["s"]["mean"] is None and prof["s"]["stddev"] is None

        assert prof["v"]["n_null"] == 1
        assert prof["v"]["mean"] == round((10 + 20 + 40) / 3, 6)

        # arrays: counted and cardinality-estimated, no min/max noise
        assert prof["arr"]["n_null"] == 1
        assert prof["arr"]["min_value"] is None and prof["arr"]["max_value"] is None

    def test_single_job_one_scan(self, spark):
        """The whole profile is ONE aggregate over one scan — no
        per-column jobs (that pattern kills 1000-column tables)."""
        from cod_stats_spark.operators.profiling import profile_table

        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 7).alias("m"), F.col("id").cast("string").alias("s")
        )
        plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
        # one partial+final agg pair, not one per column
        assert plan.count("HashAggregate") <= 2 or plan.count("SortAggregate") <= 2
        got = {r["column"]: r for r in profile_table(df).collect()}
        assert got["m"]["approx_distinct"] == 7
        assert got["id"]["n_null"] == 0

    def test_column_subset(self, spark):
        from cod_stats_spark.operators.profiling import profile_table

        df = spark.createDataFrame([(1, "x")], "a long, b string")
        out = profile_table(df, columns=["b"]).collect()
        assert [r["column"] for r in out] == ["b"]


class TestCompaction:
    def test_compact_fragmented_shards(self, spark, tmp_path):
        from cod_stats_spark.operators.sharding import compact_shards

        src = str(tmp_path / "fragmented")
        dest = str(tmp_path / "compacted")
        df = spark.range(2000).select(
            F.col("id"), (F.col("id") % 4).alias("shard_id")
        )
        # fragmented write: 8 tasks × 4 shards = up to 32 slivers
        df.repartition(8).write.partitionBy("shard_id").parquet(src)
        frag_files = (
            spark.read.parquet(src)
            .select(F.input_file_name().alias("f")).distinct().count()
        )
        assert frag_files > 4

        manifest = {r["shard_id"]: r for r in compact_shards(spark, src, dest).collect()}
        assert set(manifest) == {0, 1, 2, 3}
        assert all(r["n_files"] == 1 for r in manifest.values())
        assert sum(r["n_rows"] for r in manifest.values()) == 2000
        # content identical
        a = {tuple(r) for r in spark.read.parquet(src).collect()}
        b = {tuple(r) for r in spark.read.parquet(dest).collect()}
        assert a == b


class TestStreamDedupByKey:
    def test_transport_duplicates_dropped_within_watermark(self, spark, tmp_path):
        """At-least-once delivery: the same (key) rows re-delivered in a
        later micro-batch inside the watermark horizon are dropped."""
        from datetime import datetime as dt

        import uuid

        from cod_stats_spark.streaming.dedup import stream_dedup_by_key

        src = tmp_path / "in"
        def write_batch(n, rows):
            spark.createDataFrame(
                rows, "k long, ts timestamp, v double"
            ).coalesce(1).write.parquet(f"{src}/b{n}")

        write_batch(1, [(1, dt(2026, 1, 1, 10, 0, 0), 1.0),
                        (2, dt(2026, 1, 1, 10, 1, 0), 2.0)])
        stream = (
            spark.readStream.schema("k long, ts timestamp, v double")
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        )
        plan = stream_dedup_by_key(stream, ["k"], "ts", watermark="30 minutes")
        name = f"dedup_{uuid.uuid4().hex[:8]}"
        q = (plan.writeStream.outputMode("append").format("memory")
             .queryName(name).start())
        try:
            q.processAllAvailable()
            # batch 2: k=1 re-delivered (dup), k=3 genuinely new
            write_batch(2, [(1, dt(2026, 1, 1, 10, 0, 0), 1.0),
                            (3, dt(2026, 1, 1, 10, 2, 0), 3.0)])
            q.processAllAvailable()
            got = {(r["k"], r["v"]) for r in spark.table(name).collect()}
        finally:
            q.stop()
        assert got == {(1, 1.0), (2, 2.0), (3, 3.0)}

    def test_ntz_source_normalized(self, spark, tmp_path):
        """The wrapper hops NTZ through TIMESTAMP before withWatermark
        (same contract as the sessionize paths)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import uuid

        from cod_stats_spark.streaming.dedup import stream_dedup_by_key

        d = tmp_path / "ntz"
        d.mkdir()
        t0 = 1_767_225_600_000_000
        table = pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([t0, t0, t0 + 1_000_000], pa.timestamp("us")),
        })
        pq.write_table(table, str(d / "p.parquet"))
        stream = spark.readStream.schema(
            spark.read.parquet(str(d)).schema
        ).parquet(str(d))
        plan = stream_dedup_by_key(stream, ["k"], "ts", watermark="10 minutes")
        name = f"ntzdedup_{uuid.uuid4().hex[:8]}"
        q = (plan.writeStream.outputMode("append").format("memory")
             .queryName(name).start())
        try:
            q.processAllAvailable()
            got = sorted(r["k"] for r in spark.table(name).collect())
        finally:
            q.stop()
        assert got == [1, 2]


class TestTrainingExport:
    def test_export_roundtrip(self, spark, tmp_path):
        from cod_stats_spark.plans.training_export import export_training_shards

        rows = [
            (i, ("the quick brown fox jumps over the lazy dog and then "
                 "runs far away into the forest ") * (1 + i % 5))
            for i in range(60)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = str(tmp_path / "shards")
        manifest = export_training_shards(
            docs, out, token_budget=256, min_quality=0.0, salt="t"
        ).collect()
        assert manifest, "no shards written"

        written = spark.read.parquet(out)
        # every doc exactly once, with its text and token count
        assert written.count() == 60
        assert written.select("doc_id").distinct().count() == 60
        assert set(written.columns) >= {"doc_id", "text", "n_tokens", "start_offset", "shard_id"}

        # manifest matches the written table, and every shard's docs
        # START inside the shard's budget window (concat-then-split)
        by_shard = {
            r["shard_id"]: (r["n_docs"], r["n_tokens"]) for r in manifest
        }
        for r in written.collect():
            assert r["shard_id"] == r["start_offset"] // 256
        agg = {
            r["shard_id"]: (r["n"], r["t"])
            for r in written.groupBy("shard_id")
            .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
            .collect()
        }
        assert agg == by_shard

        # deterministic: same salt → identical assignment
        out2 = str(tmp_path / "shards2")
        export_training_shards(docs, out2, token_budget=256, min_quality=0.0, salt="t")
        a = {(r["doc_id"], r["shard_id"]) for r in spark.read.parquet(out).collect()}
        b = {(r["doc_id"], r["shard_id"]) for r in spark.read.parquet(out2).collect()}
        assert a == b

    def test_quality_gate_filters(self, spark, tmp_path):
        from cod_stats_spark.plans.training_export import export_training_shards

        rows = [
            (1, "a high quality document with many sensible words that "
                "should score well on the composite heuristic measure"),
            (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),  # punct bomb
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = str(tmp_path / "gated")
        export_training_shards(docs, out, token_budget=64, min_quality=0.5)
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {1}


class TestAdviceRegressions:
    def test_profile_table_skips_interval_numeric_trap(self, spark):
        """'interval day to second' startswith 'int' — it must NOT get
        avg/stddev aggregates (AnalysisException), only null-count and
        min/max."""
        from cod_stats_spark.operators.profiling import profile_table

        df = spark.sql(
            "SELECT id, make_interval(0, 0, 0, id, 0, 0, 0) AS iv"
            " FROM range(5)"
        )
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert prof["iv"]["mean"] is None and prof["iv"]["stddev"] is None
        assert prof["id"]["mean"] == 2.0

    def test_export_with_fully_filtered_gate_returns_empty_manifest(
        self, spark, tmp_path
    ):
        """A quality gate nothing survives must yield an EMPTY manifest,
        not an 'unable to infer schema' read-back crash."""
        from cod_stats_spark.plans.training_export import export_training_shards

        docs = spark.createDataFrame(
            [(1, "decent text with several words here")], "doc_id long, text string"
        )
        out = str(tmp_path / "empty_shards")
        manifest = export_training_shards(
            docs, out, token_budget=64, min_quality=1e9
        )
        assert manifest.count() == 0


def test_jsonl_export_round_trips_with_manifest(spark, tmp_path):
    """fmt='json' writes JSON-Lines shard files (the pre-training
    interchange format): every line is one JSON object, the manifest
    still describes the written bytes, and content round-trips."""
    import glob
    import json as jsonlib
    import os

    from cod_stats_spark.plans.training_export import export_training_shards

    docs = spark.createDataFrame(
        [(i, f"document number {i} with several plain words") for i in range(40)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "jsonl")
    manifest = export_training_shards(
        docs, out, token_budget=64, min_quality=0.0, fmt="json"
    )
    m = manifest.collect()
    assert sum(r["n_docs"] for r in m) == 40
    files = glob.glob(os.path.join(out, "shard_id=*", "part-*"))
    assert files
    seen = set()
    for f in files:
        with open(f) as fh:
            for line in fh:
                obj = jsonlib.loads(line)     # every line parses alone
                assert "text" in obj and "doc_id" in obj
                seen.add(obj["doc_id"])
    assert seen == set(range(40))
