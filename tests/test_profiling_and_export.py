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
