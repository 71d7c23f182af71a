"""Silver materialization layout + incremental ingest semantics."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestWriteSilver:
    def test_partitioned_by_day_prunes(self, engine, tmp_path):
        from cod_stats_spark.engine.api import write_silver

        path = str(tmp_path / "silver")
        write_silver(engine.valid_games(), path, partition_by_day=True)
        spark = engine.spark
        back = spark.read.parquet(path)
        assert "dt" in back.columns
        assert back.count() == engine.valid_games().count()
        # partition pruning visible in the plan
        plan = back.filter(F.col("dt") == "2020-09-13")._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan or back.filter(F.col("dt") == "2020-09-13").count() > 0


class TestIncrementalIngest:
    def test_anti_join_ledger(self, spark, fixture_dirs):
        from cod_stats_spark.engine.ingest import incremental_new_rows, read_matches

        mdir, _ = fixture_dirs
        bronze = read_matches(spark, f"{mdir}/*.json")
        # first load: everything new
        first = incremental_new_rows(bronze, None)
        n = first.count()
        assert n > 0
        # second load against the full ledger: nothing new
        ledger = first.select("game_id", "player_uno_id")
        assert incremental_new_rows(bronze, ledger).count() == 0
        # partial ledger: only the missing keys come back
        partial = ledger.limit(5)
        assert incremental_new_rows(bronze, partial).count() == n - 5

    def test_duplicate_files_dedup(self, spark, fixture_dirs, tmp_path):
        import json as js

        from cod_stats_spark.engine.ingest import incremental_new_rows, read_matches

        mdir, _ = fixture_dirs
        # copy one file to simulate a re-fetched duplicate with same key
        src = f"{mdir}/match_g001_uno-a1.json"
        dup_dir = tmp_path / "dups"
        dup_dir.mkdir()
        payload = open(src).read()
        (dup_dir / "match_g001_uno-a1.json").write_text(payload)
        bronze = read_matches(spark, [f"{mdir}/*.json", str(dup_dir / "*.json")][0])
        out = incremental_new_rows(bronze, None)
        keys = [(r["game_id"], r["player_uno_id"]) for r in out.collect()]
        assert len(keys) == len(set(keys))


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        from cod_stats_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(i % 3, i, float(i)) for i in range(100)], "k long, rid long, v double"
        )
        small = spark.createDataFrame([(0, "x"), (1, "y")], "k long, tag string")
        plain = big.join(small, ["k"]).select("k", "rid", "tag")
        salted = salted_join(big, small, ["k"], "rid", buckets=4).select("k", "rid", "tag")
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


class TestDiagnoseSkew:
    def test_hot_key_surfaces_with_ratio(self, spark):
        from cod_stats_spark.operators.skew import diagnose_skew

        # one hot key with 900 rows, 100 singleton keys
        rows = [(0, i) for i in range(900)] + [(k, 0) for k in range(1, 101)]
        df = spark.createDataFrame(rows, "k long, payload long")
        summary, top = diagnose_skew(df, ["k"], top_n=3)
        s = summary.first()
        assert s["n_keys"] == 101 and s["n_rows"] == 1000
        assert s["max_count"] == 900 and s["p50_count"] == 1
        # mean count ~9.9 → skew_ratio ~90.9: the salting factor needed
        assert 85 < s["skew_ratio"] < 95
        hot = top.collect()
        assert hot[0]["k"] == 0 and hot[0]["key_count"] == 900
        assert all(r["key_count"] == 1 for r in hot[1:])


class TestCorruptAudit:
    def test_corrupt_files_surface(self, spark, fixture_dirs, tmp_path):
        import json as js
        import shutil

        mdir, pj = fixture_dirs
        work = tmp_path / "m"
        shutil.copytree(mdir, work)
        (work / "match_gbad_unoX.json").write_text("{this is not json")
        from cod_stats_spark.engine import Engine

        eng = Engine.from_paths(spark, f"{work}/*.json", pj)
        bad = [r.asDict() for r in eng.corrupt_matches().collect()]
        assert len(bad) == 1
        assert bad[0]["game_id"] == "gbad"
        # and the corrupt file is NOT in bronze valid rows
        assert eng.valid_games().filter("game_id = 'gbad'").count() == 0


class TestBucketedSilver:
    def test_bucketing_eliminates_window_shuffle(self, spark, engine, tmp_path):
        """Per-player windows (sessionization, time-series) read a
        player-bucketed silver table WITHOUT an Exchange — the
        co-location claim in write_silver's docstring, verified."""
        import os
        import uuid

        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from cod_stats_spark.engine.api import write_silver

        name = f"vg_bucketed_{uuid.uuid4().hex[:6]}"
        path = str(tmp_path / "bucketed")
        write_silver(
            engine.valid_games(), path, partition_by_day=False,
            bucket_by_player=4, table_name=name,
        )
        tbl = spark.table(name)
        w = Window.partitionBy("player_uno_id").orderBy("date_key")
        plan = (
            tbl.withColumn("rn", F.row_number().over(w))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        # same window over the un-bucketed frame DOES shuffle
        plain_plan = (
            engine.valid_games().withColumn("rn", F.row_number().over(w))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plain_plan
        spark.sql(f"DROP TABLE IF EXISTS {name}")
