"""Unit tests for the generic operator library on tiny in-memory frames."""

from __future__ import annotations

import pyspark.sql.functions as F

from cod_stats_spark.operators import (
    interval_join,
    run_lengths,
    sessionize,
    top_k,
    top_k_per_group,
)
from cod_stats_spark.operators.interval_join import bucketized_interval_join
from cod_stats_spark.operators.rolling import cumulative_frames, rolling_frames
from cod_stats_spark.operators.streaks import longest_runs


class TestSessionize:
    def test_gap_boundary_inclusive(self, spark):
        # gap of EXACTLY threshold starts a new session (reference >=)
        df = spark.createDataFrame(
            [("p", 0), ("p", 100), ("p", 100 + 600), ("p", 100 + 600 + 599)],
            "k string, ts long",
        )
        out = sessionize(df, "ts", ["k"], gap_seconds=600)
        nums = [r["session_number"] for r in out.orderBy("ts").collect()]
        assert nums == [1, 1, 2, 2]

    def test_first_row_always_new(self, spark):
        df = spark.createDataFrame([("a", 5), ("b", 7)], "k string, ts long")
        out = sessionize(df, "ts", ["k"], gap_seconds=10)
        assert all(r["session_number"] == 1 for r in out.collect())
        ids = {r["session_id"] for r in out.collect()}
        assert ids == {"a_1", "b_1"}

    def test_timestamp_microsecond_exactness(self, spark):
        df = spark.createDataFrame(
            [("p", "2024-01-01 00:00:00"), ("p", "2024-01-01 00:30:00")],
            "k string, ts string",
        ).select("k", F.col("ts").cast("timestamp").alias("ts"))
        out = sessionize(df, "ts", ["k"], gap_seconds=1800)  # delta == gap
        nums = sorted(r["session_number"] for r in out.collect())
        assert nums == [1, 2]


class TestTopK:
    def test_deterministic_ties(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 10), (4, 5)], "id long, v long"
        )
        out = top_k(df, [("v", True), ("id", False)], 2).collect()
        assert [(r["id"], r["v"]) for r in out] == [(1, 10), (2, 10)]

    def test_top_k_per_group(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 5), ("a", 2, 9), ("a", 3, 9), ("b", 4, 1)],
            "g string, id long, v long",
        )
        out = top_k_per_group(df, ["g"], [("v", True), ("id", True)], 1).collect()
        got = {(r["g"], r["id"]) for r in out}
        assert got == {("a", 3), ("b", 4)}  # tie broken by id desc? no: id True=desc


class TestStreaks:
    def test_run_lengths(self, spark):
        seq = ["W", "W", "L", "W", "W", "W", "L"]
        df = spark.createDataFrame(
            [("p", i, v) for i, v in enumerate(seq)], "k string, t long, v string"
        )
        runs = run_lengths(df, ["k"], ["t"], "v")
        per = (
            runs.groupBy("k", "v", "run_grp")
            .count()
            .groupBy("v")
            .agg(F.max("count").alias("m"))
        )
        got = {r["v"]: r["m"] for r in per.collect()}
        assert got == {"W": 3, "L": 1}

    def test_longest_runs_topk(self, spark):
        seq = ["W", "W", "L", "W", "W", "W"]
        df = spark.createDataFrame(
            [("p", i, v) for i, v in enumerate(seq)], "k string, t long, v string"
        )
        out = longest_runs(df, ["k"], ["t"], "v", k=1).collect()
        got = {(r["v"]): r["run_length"] for r in out}
        assert got == {"W": 3, "L": 1}


class TestIntervalJoin:
    def test_overlapping_intervals_fan_out(self, spark):
        fact = spark.createDataFrame([(1, 5), (2, 15)], "id long, ts long")
        iv = spark.createDataFrame(
            [("all", 0, 100), ("low", 0, 9)], "name string, start long, end long"
        )
        out = interval_join(fact, iv, "ts", "start", "end")
        got = {(r["id"], r["name"]) for r in out.collect()}
        assert got == {(1, "all"), (1, "low"), (2, "all")}

    def test_inclusive_end(self, spark):
        fact = spark.createDataFrame([(1, 9)], "id long, ts long")
        iv = spark.createDataFrame([("x", 0, 9)], "name string, start long, end long")
        assert interval_join(fact, iv, "ts", "start", "end").count() == 1
        assert (
            interval_join(fact, iv, "ts", "start", "end", inclusive_end=False).count() == 0
        )

    def test_bucketized_matches_broadcast(self, spark):
        fact = spark.createDataFrame(
            [(i, i * 7) for i in range(50)], "id long, ts long"
        )
        iv = spark.createDataFrame(
            [("a", 0, 100), ("b", 50, 200), ("c", 301, 320)],
            "name string, start long, end long",
        )
        bc = {
            (r["id"], r["name"])
            for r in interval_join(fact, iv, "ts", "start", "end").collect()
        }
        bk = {
            (r["id"], r["name"])
            for r in bucketized_interval_join(fact, iv, "ts", "start", "end", 16).collect()
        }
        assert bc == bk

    def test_bucketized_negative_epochs(self, spark):
        # pre-1970 timestamps: cast-truncation would misalign buckets
        # across sides; floor-bucketing must keep these rows matched
        fact = spark.createDataFrame(
            [(1, -95), (2, -17), (3, -1), (4, 3)], "id long, ts long"
        )
        iv = spark.createDataFrame(
            [("neg", -100, -10), ("span", -5, 5)], "name string, start long, end long"
        )
        bc = {
            (r["id"], r["name"])
            for r in interval_join(fact, iv, "ts", "start", "end").collect()
        }
        bk = {
            (r["id"], r["name"])
            for r in bucketized_interval_join(fact, iv, "ts", "start", "end", 16).collect()
        }
        assert bc == bk and ((1, "neg") in bk) and ((3, "span") in bk)


class TestRolling:
    def test_frames_match_pandas(self, spark):
        import pandas as pd

        pdf = pd.DataFrame(
            {"k": ["a"] * 6, "t": range(6), "v": [1.0, 2, 4, 8, 16, 32]}
        )
        df = spark.createDataFrame(pdf)
        out = rolling_frames(df, ["k"], ["t"], [("v", "sum")], preceding=2, suffix="r3")
        out = cumulative_frames(out, ["k"], ["t"], [("v", "sum")])
        got = out.orderBy("t").toPandas()
        exp_roll = pdf["v"].rolling(3, min_periods=1).sum()
        exp_cume = pdf["v"].cumsum()
        assert list(got["v_sum_r3"]) == list(exp_roll)
        assert list(got["v_sum_cume"]) == list(exp_cume)

    def test_time_frames_match_pandas(self, spark):
        """RANGE frame over irregular timestamps == pandas time-based
        rolling: rows inside [t - 60s, t], NOT a fixed row count."""
        import pandas as pd

        from cod_stats_spark.operators.rolling import rolling_time_frames

        ts = pd.to_datetime(
            ["2026-01-01 10:00:00", "2026-01-01 10:00:10", "2026-01-01 10:00:50",
             "2026-01-01 10:01:05", "2026-01-01 10:05:00"]
        )
        pdf = pd.DataFrame({"k": ["a"] * 5, "ts": ts, "v": [1.0, 2, 4, 8, 16]})
        df = spark.createDataFrame(pdf)
        out = rolling_time_frames(
            df, ["k"], "ts", [("v", "sum"), ("v", "count")], window_seconds=60
        )
        got = out.orderBy("ts").toPandas()
        exp = pdf.set_index("ts")["v"].rolling("60s").sum()
        assert list(got["v_sum_last60s"]) == list(exp)
        # 10:01:05 sees 10:00:10 (55s back) and 10:00:50, not 10:00:00
        assert list(got["v_count_last60s"]) == [1, 2, 3, 3, 1]

    def test_time_frames_ntz_input(self, spark, tmp_path):
        """RANGE frames work on NTZ parquet (epoch ordering via the
        shared helper)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from cod_stats_spark.operators.rolling import rolling_time_frames

        t0 = 1_767_225_600_000_000
        d = tmp_path / "ev"
        d.mkdir()
        pq.write_table(
            pa.table({
                "k": pa.array([1, 1, 1], pa.int64()),
                "ts": pa.array([t0, t0 + 30_000_000, t0 + 120_000_000],
                               pa.timestamp("us")),
                "v": pa.array([1.0, 2.0, 4.0], pa.float64()),
            }),
            str(d / "p.parquet"),
        )
        df = spark.read.parquet(str(d))
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        out = rolling_time_frames(df, ["k"], "ts", [("v", "sum")], window_seconds=60)
        got = [r["v_sum_last60s"] for r in out.orderBy("ts").collect()]
        assert got == [1.0, 3.0, 4.0]


class TestAsofJoin:
    def test_basic_and_tolerance(self, spark):
        from cod_stats_spark.operators.asof_join import asof_join

        left = spark.createDataFrame(
            [(1, 100, "e1"), (1, 205, "e2"), (2, 50, "e3")],
            "k long, ts long, eid string",
        )
        right = spark.createDataFrame(
            [(1, 90, 9.0), (1, 200, 20.0), (3, 10, 1.0)],
            "k long, rts long, price double",
        )
        out = asof_join(left, right, ["k"], "ts", "rts", ["price"])
        got = {r["eid"]: r["price"] for r in out.collect()}
        assert got == {"e1": 9.0, "e2": 20.0, "e3": None}  # no right rows for k=2

        tol = asof_join(left, right, ["k"], "ts", "rts", ["price"], tolerance_seconds=10)
        got_tol = {r["eid"]: r["price"] for r in tol.collect()}
        assert got_tol == {"e1": 9.0, "e2": 20.0, "e3": None}
        tol2 = asof_join(left, right, ["k"], "ts", "rts", ["price"], tolerance_seconds=4)
        got_tol2 = {r["eid"]: r["price"] for r in tol2.collect()}
        assert got_tol2 == {"e1": None, "e2": None, "e3": None}

    def test_equal_ts_is_match(self, spark):
        from cod_stats_spark.operators.asof_join import asof_join

        left = spark.createDataFrame([(1, 100, "e")], "k long, ts long, eid string")
        right = spark.createDataFrame([(1, 100, 5.0)], "k long, rts long, price double")
        r = asof_join(left, right, ["k"], "ts", "rts", ["price"]).first()
        assert r["price"] == 5.0

    def test_right_tiebreak_deterministic(self, spark):
        from cod_stats_spark.operators.asof_join import asof_join

        # 20 right rows at the SAME ts, shuffled over many partitions:
        # the greatest seq must win every run
        left = spark.createDataFrame([(1, 100, "e")], "k long, ts long, eid string")
        right = spark.createDataFrame(
            [(1, 50, s, float(s)) for s in range(20)],
            "k long, rts long, seq long, price double",
        ).repartition(8)
        for _ in range(3):
            r = asof_join(
                left, right, ["k"], "ts", "rts", ["price"], right_tiebreak="seq"
            ).first()
            assert r["price"] == 19.0


class TestDeterministicSampling:
    def test_stable_under_repartition(self, spark):
        from cod_stats_spark.operators.sampling import deterministic_sample

        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        a = {r["id"] for r in deterministic_sample(df, "id", 0.3).collect()}
        b = {r["id"] for r in deterministic_sample(df.repartition(13), "id", 0.3).collect()}
        assert a == b
        assert 0.25 < len(a) / 2000 < 0.35

    def test_salt_draws_independent_sample(self, spark):
        from cod_stats_spark.operators.sampling import deterministic_sample

        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        a = {r["id"] for r in deterministic_sample(df, "id", 0.3).collect()}
        c = {r["id"] for r in deterministic_sample(df, "id", 0.3, salt="x").collect()}
        assert a != c

    def test_stratified_rates(self, spark):
        from cod_stats_spark.operators.sampling import stratified_sample

        rows = [(i, "big" if i % 2 else "small") for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, grp string")
        out = stratified_sample(df, "id", "grp", {"big": 0.1}, default_fraction=1.0)
        got = out.groupBy("grp").count().collect()
        by = {r["grp"]: r["count"] for r in got}
        assert by["small"] == 2000          # default 1.0 keeps everything
        assert 120 < by["big"] < 280        # ~10% of 2000


class TestWeightedSample:
    def test_matches_python_reference_and_is_stable(self, spark):
        """A-ES sample == the same formula computed in plain Python,
        and identical across repartitionings."""
        import hashlib
        import math

        rows = [(f"d{i}", float(1 + (i % 10))) for i in range(200)]
        df = spark.createDataFrame(rows, "id string, w double")
        from cod_stats_spark.operators.sampling import weighted_sample

        got = {r["id"] for r in weighted_sample(df, "id", "w", n=20, salt="s").collect()}

        def es_key(key, w):
            u = (int(hashlib.md5((key + "s").encode()).hexdigest()[:13], 16) + 1.0) / (1 << 52)
            return math.pow(u, 1.0 / w)

        exp = {k for k, _ in sorted(rows, key=lambda r: (-es_key(r[0], r[1]), r[0]))[:20]}
        assert got == exp

        again = {
            r["id"]
            for r in weighted_sample(df.repartition(7), "id", "w", n=20, salt="s").collect()
        }
        assert again == got

    def test_weights_bias_inclusion(self, spark):
        """Across independent salts, heavy rows appear far more often
        than light rows (10x weight ratio)."""
        from cod_stats_spark.operators.sampling import weighted_sample

        rows = [(f"h{i}", 10.0) for i in range(50)] + [(f"l{i}", 1.0) for i in range(50)]
        df = spark.createDataFrame(rows, "id string, w double")
        heavy = light = 0
        for salt in ("a", "b", "c", "d"):
            got = [r["id"] for r in weighted_sample(df, "id", "w", n=20, salt=salt).collect()]
            heavy += sum(1 for i in got if i.startswith("h"))
            light += sum(1 for i in got if i.startswith("l"))
        assert heavy > 3 * light

    def test_nonpositive_weights_excluded(self, spark):
        from cod_stats_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 0.0), ("c", -2.0)], "id string, w double"
        )
        got = {r["id"] for r in weighted_sample(df, "id", "w", n=10).collect()}
        assert got == {"a"}


class TestAssignSplits:
    def test_fractions_and_determinism(self, spark):
        from cod_stats_spark.operators.sampling import assign_splits

        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        out = assign_splits(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
        by = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
        assert set(by) == {"train", "val", "test"}
        assert sum(by.values()) == 5000        # every row gets a split
        assert 3800 < by["train"] < 4200
        again = assign_splits(
            df.repartition(17), "id", {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        assert {(r["id"], r["split"]) for r in again.collect()} == {
            (r["id"], r["split"]) for r in out.collect()
        }

    def test_append_stability(self, spark):
        """New rows never move old rows between splits: assignment is a
        pure per-row hash, so the split of a doc is stable as the
        corpus grows (the property that keeps eval sets frozen)."""
        from cod_stats_spark.operators.sampling import assign_splits

        small = spark.createDataFrame([(i,) for i in range(1000)], "id long")
        big = spark.createDataFrame([(i,) for i in range(3000)], "id long")
        a = {(r["id"], r["split"]) for r in assign_splits(small, "id").collect()}
        b = {(r["id"], r["split"]) for r in assign_splits(big, "id").collect()}
        assert a <= b

    def test_group_leakage_guard(self, spark):
        """With group_col, every row of a group lands in ONE split —
        the guard that keeps near-dup clusters out of both train and
        eval at once."""
        from cod_stats_spark.operators.sampling import assign_splits

        rows = [(i, f"g{i % 40}") for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, grp string")
        out = assign_splits(
            df, "id", {"train": 0.6, "val": 0.2, "test": 0.2}, group_col="grp"
        )
        per_group = (
            out.groupBy("grp").agg(F.countDistinct("split").alias("n")).collect()
        )
        assert all(r["n"] == 1 for r in per_group)
        # and more than one split is actually populated across groups
        assert out.select("split").distinct().count() > 1


class TestMixtureSample:
    def _docs(self, spark):
        rows = []
        i = 0
        for dom, n, size in (("web", 3000, 10), ("code", 600, 10), ("wiki", 300, 10)):
            for _ in range(n):
                rows.append((i, dom, size))
                i += 1
        return spark.createDataFrame(rows, "id long, dom string, toks long")

    def test_exact_proportions_without_budget(self, spark):
        """No budget -> largest corpus at the target mixture: the
        binding domain is kept (nearly) whole, the rest thin to
        match."""
        from cod_stats_spark.operators.sampling import mixture_sample

        df = self._docs(spark)
        out = mixture_sample(
            df, "id", "dom", {"web": 0.5, "code": 0.3, "wiki": 0.2}, size_col="toks"
        )
        by = {r["dom"]: r["count"] for r in out.groupBy("dom").count().collect()}
        # binding domain: code (600/0.3=2000 < web 3000/0.5=6000, wiki 300/0.2=1500)
        # -> wiki binds: S=1500; expect web 750, code 450, wiki 300
        assert by["wiki"] == 300                     # scarcest kept whole
        assert 600 < by["web"] < 900
        assert 360 < by["code"] < 540

    def test_budget_caps_and_drops(self, spark):
        from cod_stats_spark.operators.sampling import mixture_sample

        df = self._docs(spark)
        out = mixture_sample(
            df, "id", "dom", {"web": 0.5, "code": 0.5}, size_col="toks",
            budget=20000,
        )
        by = {r["dom"]: r["count"] for r in out.groupBy("dom").count().collect()}
        assert "wiki" not in by                      # outside the target mixture
        assert by["code"] == 600                     # short domain kept whole
        assert 800 < by["web"] < 1200                # 10000/30000 of web mass

    def test_deterministic_under_repartition(self, spark):
        from cod_stats_spark.operators.sampling import mixture_sample

        df = self._docs(spark)
        w = {"web": 0.6, "code": 0.4}
        a = {r["id"] for r in mixture_sample(df, "id", "dom", w).collect()}
        b = {r["id"] for r in mixture_sample(df.repartition(13), "id", "dom", w).collect()}
        assert a == b and a


class TestPacking:
    def _toks(self, spark, counts):
        return spark.createDataFrame(
            [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tokens long"
        )

    def test_tape_is_contiguous_and_deterministic(self, spark):
        from cod_stats_spark.operators.packing import pack_sequences

        df = self._toks(spark, [10, 20, 30, 40, 50, 5, 15, 25])
        out = pack_sequences(df, "n_tokens", budget=64).collect()
        rows = sorted(out, key=lambda r: r["start_offset"])
        # offsets are an exact prefix sum of tokens in tape order
        acc = 0
        for r in rows:
            assert r["start_offset"] == acc
            assert r["shard_id"] == acc // 64
            acc += r["n_tokens"]
        # partitioning-independent: same assignment from 1 partition
        again = pack_sequences(
            df.repartition(1), "n_tokens", budget=64
        ).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    def test_ffd_respects_budget(self, spark):
        from cod_stats_spark.operators.packing import pack_ffd

        counts = [500, 300, 300, 200, 100, 100, 90, 10, 2000]
        out = pack_ffd(
            self._toks(spark, counts), "n_tokens", budget=512, num_buckets=2
        ).collect()
        fill: dict[tuple, int] = {}
        for r in out:
            key = (r["bucket"], r["bin_in_bucket"])
            fill[key] = fill.get(key, 0) + r["n_tokens"]
        for key, tot in fill.items():
            members = [
                r["n_tokens"]
                for r in out
                if (r["bucket"], r["bin_in_bucket"]) == key
            ]
            # oversize doc sits alone in its bin; packed bins fit budget
            if max(members) > 512:
                assert len(members) == 1
            else:
                assert tot <= 512
        assert len(out) == len(counts)

    def test_ffd_keeps_string_ids(self, spark):
        """Round-4 regression: a blanket bigint cast silently nulled
        non-integer ids — uuid-keyed corpora must survive intact."""
        from cod_stats_spark.operators.packing import pack_ffd

        rows = [(f"doc-{i:03d}", (i + 1) * 100) for i in range(9)]
        df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
        out = pack_ffd(df, "n_tokens", budget=512, num_buckets=2).collect()
        assert len(out) == len(rows)
        assert dict(pack_ffd(df, "n_tokens", budget=512).dtypes)["id"] == "string"
        ids = {r["id"] for r in out}
        assert ids == {f"doc-{i:03d}" for i in range(9)}
        assert all(r["id"] is not None for r in out)

    def test_manifest_covers_all_tokens(self, spark):
        from cod_stats_spark.operators.packing import (
            pack_sequences,
            shard_manifest,
        )

        df = self._toks(spark, list(range(1, 40)))
        packed = pack_sequences(df, "n_tokens", budget=100)
        man = shard_manifest(packed).collect()
        assert sum(r["n_tokens"] for r in man) == sum(range(1, 40))
        assert sum(r["n_docs"] for r in man) == 39


class TestSharding:
    def test_fixed_size_shards_exact(self, spark):
        from cod_stats_spark.operators.sharding import assign_shards_fixed_size

        df = spark.range(0, 257).withColumnRenamed("id", "doc_id")
        out = assign_shards_fixed_size(df, "doc_id", shard_size=64).collect()
        sizes: dict[int, int] = {}
        for r in out:
            sizes[r["shard_id"]] = sizes.get(r["shard_id"], 0) + 1
            assert r["shard_id"] == r["row_idx"] // 64
        assert sorted(sizes.keys()) == [0, 1, 2, 3, 4]
        assert [sizes[s] for s in range(5)] == [64, 64, 64, 64, 1]
        # global row_idx is a permutation of 0..256
        assert sorted(r["row_idx"] for r in out) == list(range(257))

    def test_mod_shards_deterministic_and_spread(self, spark):
        from cod_stats_spark.operators.sharding import assign_shards_mod

        df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["shard_id"] for r in assign_shards_mod(df, "doc_id", 8).collect()}
        b = {r["doc_id"]: r["shard_id"] for r in assign_shards_mod(df.repartition(5), "doc_id", 8).collect()}
        assert a == b
        counts = [list(a.values()).count(s) for s in range(8)]
        assert min(counts) > 60  # roughly uniform, all shards used
        # different salt reshuffles
        c = {r["doc_id"]: r["shard_id"] for r in assign_shards_mod(df, "doc_id", 8, salt="v2").collect()}
        assert c != a

    def test_write_shards_layout(self, spark, tmp_path):
        import os

        from cod_stats_spark.operators.sharding import (
            assign_shards_mod,
            write_shards,
        )

        df = assign_shards_mod(
            spark.range(0, 200).withColumnRenamed("id", "doc_id"), "doc_id", 4
        )
        path = str(tmp_path / "shards")
        write_shards(df, path)
        dirs = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
        assert dirs == [f"shard_id={i}" for i in range(4)]
        back = spark.read.parquet(path)
        assert back.count() == 200


class TestSpreadProbe:
    """The r6 spread() rewrite: width probes must stay driver-side
    (no physical planning) and make the right repartition call."""

    def test_parse_bytes_suffixes(self):
        from cod_stats_spark.operators._util import _parse_bytes

        assert _parse_bytes("134217728b") == 128 * 1024 * 1024
        assert _parse_bytes("128MB") == 128 * 1024 * 1024
        assert _parse_bytes("128m") == 128 * 1024 * 1024
        assert _parse_bytes("1g") == 1 << 30
        assert _parse_bytes("512k") == 512 * 1024
        assert _parse_bytes("1000") == 1000

    def test_scan_width_estimate_matches_actual(self, spark, tmp_path):
        from cod_stats_spark.operators._util import _estimated_scan_width

        p = str(tmp_path / "t.parquet")
        spark.range(1000).write.parquet(p)
        df = spark.read.parquet(p)
        w = _estimated_scan_width(df)
        assert abs(w - df.rdd.getNumPartitions()) <= 1

    def test_scan_width_estimate_packs_many_tiny_files(self, spark, tmp_path):
        """The r7 open-cost fix: thousands-of-tiny-files inputs pack
        into FEWER partitions than one-per-file (Spark bin-packs by
        size + openCostInBytes); the estimate must track the real
        width within ±1, not over-count and skip a useful
        repartition."""
        from cod_stats_spark.operators._util import _estimated_scan_width

        p = str(tmp_path / "tiny.parquet")
        # 200 one-row files, each a few hundred bytes
        spark.range(200).repartition(200).write.parquet(p)
        df = spark.read.parquet(p)
        actual = df.rdd.getNumPartitions()
        est = _estimated_scan_width(df)
        assert abs(est - actual) <= 1
        # and the packing really did collapse the file count
        assert actual < len(df.inputFiles())

    def test_scan_width_none_for_local_relations(self, spark):
        from cod_stats_spark.operators._util import _estimated_scan_width

        df = spark.createDataFrame([(1,), (2,)], "x long")
        assert _estimated_scan_width(df) is None

    def test_spread_widens_narrow_scan_and_respects_existing_repartition(
        self, spark, tmp_path
    ):
        from cod_stats_spark.operators._util import spread

        p = str(tmp_path / "narrow.parquet")
        spark.range(100).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        target = spark.sparkContext.defaultParallelism
        widened = spread(df)
        assert widened.rdd.getNumPartitions() >= min(target, 100) or target == 1
        # an explicit repartition in the plan must short-circuit the
        # probe (no second shuffle stacked on top)
        again = spread(widened)
        plan = again._jdf.queryExecution().analyzed().toString()
        assert plan.count("Repartition") == 1

    def test_spread_still_widens_after_explicit_coalesce(self, spark, tmp_path):
        """coalesce(1) prints as 'Repartition 1, false' — the plan
        check must not mistake an explicitly NARROW plan for a wide
        one (code-review r6 finding)."""
        from cod_stats_spark.operators._util import spread

        p = str(tmp_path / "c1.parquet")
        spark.range(500).write.parquet(p)
        df = spark.read.parquet(p).coalesce(1)
        target = spark.sparkContext.defaultParallelism
        if target <= 1:
            return
        assert spread(df).rdd.getNumPartitions() > 1


class TestMaterialize:
    """Adaptive silver-layer materialization (_util.materialize): the
    persist branch must be byte-identical to a plain persist (bench
    plan signatures depend on it), the scratch branch must round-trip
    through parquet with identical rows, and the decision must follow
    estimate x expansion vs heap."""

    def _df(self, spark, tmp_path):
        p = str(tmp_path / "m.parquet")
        spark.range(1000).selectExpr(
            "id", "repeat('x', 100) as payload"
        ).write.parquet(p)
        return spark.read.parquet(p)

    def test_small_input_persists(self, spark, tmp_path):
        from cod_stats_spark.operators._util import materialize

        df = self._df(spark, tmp_path)
        out = materialize(df, expansion=1.0, label="t")
        assert out.storageLevel.useMemory  # persist branch taken
        assert out.count() == 1000
        out.unpersist()

    def test_big_input_routes_to_scratch(self, spark, tmp_path):
        from cod_stats_spark.operators._util import materialize

        df = self._df(spark, tmp_path)
        # absurd expansion forces the scratch branch on any heap
        out = materialize(df, expansion=1e12, label="t")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" not in plan
        assert "Relation" in plan  # parquet read-back
        got = {(r["id"], r["payload"]) for r in out.collect()}
        want = {(r["id"], r["payload"]) for r in df.collect()}
        assert got == want

    def test_non_file_input_falls_back_to_persist(self, spark):
        from cod_stats_spark.operators._util import materialize

        df = spark.createDataFrame([(i,) for i in range(10)], "id long")
        out = materialize(df, expansion=1e12, label="t")
        assert out.count() == 10  # unknown estimate -> safe persist path
        out.unpersist()
