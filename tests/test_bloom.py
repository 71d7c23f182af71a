"""Bloom-filter membership (operators/bloom.py — the Dolma dedup
posture): no false negatives ever, measured false-positive rate near
design, OR-mergeable incremental builds, both hash members, NULL
handling, and the DuckDB replica of build + probe."""

from __future__ import annotations

import pytest

_M = 64 * 64  # 4096 bits
_K = 5


def _df(spark, vals, col="v"):
    return spark.createDataFrame([(x,) for x in vals], f"{col} string")


class TestMembership:
    def test_no_false_negatives_any_member(self, spark):
        from cod_stats_spark.operators.bloom import bloom_build, bloom_probe

        vals = [f"item-{i}" for i in range(200)]
        for bh in ("xxhash64", "md5_60"):
            bloom = bloom_build(_df(spark, vals), "v", _M, _K, base_hash=bh)
            got = {
                r["v"]: r["maybe_member"]
                for r in bloom_probe(
                    _df(spark, vals), "v", bloom, _M, _K, base_hash=bh
                ).collect()
            }
            assert all(got.values()), bh

    def test_false_positive_rate_near_design(self, spark):
        from cod_stats_spark.operators.bloom import (
            bloom_build,
            bloom_fp_rate,
            bloom_probe,
        )

        n = 400
        ins = [f"in-{i}" for i in range(n)]
        probe = [f"out-{i}" for i in range(2000)]
        bloom = bloom_build(_df(spark, ins), "v", _M, _K)
        fp = sum(
            1
            for r in bloom_probe(_df(spark, probe), "v", bloom, _M, _K).collect()
            if r["maybe_member"]
        ) / len(probe)
        design = bloom_fp_rate(n, _M, _K)
        # generous band: the estimate itself has sampling noise
        assert fp <= max(4 * design, 0.02), (fp, design)

    def test_definitely_new_is_reliable_for_prefilter(self, spark):
        """The load-bearing direction: a False answer must mean the
        value was never inserted — checked by construction via the
        no-false-negative test, restated here on a disjoint probe."""
        from cod_stats_spark.operators.bloom import bloom_build, bloom_probe

        bloom = bloom_build(_df(spark, ["a", "b"]), "v", _M, _K)
        rows = bloom_probe(
            _df(spark, ["a", "zz-definitely-new"]), "v", bloom, _M, _K
        ).collect()
        got = {r["v"]: r["maybe_member"] for r in rows}
        assert got["a"] is True

    def test_null_values_probe_false(self, spark):
        from cod_stats_spark.operators.bloom import bloom_build, bloom_probe

        docs = spark.createDataFrame(
            [(1, "a"), (2, None)], "doc_id long, v string"
        )
        bloom = bloom_build(docs, "v", _M, _K)
        got = {
            r["doc_id"]: r["maybe_member"]
            for r in bloom_probe(docs, "v", bloom, _M, _K).collect()
        }
        assert got[1] is True and got[2] is False

    def test_duplicate_rows_keep_one_answer_each(self, spark):
        from cod_stats_spark.operators.bloom import bloom_build, bloom_probe

        docs = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "doc_id long, v string"
        )
        bloom = bloom_build(_df(spark, ["x"]), "v", _M, _K)
        got = {
            r["doc_id"]: r["maybe_member"]
            for r in bloom_probe(docs, "v", bloom, _M, _K).collect()
        }
        assert got[1] is True and got[2] is True
        assert len(got) == 3


class TestIncremental:
    def test_union_build_equals_merged_batches(self, spark):
        """bit_or over the union == build over the whole — the
        order-independent incremental contract."""
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.bloom import bloom_build

        a = [f"a-{i}" for i in range(50)]
        b = [f"b-{i}" for i in range(50)]
        whole = {
            (r["word"], r["bits"])
            for r in bloom_build(_df(spark, a + b), "v", _M, _K).collect()
        }
        merged = {
            (r["word"], r["bits"])
            for r in (
                bloom_build(_df(spark, a), "v", _M, _K)
                .unionByName(bloom_build(_df(spark, b), "v", _M, _K))
                .groupBy("word")
                .agg(F.expr("bit_or(bits)").alias("bits"))
            ).collect()
        }
        assert whole == merged


class TestValidation:
    def test_bad_params_raise(self, spark):
        from cod_stats_spark.operators.bloom import (
            bloom_build,
            bloom_fp_rate,
            bloom_probe,
        )

        docs = _df(spark, ["a"])
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(docs, "v", 100, _K)
        with pytest.raises(ValueError, match="num_hashes"):
            bloom_build(docs, "v", _M, 0)
        with pytest.raises(ValueError, match="base_hash"):
            bloom_build(docs, "v", _M, _K, base_hash="sha1").collect()
        with pytest.raises(ValueError, match="> 0"):
            bloom_fp_rate(0, _M, _K)
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_probe(docs, "v", docs, 65, _K)


class TestOracle:
    def test_duckdb_replays_build_and_probe(self, spark):
        import duckdb

        from cod_stats_spark.operators.bloom import (
            bloom_build,
            bloom_oracle_sql,
            bloom_probe,
        )

        ins = spark.createDataFrame(
            [(i, f"word-{i % 37}") for i in range(100)],
            "doc_id long, v string",
        )
        probe = spark.createDataFrame(
            [(i, f"word-{i}") for i in range(80)]
            + [(999, None)],
            "doc_id long, v string",
        )
        bloom = bloom_build(ins, "v", _M, _K, base_hash="md5_60")
        got_words = {
            (r["word"], r["bits"]) for r in bloom.collect()
        }
        got_probe = {
            r["doc_id"]: r["maybe_member"]
            for r in bloom_probe(
                probe, "v", bloom, _M, _K, base_hash="md5_60"
            ).collect()
        }
        con = duckdb.connect()
        con.register("b_ins", ins.toPandas())
        con.register("b_probe", probe.toPandas())
        want_words = {
            (int(w), int(b))
            for w, b in con.execute(
                bloom_oracle_sql("b_ins", "v", _M, _K)
            ).fetchall()
        }
        assert got_words == want_words
        want_probe = {
            int(i): bool(m)
            for i, m in con.execute(
                bloom_oracle_sql(
                    "b_ins", "v", _M, _K, probe_src="b_probe"
                )
            ).fetchall()
        }
        assert got_probe == want_probe

    def test_duplicate_probe_ids_replay_per_row(self, spark):
        """r14 advice: duplicate probe_id values must not merge hit
        counts — the oracle aggregates per DISTINCT VALUE (the Spark
        plan's shape) and echoes probe_id through. Two rows sharing
        pid=7, one inserted value and one absent value, must come back
        as one True and one False row."""
        import duckdb

        from cod_stats_spark.operators.bloom import (
            bloom_build,
            bloom_oracle_sql,
            bloom_probe,
        )

        ins = spark.createDataFrame(
            [(i, f"word-{i}") for i in range(40)], "doc_id long, v string"
        )
        probe = spark.createDataFrame(
            [(7, "word-3"), (7, "definitely-absent-a"), (7, "word-3"),
             (8, "word-5"), (8, "definitely-absent-b")],
            "doc_id long, v string",
        )
        bloom = bloom_build(ins, "v", _M, _K, base_hash="md5_60")
        got = sorted(
            (r["doc_id"], r["v"], r["maybe_member"])
            for r in bloom_probe(
                probe, "v", bloom, _M, _K, base_hash="md5_60"
            ).collect()
        )
        # per-row answers: the duplicated pid rows keep independent
        # value-keyed answers (inserted -> True, absent -> False)
        assert (7, "word-3", True) in got
        assert (8, "word-5", True) in got
        assert [g for g in got if g[1].startswith("definitely-absent")] == [
            (7, "definitely-absent-a", False),
            (8, "definitely-absent-b", False),
        ]
        con = duckdb.connect()
        con.register("d_ins", ins.toPandas())
        con.register("d_probe", probe.toPandas())
        want_pairs = con.execute(
            bloom_oracle_sql("d_ins", "v", _M, _K, probe_src="d_probe")
        ).fetchall()
        # the oracle emits one row per probe ROW; as a (pid, member)
        # MULTISET it must equal Spark's (a pid-merged hit count would
        # collapse pid 7's True/False split into garbage)
        want = sorted((int(i), bool(m)) for i, m in want_pairs)
        assert want == sorted((i, m) for i, _v, m in got)
