"""Time-series hyperfunctions (operators/timeseries_agg.py): OHLC
downsampling and LOCF time-weighted averages — hand-computed segment
arithmetic, boundary clipping, final-observation exclusion. SQL value
verification over the real events table lives in the
streaming_daily_counts gate's 'ohlc:'/'twa:' arms."""

from __future__ import annotations

import datetime as dt


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


class TestOhlc:
    def test_open_close_follow_time_not_value(self, spark):
        from cod_stats_spark.operators.timeseries_agg import ohlc_downsample

        rows = [
            ("a", _ts(0, 10), 5.0),   # open
            ("a", _ts(0, 20), 9.0),   # high
            ("a", _ts(0, 40), 1.0),   # low
            ("a", _ts(0, 50), 3.0),   # close
            ("a", _ts(1, 5), 7.0),    # next bucket
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = {
            r["bucket_start"]: (r["open"], r["high"], r["low"], r["close"], r["n_obs"])
            for r in ohlc_downsample(df, "ts", ["k"], "v", 3600).collect()
        }
        base = int(dt.datetime(2026, 1, 1).timestamp())
        assert got[base] == (5.0, 9.0, 1.0, 3.0, 4)
        assert got[base + 3600] == (7.0, 7.0, 7.0, 7.0, 1)

    def test_keys_are_independent(self, spark):
        from cod_stats_spark.operators.timeseries_agg import ohlc_downsample

        rows = [("a", _ts(0), 1.0), ("b", _ts(0), 9.0)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = {r["k"]: r["open"] for r in ohlc_downsample(df, "ts", ["k"], "v", 60).collect()}
        assert got == {"a": 1.0, "b": 9.0}


class TestTimeWeightedAvg:
    def test_hand_computed_weights_across_boundary(self, spark):
        """v=10 held 00:30–01:30 (30 min in bucket 0, 30 in bucket 1),
        v=20 held 01:30–02:00 (30 min in bucket 1). Bucket 0 twa = 10;
        bucket 1 twa = (10·30 + 20·30)/60 = 15. The final observation
        (02:00) contributes nothing."""
        from cod_stats_spark.operators.timeseries_agg import time_weighted_avg

        rows = [
            ("a", _ts(0, 30), 10.0),
            ("a", _ts(1, 30), 20.0),
            ("a", _ts(2, 0), 99.0),   # terminal: no successor
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = {
            r["bucket_start"]: (r["twa"], r["weight_seconds"])
            for r in time_weighted_avg(df, "ts", ["k"], "v", 3600).collect()
        }
        base = int(dt.datetime(2026, 1, 1).timestamp())
        assert got[base] == (10.0, 1800.0)
        assert got[base + 3600] == (15.0, 3600.0)
        assert base + 7200 not in got       # nothing held into bucket 2

    def test_full_bucket_inside_one_segment(self, spark):
        """A bucket entirely inside one held segment reports that value
        with full weight."""
        from cod_stats_spark.operators.timeseries_agg import time_weighted_avg

        rows = [("a", _ts(0, 0), 4.0), ("a", _ts(3, 0), 8.0)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = {
            r["bucket_start"]: (r["twa"], r["weight_seconds"])
            for r in time_weighted_avg(df, "ts", ["k"], "v", 3600).collect()
        }
        base = int(dt.datetime(2026, 1, 1).timestamp())
        assert got[base] == (4.0, 3600.0)
        assert got[base + 3600] == (4.0, 3600.0)
        assert got[base + 7200] == (4.0, 3600.0)
        assert (base + 10800) not in got

    def test_single_observation_key_reports_nothing(self, spark):
        from cod_stats_spark.operators.timeseries_agg import time_weighted_avg

        df = spark.createDataFrame(
            [("a", _ts(0), 1.0)], "k string, ts timestamp, v double"
        )
        assert time_weighted_avg(df, "ts", ["k"], "v", 60).count() == 0

    def test_twa_differs_from_plain_avg_under_irregular_sampling(self, spark):
        """The reason the operator exists: a value held for 59 minutes
        then flipped for 1 minute has twa ≈ the held value, while the
        plain mean of the two observations is their midpoint."""
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.timeseries_agg import time_weighted_avg

        rows = [
            ("a", _ts(0, 0), 100.0),
            ("a", _ts(0, 59), 0.0),
            ("a", _ts(1, 0), 0.0),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        twa = time_weighted_avg(df, "ts", ["k"], "v", 3600).collect()[0]["twa"]
        plain = df.agg(F.avg("v")).first()[0]
        assert abs(twa - 100.0 * 59 / 60) < 1e-9
        assert abs(plain - 100.0 / 3) < 1e-9


class TestStreamingOhlc:
    def test_streaming_equals_batch_on_static_replay(self, spark, tmp_path):
        """The watermarked streaming OHLC must agree with the batch
        operator on the same static input (mergeable partials: late
        files inside the watermark fold into the open bucket)."""
        import uuid

        from cod_stats_spark.operators.timeseries_agg import (
            ohlc_downsample,
            streaming_ohlc,
        )

        rows = [
            ("a", _ts(0, 10), 5.0), ("a", _ts(0, 50), 3.0),
            ("a", _ts(1, 5), 7.0), ("b", _ts(0, 30), 2.0),
        ]
        src = tmp_path / "in"
        # two files -> two micro-batches; the second carries bucket-0
        # data that must MERGE into already-open state
        spark.createDataFrame(rows[:2], "k string, ts timestamp, v double")\
            .coalesce(1).write.parquet(f"{src}/b0")
        spark.createDataFrame(rows[2:], "k string, ts timestamp, v double")\
            .coalesce(1).write.parquet(f"{src}/b1")
        stream = (
            spark.readStream.schema("k string, ts timestamp, v double")
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        )
        name = f"ohlc_{uuid.uuid4().hex[:8]}"
        q = (
            streaming_ohlc(stream, "ts", ["k"], "v", 3600)
            .writeStream.outputMode("complete").format("memory")
            .queryName(name).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(map(tuple, spark.table(name).collect()))
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        want = sorted(map(tuple, ohlc_downsample(df, "ts", ["k"], "v", 3600).collect()))
        assert got == want


class TestAnomalyFlags:
    def test_spike_flagged_against_its_prior_window_only(self, spark):
        """A 10x spike is flagged; the stable points around it are
        not; the spike does NOT contaminate its own window (exclusive
        frame), so the immediately following normal point survives."""
        import datetime as dt

        from cod_stats_spark.operators.anomaly import flag_anomalies

        t0 = dt.datetime(2026, 1, 1, 10, 0)
        sec = dt.timedelta(seconds=10)
        vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 100.0, 10.2, 9.8]
        rows = [("a", t0 + i * sec, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = {
            r["ts"]: (r["is_anomaly"], r["zscore"])
            for r in flag_anomalies(
                df, "v", ["k"], "ts", window_seconds=3600, min_points=5
            ).collect()
        }
        at = lambda i: got[t0 + i * sec]
        assert at(6)[0] is True                      # the 100.0 spike
        assert at(7)[0] is False and at(8)[0] is False
        # warm-up rows (fewer than min_points priors): null score, no flag
        assert at(0)[1] is None and at(0)[0] is False
        assert at(4)[1] is None                      # only 4 priors

    def test_zero_variance_window_never_flags(self, spark):
        import datetime as dt

        from cod_stats_spark.operators.anomaly import flag_anomalies

        t0 = dt.datetime(2026, 1, 1)
        sec = dt.timedelta(seconds=1)
        rows = [("a", t0 + i * sec, 5.0) for i in range(8)] + [
            ("a", t0 + 8 * sec, 5.0)
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = flag_anomalies(df, "v", ["k"], "ts", 3600)
        assert out.where("is_anomaly").count() == 0

    def test_large_offset_constant_series_never_nan_flags(self, spark):
        """FP-cancellation adversary: values ~1e8 with tiny jitter make
        ss − s²/n go slightly NEGATIVE in float64; an unclamped variance
        would sqrt to NaN, and Spark's NaN > 0 ordering would FLAG the
        row with a NaN score. Every score must be null or finite, and
        nothing in a near-constant series may be flagged."""
        import datetime as dt
        import math

        from cod_stats_spark.operators.anomaly import flag_anomalies

        t0 = dt.datetime(2026, 1, 1)
        sec = dt.timedelta(seconds=1)
        base = 1.0e8
        # jitter far below k·sigma detectability but enough to make the
        # sum-of-squares cancellation go negative at this magnitude
        vals = [base + (1e-4 if i % 2 else -1e-4) for i in range(40)]
        rows = [("a", t0 + i * sec, v) for i, v in enumerate(vals)]
        # plus a truly constant key at the same magnitude (var == -0.0 risk)
        rows += [("b", t0 + i * sec, base) for i in range(40)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = flag_anomalies(df, "v", ["k"], "ts", 3600).collect()
        for r in got:
            assert r["is_anomaly"] is False, r
            assert r["zscore"] is None or math.isfinite(r["zscore"]), r

    def test_value_overflow_yields_null_not_flag(self, spark):
        """|v| ≳ 1e154 makes v² overflow: ss − s²/n = inf − inf = NaN,
        and greatest(NaN, 0) is NaN under Spark's NaN ordering — the
        var > 0 gate alone would flag with a NaN score (r10 review);
        the isnan guard must yield null instead."""
        import datetime as dt

        from cod_stats_spark.operators.anomaly import flag_anomalies

        t0 = dt.datetime(2026, 1, 1)
        sec = dt.timedelta(seconds=1)
        # constant huge series: ss = inf AND s²/n = inf ⇒ var = NaN
        rows = [("a", t0 + i * sec, 1e160) for i in range(7)]
        # alternating huge series: s = 0 ⇒ var = inf ⇒ z = 0, no flag
        rows += [
            ("b", t0 + i * sec, v * 1e160)
            for i, v in enumerate([1, -1, 1, -1, 1, -1, 1])
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        import math

        for r in flag_anomalies(df, "v", ["k"], "ts", 3600).collect():
            assert r["is_anomaly"] is False, r
            if r["k"] == "a":
                assert r["zscore"] is None, r
            else:
                assert r["zscore"] is None or math.isfinite(r["zscore"]), r
