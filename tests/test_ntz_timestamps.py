"""TIMESTAMP_NTZ regression tests (round-4 incident).

The driver's testdata is plain parquet ``timestamp[us]`` with no
timezone, which Spark 4 reads as TIMESTAMP_NTZ.  ``unix_micros`` and
``withWatermark`` accept only TIMESTAMP, so every time-touching
operator must hop NTZ through TIMESTAMP (value-preserving under the
pinned-UTC session tz — see operators/_util.py:ts_to_timestamp).
These tests write BOTH parquet flavors and require identical results.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(path: str, tz: str | None) -> None:
    """4 events for user 1 (gap closes session after #2), 1 for user 2."""
    t0 = int(datetime(2026, 1, 1, 10, 0, 0, tzinfo=timezone.utc).timestamp() * 1_000_000)
    rows = [
        (1, t0, 1.0),
        (1, t0 + 60_000_000, 2.0),           # +1 min  (same session)
        (1, t0 + 4_000_000_000, 3.0),        # +>30min (new session)
        (1, t0 + 4_060_000_000, 4.0),
        (2, t0, 5.0),
    ]
    table = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz=tz)),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module", params=[None, "UTC"], ids=["ntz", "utc"])
def events_parquet(request, tmp_path_factory):
    # a DIRECTORY holding one parquet file — the streaming file source
    # requires a directory path
    d = tmp_path_factory.mktemp("ntz_events") / "events"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), request.param)
    return str(d), request.param


EXPECTED_SESSIONS = {
    # (user_id, session_number, n_events, sum_value)
    (1, 1, 2, 3.0),
    (1, 2, 2, 7.0),
    (2, 1, 1, 5.0),
}


class TestEpochHelpers:
    def test_epoch_us_across_dtypes(self, spark):
        """One helper, every lake flavor: TIMESTAMP, TIMESTAMP_NTZ,
        DATE, and numeric epoch-seconds all produce consistent epochs."""
        from pyspark.sql import functions as F

        from cod_stats_spark.operators._util import epoch_us

        base_us = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z
        df = spark.sql(
            "SELECT timestamp'2026-01-01 00:00:00' AS ts,"
            " timestamp_ntz'2026-01-01 00:00:00' AS tsn,"
            " date'2026-01-01' AS d,"
            f" {base_us // 1_000_000}L AS secs"
        )
        got = {}
        for c in ("ts", "tsn", "d", "secs"):
            col, per_sec = epoch_us(df, c)
            got[c] = (df.select(col.alias("v")).first()["v"], per_sec)
        assert got["ts"] == (base_us, 1_000_000)
        assert got["tsn"] == (base_us, 1_000_000)
        assert got["d"] == (base_us, 1_000_000)
        assert got["secs"] == (base_us // 1_000_000, 1)


class TestNtzSessionize:
    def test_read_dtype_matches_flavor(self, spark, events_parquet):
        path, tz = events_parquet
        dtype = dict(spark.read.parquet(path).dtypes)["ts"]
        assert dtype == ("timestamp_ntz" if tz is None else "timestamp")

    def test_batch_sessionize(self, spark, events_parquet):
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.sessionize import sessionize

        path, _ = events_parquet
        ev = spark.read.parquet(path)
        got = {
            (r["user_id"], r["session_number"], r["n"], r["s"])
            for r in sessionize(ev, "ts", ["user_id"], 1800)
            .groupBy("user_id", "session_number")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
            .collect()
        }
        assert got == EXPECTED_SESSIONS

    def test_streaming_session_window_with_watermark(self, spark, events_parquet):
        from cod_stats_spark.streaming import (
            run_stream_to_memory,
            streaming_session_rollup,
        )

        path, _ = events_parquet
        stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
        out = run_stream_to_memory(
            streaming_session_rollup(stream, gap_seconds=1800),
            output_mode="complete",
        )
        got = {
            (r["user_id"], r["n_events"], r["sum_value"]) for r in out.collect()
        }
        assert got == {(1, 2, 3.0), (1, 2, 7.0), (2, 1, 5.0)}

    def test_stateful_sessionize(self, spark, events_parquet):
        from cod_stats_spark.streaming import (
            run_stream_to_memory,
            stateful_sessionize,
        )

        path, _ = events_parquet
        stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
        out = run_stream_to_memory(
            stateful_sessionize(stream, gap_seconds=1800), output_mode="append"
        )
        got = {
            (r["user_id"], r["session_number"], r["n_events"], r["sum_value"])
            for r in out.collect()
        }
        # append mode emits only CLOSED sessions: user 1's first session
        assert got == {(1, 1, 2, 3.0)}
