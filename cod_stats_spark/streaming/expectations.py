"""Continuous data-quality monitoring — expectations over a stream.

The production posture for :mod:`operators.expectations`: every
micro-batch of an ingest stream is scored against the declared check
suite and the long-form report rows append (with the batch id) to a
report table — the feed a freshness/quality dashboard or alerting
job reads. Checks run per BATCH (each report row describes one
micro-batch's rows, not the accumulated table): cumulative checks
belong on the silver table itself via the batch operator.

``referential`` checks work unchanged — the reference side is a
static DataFrame (dimension tables), re-read per batch, which is
exactly the stream-static join contract.
"""

from __future__ import annotations

import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.expectations import check_expectations


def expectations_batch_report(
    batch: DataFrame, specs: Sequence[Mapping], batch_id: int
) -> DataFrame:
    """One micro-batch's report: check_expectations + the batch id."""
    return check_expectations(batch, specs).select(
        F.lit(int(batch_id)).alias("batch"),
        "check",
        "column",
        "n_violations",
        "n_rows",
        "passed",
    )


def stream_expectations(
    stream: DataFrame,
    specs: Sequence[Mapping],
    report_path: str,
    checkpoint_path: str | None = None,
):
    """foreachBatch sink appending per-batch reports to
    ``report_path`` (parquet). Returns the StreamingQuery. Empty
    batches append nothing (no spurious all-pass rows)."""
    specs = list(specs)

    def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        expectations_batch_report(batch_df, specs, epoch_id).write.mode(
            "append"
        ).parquet(report_path)

    writer = stream.writeStream.foreachBatch(batch_fn).outputMode("append")
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def read_expectation_reports(spark, report_path: str) -> DataFrame | None:
    """The accumulated report table, or None before the first batch."""
    import glob

    if not glob.glob(os.path.join(report_path, "*.parquet")) and not glob.glob(
        os.path.join(report_path, "**", "*.parquet"), recursive=True
    ):
        return None
    return spark.read.parquet(report_path)
