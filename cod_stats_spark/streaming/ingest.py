"""Streaming ingest (SURVEY ST2): file-source streams over the same
schemas the batch engine reads, with the nanosecond-timestamp
normalization applied identically.

The reference approximates streaming with a 20–30 min cron re-ingest
(README FAQ); here the same incremental semantics are native — the
file source tracks processed files exactly once, replacing the
filename anti-join ledger (reference parser/parse_matches.sh:580-596).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a parquet file or directory, normalizing
    TIMESTAMP(NANOS) columns exactly like tables.read_parquet."""
    from cod_stats_spark.tables import _nanos_ts_cols

    target = path
    if os.path.isfile(path):
        # file streaming sources require a directory — stage a symlink
        stage = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(path, os.path.join(stage, os.path.basename(path)))
        target = stage
        probe = path
    else:
        names = [n for n in os.listdir(path) if n.endswith(".parquet")]
        probe = os.path.join(path, names[0]) if names else path
    ns_cols = _nanos_ts_cols(probe)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    src = spark.readStream.schema(schema).parquet(target)
    for c in ns_cols:
        src = src.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return src


def run_stream_to_memory(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming plan to completion over static input via the
    memory sink; returns the result table. Test/bench harness only —
    production sinks are files/Kafka via writeStream."""
    name = f"mem_{uuid.uuid4().hex[:10]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)
