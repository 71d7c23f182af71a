"""Versioned rewrite-state for foreachBatch maintenance loops.

Append-only state (the incremental-dedup index) just appends; state
that must be REWRITTEN per batch (SCD2 dimensions, gram censuses)
needs the version/pointer protocol: read the snapshot named by
``_CURRENT``, write the NEW version dir (never touching the one the
lazy plan reads — no read-overwrite conflict), then repoint with an
atomic rename. A crash between write and repoint leaves a dangling
dir the next run overwrites; a crash after the repoint is durable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def current_version(state_dir: str) -> int | None:
    ptr = os.path.join(state_dir, "_CURRENT")
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The live snapshot, or None before the first write."""
    v = current_version(state_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={v}"))


def write_state(df: DataFrame, state_dir: str) -> None:
    """Write the next version and atomically repoint ``_CURRENT``."""
    cur = current_version(state_dir)
    nxt = 0 if cur is None else cur + 1
    os.makedirs(state_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={nxt}"))
    tmp = os.path.join(state_dir, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, os.path.join(state_dir, "_CURRENT"))
