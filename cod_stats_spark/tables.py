"""Catalog of the driver-provided parquet tables (TESTDATA.md).

``load_tables(spark, sf_dir)`` returns a dict of lazily planned
DataFrames — a plain ``spark.read.parquet`` per table so Catalyst gets
full pushdown/pruning on the scan. Nothing is cached here; callers
decide materialization (the reference's one structural lesson —
materialize the hot normalization layer, SURVEY.md §4 — belongs to the
layer that owns the lifecycle, not the catalog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark rejects them
    outright (PARQUET_TYPE_ILLEGAL) unless read as raw longs."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with nanosecond-timestamp normalization.

    TIMESTAMP(NANOS) columns are read as int64 nanos
    (spark.sql.legacy.parquet.nanosAsLong) and truncated to microsecond
    TimestampType with exact integer division — matching DuckDB's
    ns→µs truncation so oracle comparisons agree. Pruning/pushdown on
    other columns is unaffected (the conversion is a projection).
    """
    ns_cols = _nanos_ts_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


class _LazyTables(dict):
    """dict-compatible catalog that defers each table's reader creation
    (parquet footer read + schema resolution) until first access."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(name)
        df = read_parquet(self._spark, f"{self._dir}/{name}.parquet")
        self[name] = df
        return df

    def keys(self):  # keep dict-like iteration over the full catalog
        return list(TABLE_NAMES)

    def items(self):
        return [(n, self[n]) for n in TABLE_NAMES]


# (session id, sf_dir) -> catalog; DataFrames are plans, safe to reuse
# across queries within one session
_CATALOG_CACHE: dict[tuple[int, str], _LazyTables] = {}


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Catalog of the testdata tables. Lazy per table and cached per
    (session, dir): a query touching 2 tables pays 2 footer reads, not
    10, and repeat queries pay none."""
    d = sf_dir or DEFAULT_SF_DIR
    key = (id(spark), d)
    cat = _CATALOG_CACHE.get(key)
    if cat is None:
        cat = _LazyTables(spark, d)
        _CATALOG_CACHE[key] = cat
    return cat


def register_views(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL API surface)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
