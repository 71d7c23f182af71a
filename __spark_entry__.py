"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (pricing-summary rollup, the TPC-H
  Q1 shape) on /root/testdata/sf0.001.
- ``queries()``: every implemented query/operator from SURVEY.md §2 +
  the training-data-pipeline extensions, as (spark, sf_dir) callables.
- ``oracle_sql()``: the DuckDB-equivalent SQL per query (omitted for
  genuinely non-SQL-expressible ops: MinHash/SimHash LSH — xxhash64
  seeds; LSH-ANN — hyperplane sketches; multimodal decode — binary
  mapInPandas).

Implementation lives in cod_stats_spark/ (see cod_stats_spark/plans/
bench_queries.py for the registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cod_stats_spark.plans.bench_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same result, same aliases)."""
    return dict(ORACLES)
