"""cod_stats_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference engine (J-Swift/cod-stats, surveyed in SURVEY.md), re-expressed as
idiomatic Spark: DataFrame/SQL logical plans optimized by Catalyst, broadcast
joins for dimensions, window functions for sessionization and time-series,
and Arrow-batched Pandas UDFs only where built-ins cannot express the
semantics (multimodal decode).

Layout:
    session.py    — tuned SparkSession builder
    tables.py     — testdata/parquet catalog loader
    operators/    — generic, reusable relational + ML-data operators
    engine/       — the domain analytics layer (match-stats semantics)
    streaming/    — Structured Streaming variants (sessionization, ingest)
    functions/    — column-expression libraries (text, metrics)
"""

from cod_stats_spark.session import get_spark, prep_session
from cod_stats_spark.tables import load_tables

__all__ = ["get_spark", "prep_session", "load_tables"]

__version__ = "0.1.0"
