"""Custom Spark data sources (Python Data Source API, Spark 4+)."""

from cod_stats_spark.sources.match_api import (
    MatchApiDataSource,
    register_match_api_source,
)

__all__ = ["MatchApiDataSource", "register_match_api_source"]
