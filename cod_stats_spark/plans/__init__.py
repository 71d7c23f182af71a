"""Query plans: the declared query inventory (bench + correctness gate)."""

from cod_stats_spark.plans.bench_queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
