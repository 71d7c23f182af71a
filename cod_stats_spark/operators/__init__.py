"""Generic, reusable operators.

Each module implements one operator family from SURVEY.md §2 as a pure
DataFrame -> DataFrame transformation built from Catalyst-optimizable
primitives (no Python UDFs unless noted in the module docstring).
"""

from cod_stats_spark.operators.sessionize import sessionize, session_rollup
from cod_stats_spark.operators.rolling import rolling_frames, cumulative_frames
from cod_stats_spark.operators.topk import top_k, top_k_per_group
from cod_stats_spark.operators.streaks import run_lengths
from cod_stats_spark.operators.interval_join import interval_join
from cod_stats_spark.operators.asof_join import asof_join
from cod_stats_spark.operators.skew import salted_aggregate, salted_join
from cod_stats_spark.operators.profiling import profile_table
from cod_stats_spark.operators.retrieval import bm25_topk, rrf_fuse
from cod_stats_spark.operators.rolling import rolling_time_frames
from cod_stats_spark.operators.sampling import weighted_sample
from cod_stats_spark.operators.sharding import compact_shards
from cod_stats_spark.operators.clustering import kmeans_assign, kmeans_fit
from cod_stats_spark.operators.retrieval import bm25_rank_multi, bm25_rank_topk
from cod_stats_spark.operators.similarity import knn_join_gemm
from cod_stats_spark.operators.layout import write_zordered, zorder_key

__all__ = [
    "asof_join",
    "bm25_rank_multi",
    "bm25_rank_topk",
    "bm25_topk",
    "kmeans_assign",
    "kmeans_fit",
    "knn_join_gemm",
    "write_zordered",
    "zorder_key",
    "compact_shards",
    "profile_table",
    "rolling_time_frames",
    "rrf_fuse",
    "weighted_sample",
    "salted_aggregate",
    "salted_join",
    "sessionize",
    "session_rollup",
    "rolling_frames",
    "cumulative_frames",
    "top_k",
    "top_k_per_group",
    "run_lengths",
    "interval_join",
]
