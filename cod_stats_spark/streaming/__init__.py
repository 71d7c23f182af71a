"""Structured Streaming variants of the engine's operators (SURVEY §2.9)."""

from cod_stats_spark.streaming.ingest import stream_events, run_stream_to_memory
from cod_stats_spark.streaming.expectations import (
    expectations_batch_report,
    read_expectation_reports,
    stream_expectations,
)
from cod_stats_spark.streaming.anomaly import stateful_anomaly
from cod_stats_spark.streaming.funnel import stateful_funnel
from cod_stats_spark.streaming.substring import (
    stream_substring_dedup,
    substring_batch_against_corpus,
)
from cod_stats_spark.streaming.dedup import (
    build_dedup_index,
    dedup_batch_against_corpus,
    stream_dedup_to_corpus,
)
from cod_stats_spark.streaming.semantic import (
    build_semantic_state,
    semantic_batch_against_corpus,
    stream_semantic_dedup,
)
from cod_stats_spark.streaming.scd import (
    apply_scd2_batch,
    read_scd2_dim,
    stream_scd2_apply,
)
from cod_stats_spark.streaming.sessions import (
    streaming_session_rollup,
    stateful_sessionize,
)
from cod_stats_spark.streaming.packing import (
    finalize_training_tape,
    training_sequences_append,
)
from cod_stats_spark.streaming.compaction import (
    compact_dedup_index,
    compact_semantic_state,
    compact_state_tree,
)

__all__ = [
    "stream_events",
    "run_stream_to_memory",
    "streaming_session_rollup",
    "stateful_sessionize",
    "stateful_funnel",
    "stateful_anomaly",
    "expectations_batch_report",
    "read_expectation_reports",
    "stream_expectations",
    "substring_batch_against_corpus",
    "stream_substring_dedup",
    "build_dedup_index",
    "dedup_batch_against_corpus",
    "stream_dedup_to_corpus",
    "build_semantic_state",
    "semantic_batch_against_corpus",
    "stream_semantic_dedup",
    "apply_scd2_batch",
    "read_scd2_dim",
    "stream_scd2_apply",
    "compact_state_tree",
    "training_sequences_append",
    "finalize_training_tape",
    "compact_dedup_index",
    "compact_semantic_state",
]
