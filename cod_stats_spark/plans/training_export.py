"""End-to-end training-data export: filter → count tokens → pack →
write shards, as ONE composed lazy plan plus one partitioned write.

This is the composition every pre-training pipeline runs after
dedup/decontamination, wired from the already-tested operators:

1. quality gate   — functions/text.py quality_score (codegen)
2. token counting — whitespace token_count_ws (codegen)
3. sequence pack  — operators/packing.pack_sequences (distributed
                    prefix scan; shard = token-budget window)
4. shard write    — operators/sharding.write_shards (one dir per
                    shard, clustered write)

Scale shape: stages 1–2 fuse into the scan projection; stage 3 is one
window shuffle + a bounded (256-row) driver prefix sum; stage 4 is one
clustering repartition. Nothing materializes on the driver except the
256 bucket totals and the returned manifest aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions import text as T
from cod_stats_spark.operators.packing import pack_sequences, shard_manifest
from cod_stats_spark.operators.sharding import write_shards


def export_training_shards(
    docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_budget: int = 65536,
    min_quality: float = 0.25,
    salt: str = "export",
    fmt: str = "parquet",
) -> DataFrame:
    """Pack quality-filtered documents into token-budget shards and
    write them Hive-partitioned by ``shard_id``; returns the shard
    manifest (shard_id, n_docs, n_tokens, first_offset) computed from
    the written table — so the manifest always describes the bytes on
    disk, not the plan that produced them.

    ``fmt="json"`` writes JSON-Lines shard files (one JSON object per
    line — the interchange format most pre-training corpora ship as)
    instead of parquet; the manifest is still computed from the
    written bytes, read back with the writer's schema.
    """
    gated = docs.filter(T.quality_score(F.col(text_col)) >= min_quality)
    counted = gated.select(
        F.col(id_col),
        F.col(text_col),
        T.token_count_ws(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    packed = pack_sequences(
        counted, "n_tokens", id_col, budget=token_budget, salt=salt
    )
    rows = packed.join(counted.select(id_col, text_col), id_col)
    write_shards(rows, out_path, shard_col="shard_id", fmt=fmt)
    # read back with the writer's schema: a fully-filtered gate (or an
    # empty input) writes a partitioned dir with zero part files, and
    # schema INFERENCE would fail there — the explicit schema makes the
    # empty-corpus case a legitimate empty manifest instead of an error
    written = (
        docs.sparkSession.read.schema(rows.schema).format(fmt).load(out_path)
    )
    return shard_manifest(written).orderBy("shard_id")
