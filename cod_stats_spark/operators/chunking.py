"""Token-window document chunking — training-example preparation.

Pre-training and embedding pipelines split long documents into
windows of at most ``max_tokens`` tokens, successive windows advanced
by ``stride`` tokens so they overlap by ``max_tokens - stride``
(context preserved across cuts). The reference engine has no analog;
this is LLM-pipeline extension surface (SURVEY.md §6) feeding
:mod:`packing` (chunks are the units packers and shard writers
consume) and :mod:`similarity` (chunk embeddings).

Pure Column implementation — the chunk starts are a ``sequence`` with
step ``stride``, each chunk a ``slice`` of the token array — so the
whole operator is one JVM-side projection: zero shuffle, zero Python,
trivially linear at any scale. The final chunk is the last window
whose start is < n_tokens (tail chunks may be shorter than
``max_tokens``); documents with no tokens yield no chunks by default
(``keep_empty=True`` emits a single empty chunk so row-preserving
pipelines can left-join instead).

Boundary semantics are exact and SQL-replayable: chunk c covers token
positions [c·stride, min(c·stride + max_tokens, n)) of the
normalized whitespace token array — the `pack_sequences` gate's
'chunk' arm replays start offsets, lengths, and the chunk-text md5 in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import words_sql


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    stride: int | None = None,
    keep_empty: bool = False,
) -> DataFrame:
    """(id, chunk_id, chunk_start, n_tokens, chunk_text) — one row per
    window. ``stride`` defaults to ``max_tokens`` (disjoint chunks);
    ``stride < max_tokens`` overlaps. chunk_id counts from 0 in
    document order; chunk_start is the token offset of the window;
    chunk_text is the window's tokens joined by single spaces
    (normalized-text tokens, same convention as the dedup family)."""
    if stride is None:
        stride = max_tokens
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("chunk_documents: max_tokens and stride must be > 0")
    tk = F.coalesce(
        F.expr(f"array({words_sql(text_col)})[0]"),
        F.expr("cast(array() as array<string>)"),  # null text -> no tokens
    )
    src = docs.select(F.col(id_col), tk.alias("_tk"))
    n = F.size("_tk")
    # starts: 0, stride, 2·stride, … strictly below n (empty when n=0)
    starts = F.when(
        n > 0,
        F.sequence(
            F.lit(0),
            (n - 1) - ((n - 1) % stride),
            F.lit(stride),
        ),
    ).otherwise(
        F.array(F.lit(0)) if keep_empty else F.expr("cast(array() as array<int>)")
    )
    chunks = src.select(
        id_col,
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
        F.col("_tk"),
    )
    piece = F.slice(F.col("_tk"), F.col("chunk_start") + 1, max_tokens)
    return chunks.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def chunk_oracle_sql(
    src: str = "documents",
    max_tokens: int = 512,
    stride: int | None = None,
    text_sql: str = "text",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB replica: same token array, same window arithmetic —
    yields (doc_id, chunk_id, chunk_start, n_tokens, fp) with fp the
    md5 of the chunk text, so window boundaries AND content are
    value-verified."""
    if stride is None:
        stride = max_tokens
    return f"""
WITH tok AS (
  SELECT {id_sql} AS doc_id,
         list_filter(string_split(trim(regexp_replace(lower({text_sql}), '\\s+', ' ', 'g')), ' '),
                     t -> t <> '') AS tk
  FROM {src}
),
starts AS (
  SELECT doc_id, tk,
         unnest(CASE WHEN len(tk) = 0 THEN []
                ELSE generate_series(0, len(tk) - 1, {stride}) END) AS chunk_start
  FROM tok
)
SELECT doc_id,
       (chunk_start // {stride})::INT AS chunk_id,
       chunk_start::INT AS chunk_start,
       least({max_tokens}, len(tk) - chunk_start)::INT AS n_tokens,
       md5(array_to_string(tk[chunk_start + 1 : chunk_start + {max_tokens}], ' ')) AS fp
FROM starts
"""
