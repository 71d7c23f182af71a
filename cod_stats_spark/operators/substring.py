"""Exact-substring span deduplication — verbatim repeated-passage removal.

The ExactSubstr operation from Lee et al., "Deduplicating Training
Data Makes Language Models Better" (ACL 2022): any passage of at
least L tokens that occurs verbatim more than once in the corpus is a
duplicated span, and training quality improves when the spans (not
the whole documents) are removed. The reference engine has no analog
— this is part of the LLM-pipeline extension surface (SURVEY.md §6).

Lee et al. build a single suffix array over the concatenated corpus —
inherently sequential and memory-resident. The Spark-native
formulation fixes the granularity at the minimum duplicate length n
and becomes embarrassingly parallel with EXACT semantics at that
granularity:

1. every positional token n-gram is hashed: (doc_id, pos, gh) — one
   row per token, so the site table is O(corpus tokens);
2. a gram occurring at >= min_count sites anywhere (including twice
   in one document) is duplicated — ONE groupBy(gh) with map-side
   partial aggregation; the Zipf head (boilerplate grams repeated
   millions of times) collapses to a single (gh, count) row, so there
   is no quadratic pairing anywhere;
3. duplicated sites join back on gh (AQE skew-join splits the hot
   gram keys) and merge into maximal per-document spans with the
   classic gaps-and-islands running-max window — a site at pos covers
   [pos, pos+n), overlapping/adjacent covers fuse;
4. span removal rebuilds the document from its kept token positions
   with JVM-side higher-order functions — no Python in the pipeline.

Detection is EXACT at token granularity: a repeated token run of
length L >= n contains identical full n-grams at every offset
0..L-n of both copies, so all its positions are marked and the
island merge covers the entire [p, p+L) region; a repeat of n-1
tokens is never found. (Character-offset repeats that don't align
on token boundaries are out of scope — the standard relaxation vs
the byte-level suffix array, which token-level training-data dedup
shares.)

Shuffle account (100 TB posture): one token-count-proportional shuffle
on gh for the duplicate census, one more for the site join-back, one
doc_id shuffle for the island window + span agg (same key, same
exchange), one doc_id join to rebuild — all O(input); driver state is
zero. ``keep_first=True`` additionally computes the minimum packed
site key per duplicated gram inside the same census aggregate (no
extra shuffle) — that packing requires doc_id < 2^31 and pos < 2^32,
documented on the argument.

Hash members follow the dedup.BASE_HASH_SQL family: xxhash64 for
production, md5_60 when a DuckDB oracle must replay the pipeline
digit-for-digit (the `dedup_exact` gate's 'substring' arms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import words_sql
from cod_stats_spark.operators._util import spread
from cod_stats_spark.operators.dedup import BASE_HASH_SQL

_PACK = 1 << 32  # site key = doc_id * 2^32 + pos (keep_first only)


def gram_sites(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """ALL positional gram sites (id, pos, gh) — the raw material the
    census and the incremental (streaming) variant both consume.
    spread(): the gram hashing is interpreted HOF work (CPU-bound
    even on small tables) and a single parquet split would serialize
    it on one core — the shingle-pipeline discipline."""
    return spread(docs).select(
        F.col(id_col),
        F.posexplode(
            F.expr(_gram_sites_sql(text_col, n, base_hash))
        ).alias("pos", "gh"),
    )


def _gram_sites_sql(text_col: str, n: int, base_hash: str) -> str:
    """SQL expression: array of positional n-gram hashes over the
    normalized whitespace tokens of ``text_col`` — element i is the
    hash of tokens[i .. i+n-1]; empty when the document has fewer
    than n tokens (no padded partial gram: positions must line up
    exactly with the reconstruction step)."""
    hash_fn = BASE_HASH_SQL[base_hash]
    gram = hash_fn(f"concat_ws(' ', slice(tk, i + 1, {n}))")
    body = (
        f"if(size(tk) >= {n},"
        f" transform(sequence(0, size(tk) - {n}), i -> {gram}),"
        f" cast(array() as array<bigint>))"
    )
    return f"transform(array({words_sql(text_col)}), tk -> {body})[0]"


def duplicate_gram_sites(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    min_count: int = 2,
    keep_first: bool = False,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(id, pos) sites whose token n-gram occurs at >= ``min_count``
    sites corpus-wide. With ``keep_first=True`` the globally first
    site of each duplicated gram (minimum (doc_id, pos)) is exempt —
    the keep-one-copy policy; requires doc_id < 2^31 (sites are
    ordered via the packed key doc_id·2^32 + pos so the argmin rides
    the census aggregate instead of a second window shuffle)."""
    sites = gram_sites(docs, text_col, id_col, n, base_hash)
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if keep_first:
        aggs.append(
            F.min(F.col(id_col) * F.lit(_PACK) + F.col("pos")).alias("_first")
        )
    census = sites.groupBy("gh").agg(*aggs).where(F.col("_cnt") >= min_count)
    out = sites.join(census, "gh")
    if keep_first:
        out = out.where(
            F.col(id_col) * F.lit(_PACK) + F.col("pos") != F.col("_first")
        )
    return out.select(id_col, "pos")


def duplicate_spans(
    sites: DataFrame,
    id_col: str = "doc_id",
    n: int = 50,
) -> DataFrame:
    """Maximal duplicated spans (id, span_start, span_end) — token
    index intervals [span_start, span_end) — from gram sites, each of
    which covers [pos, pos+n). Gaps-and-islands: a new island starts
    where pos exceeds the running max covered end; the island agg
    rides the window's doc_id exchange (same key, no second
    shuffle)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int")
    isle = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        sites.withColumn("_isle", isle)
        .groupBy(id_col, "_isle")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
        )
        .drop("_isle")
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild each document without its duplicated spans: (id,
    clean_text, n_spans, n_dup_tokens). ``clean_text`` is the kept
    tokens of the NORMALIZED text joined by single spaces (span
    positions index the normalized token array, so reconstruction
    must use the same tokens). Docs with no spans pass through with
    their normalized text and zeros. Pure Column HOFs — the per-doc
    span list arrives as a sorted array via one collect_list, bounded
    by doc length / n."""
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("n_dup_tokens"),
    )
    tk = F.expr(f"array({words_sql(text_col)})[0]")
    joined = spread(docs).select(F.col(id_col), tk.alias("_tk")).join(
        per_doc, id_col, "left"
    )
    sp = F.coalesce(
        F.col("_spans"),
        F.expr(
            "cast(array() as array<struct<span_start:int,span_end:int>>)"
        ),
    )
    pos = F.when(
        F.size("_tk") > 0, F.sequence(F.lit(0), F.size("_tk") - 1)
    ).otherwise(F.expr("cast(array() as array<int>)"))
    kept = F.filter(
        pos,
        lambda p: ~F.exists(
            sp, lambda s: (p >= s["span_start"]) & (p < s["span_end"])
        ),
    )
    clean = F.concat_ws(
        " ", F.transform(kept, lambda p: F.element_at("_tk", p + 1))
    )
    return joined.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("n_dup_tokens"), F.lit(0))
        .cast("long")
        .alias("n_dup_tokens"),
    )


def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    min_count: int = 2,
    keep_first: bool = False,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """The whole ExactSubstr pass: (id, clean_text, n_spans,
    n_dup_tokens). ``keep_first=False`` (default) removes every
    occurrence of a duplicated passage — Lee et al.'s released tool's
    behavior; ``keep_first=True`` keeps the globally first site."""
    sites = duplicate_gram_sites(
        docs, text_col, id_col, n, min_count, keep_first, base_hash
    )
    spans = duplicate_spans(sites, id_col, n)
    return remove_spans(docs, spans, text_col, id_col)


# ------------------------------------------------------------------
# DuckDB oracle


def substring_oracle_sql(
    src: str = "documents",
    n: int = 8,
    min_count: int = 2,
    keep_first: bool = False,
    emit_text: bool = False,
) -> str:
    """DuckDB replica of the full pipeline with the md5_60 hash
    member: positional gram hashes, duplicate census (+ packed-key
    argmin when keep_first), island merge, span removal, and the
    cleaned-text rebuild — emitted as (fp, keep_id, n_copies) =
    (md5 of cleaned normalized text, doc_id, removed token count) so
    one md5 comparison value-verifies every span boundary.
    ``emit_text`` adds the rebuilt text itself as a fourth column
    ``clean_text`` (the incremental-curation oracle feeds it to the
    decontamination replay downstream of the scrub)."""
    md5_60 = (
        "list_sum(list_transform(range(15), q ->"
        " (strpos('0123456789abcdef', md5(gram)[q+1:q+1]) - 1)::BIGINT"
        " * (1::BIGINT << (4*(14-q)))))"
    )
    first_sel = ", min(doc_id * 4294967296 + pos) AS first_sk" if keep_first else ""
    first_where = (
        "WHERE g.doc_id * 4294967296 + g.pos <> d.first_sk" if keep_first else ""
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                     t -> t <> '') AS tk
  FROM {src}
),
sites AS (
  SELECT doc_id, pos, {md5_60} AS gh
  FROM (
    SELECT doc_id, tk, unnest(CASE WHEN len(tk) >= {n}
                              THEN generate_series(0, len(tk) - {n})
                              ELSE [] END) AS pos
    FROM tok
  ), LATERAL (SELECT array_to_string(tk[pos + 1 : pos + {n}], ' ') AS gram)
),
dup AS (
  SELECT gh, count(*) AS c{first_sel}
  FROM sites GROUP BY gh HAVING count(*) >= {min_count}
),
marked AS (
  SELECT g.doc_id, g.pos FROM sites g JOIN dup d USING (gh) {first_where}
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + {n}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM marked
),
num AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS isle
  FROM isl
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {n} AS e
  FROM num GROUP BY doc_id, isle
),
cov AS (SELECT doc_id, unnest(generate_series(s, e - 1)) AS pos FROM spans),
toks AS (
  SELECT doc_id, pos, tk[pos + 1] AS w
  FROM tok, UNNEST(CASE WHEN len(tk) = 0 THEN []
                   ELSE generate_series(0, len(tk) - 1) END) AS u(pos)
),
kept AS (
  SELECT t.doc_id, t.pos, t.w
  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.pos IS NULL
),
clean AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS txt
  FROM kept GROUP BY doc_id
),
dupagg AS (SELECT doc_id, sum(e - s) AS ndup FROM spans GROUP BY doc_id)
SELECT md5(coalesce(c.txt, '')) AS fp,
       d.doc_id AS keep_id,
       coalesce(p.ndup, 0) AS n_copies{
    ", coalesce(c.txt, '') AS clean_text" if emit_text else ""}
FROM {src} d
LEFT JOIN clean c USING (doc_id)
LEFT JOIN dupagg p USING (doc_id)
"""
