"""Line/paragraph-level exact deduplication — the RefinedWeb/Dolma
boilerplate pass.

Web corpora repeat LINES far more than whole documents: navigation
strings, cookie banners, license footers, and templated headers recur
across millions of pages whose body text differs, so document-level
dedup (exact or near) never sees them. The published pipelines run an
exact duplicate-line pass for this (RefinedWeb's line-wise filtering —
Penedo et al. 2023 §3; Dolma's duplicate-paragraph removal — Soldaini
et al. 2024): split each document on a separator, drop repeated
lines corpus-wide, and reassemble the survivors in order.

Granularity sits between the whole-document fingerprint
(:mod:`operators.dedup`) and the token-span ExactSubstr pass
(:mod:`operators.substring`): cheaper than span dedup (no gram
explosion — one row per LINE, not per token window) and the form the
public pipelines actually ship for boilerplate.

Policies:

- ``keep_first=True`` (Dolma): the corpus-wide FIRST occurrence
  (smallest (doc, position)) survives; every later copy is scrubbed.
- ``keep_first=False`` (the aggressive boilerplate posture): ALL
  copies of any line occurring more than once are scrubbed — a
  navigation string's "first" page is no more legitimate than the
  rest.

Scrub decisions key on the NORMALIZED line (lower, inner whitespace
collapsed, trimmed — the dedup family's canonical form) but the
ORIGINAL line text is what survives reassembly. Blank/whitespace-only
lines and lines shorter than ``min_chars`` (normalized) are exempt —
deduping blank lines would collapse paragraph structure corpus-wide.

Plan: posexplode (one row per line) → one shuffle on the line hash
(keep-first is a groupBy min-struct, never a global sort) → one
shuffle on the doc id to reassemble (sorted collect_list, the
order_roster pattern). Both shuffles are O(total lines); driver state
is zero. Fully deterministic — :func:`line_dedup_oracle_sql` replays
every decision and the rebuilt text in DuckDB.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "line_dedup",
    "line_dedup_oracle_sql",
    "reassemble_lines",
    "split_lines",
]


def split_lines(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    sep: str,
    min_chars: int,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(id, _pos, _line, _elig, _h) — one row per line, with the
    normalized-line hash (a LONG from the dedup family's base-hash
    templates: xxhash64 for production — an 8-byte shuffle key instead
    of a 32-char digest — md5_60 when a DuckDB oracle must replay) and
    the dedup-eligibility flag. ONE definition shared by the one-shot
    pass and the incremental census (streaming/line_dedup.py), so
    line semantics cannot diverge."""
    from cod_stats_spark.operators.dedup import BASE_HASH_SQL

    if min_chars < 0:
        raise ValueError("line_dedup: min_chars must be >= 0")
    if not sep:
        raise ValueError("line_dedup: sep must be non-empty")
    if base_hash not in ("xxhash64", "md5_60"):
        raise ValueError(f"line_dedup: unknown base_hash {base_hash!r}")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep))
        ).alias("_pos", "_line"),
    ).withColumn(
        "_norm",
        F.trim(F.regexp_replace(F.lower(F.col("_line")), r"\s+", " ")),
    )
    elig = (F.col("_norm") != "") & (
        F.length("_norm") >= F.lit(int(min_chars))
    )
    return (
        lines.withColumn("_elig", elig)
        .withColumn("_h", F.expr(BASE_HASH_SQL[base_hash]("_norm")))
        .drop("_norm")
    )


def reassemble_lines(
    lines: DataFrame, docs: DataFrame, id_col: str, sep: str, kept
) -> DataFrame:
    """(id, clean_text, n_lines, n_kept) from a line frame and a
    Column of keep decisions — survivors rejoin in original order
    (sorted collect, the order_roster pattern); every input doc
    returns a row (a null/empty text still carries its single empty
    line through)."""
    per_doc = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("_pos"), F.col("_line")))
                    )
                ),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("clean_text"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
    keep_first: bool = True,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(id, clean_text, n_lines, n_kept) — one row per input document.

    ``sep`` is a LITERAL separator string (escaped for the split;
    reassembly joins with the same literal). ``min_chars`` exempts
    short normalized lines from dedup (0 would still exempt blank
    lines — structure, not content). ``base_hash``: xxhash64 (the
    production default — an 8-byte shuffle key) or md5_60 (the
    SQL-oracle-replayable member; the dedup-family dual).
    ``clean_text`` may be '' when every line was scrubbed; the caller
    decides whether empty docs drop (the substring_dedup
    convention)."""
    lines = split_lines(docs, text_col, id_col, sep, min_chars, base_hash)
    stats = (
        lines.filter(F.col("_elig"))
        .groupBy("_h")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_first"),
            F.count(F.lit(1)).alias("_c"),
        )
    )
    joined = lines.join(stats, "_h", "left")
    if keep_first:
        kept = ~F.col("_elig") | (
            (F.col("_first")[id_col] == F.col(id_col))
            & (F.col("_first")["_pos"] == F.col("_pos"))
        )
    else:
        kept = ~F.col("_elig") | (F.col("_c") == 1)
    return reassemble_lines(joined, docs, id_col, sep, kept)


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB standard-conforming literal;
    non-printable characters (the usual '\\n'/'\\t' separators) become
    chr() concatenations — a backslash escape would stay LITERAL under
    standard SQL strings (the r13 escaping trap)."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        if ch.isprintable() and ch != "'":
            buf += ch
        else:
            if buf:
                parts.append(f"'{buf}'")
                buf = ""
            parts.append(f"chr({ord(ch)})" if ch != "'" else "''''")
    if buf:
        parts.append(f"'{buf}'")
    return " || ".join(parts) if parts else "''"


def line_dedup_oracle_sql(
    src: str = "documents",
    text_sql: str = "text",
    id_sql: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
    keep_first: bool = True,
) -> str:
    """DuckDB replica of the ``base_hash='md5_60'`` member —
    (doc_id, clean_text, n_lines, n_kept) with the same normalization,
    eligibility, 60-bit hash, first-occurrence rule ((doc, pos)
    lexicographic; a window rank replays the groupBy min-struct), and
    in-order reassembly."""
    from cod_stats_spark.operators.quality_classifier import _DUCK_MD5_60

    h60 = _DUCK_MD5_60.format(x="norm")
    s = _sql_str(sep)
    keep_rule = "rn = 1" if keep_first else "c = 1"
    return f"""
WITH raw AS (
  SELECT {id_sql} AS doc_id,
         string_split(coalesce({text_sql}, ''), {s}) AS ls
  FROM {src}
),
lin AS (
  SELECT doc_id, i AS pos, ls[i + 1] AS line,
         trim(regexp_replace(lower(ls[i + 1]), '\\s+', ' ', 'g')) AS norm
  FROM raw, UNNEST(generate_series(0, len(ls) - 1)) u(i)
),
el AS (
  SELECT *, {h60} AS h,
         (norm <> '' AND length(norm) >= {int(min_chars)}) AS elig
  FROM lin
),
ranked AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY h) AS c
  FROM el WHERE elig
),
kept AS (
  SELECT doc_id, pos, line FROM el WHERE NOT elig
  UNION ALL
  SELECT doc_id, pos, line FROM ranked WHERE {keep_rule}
),
agg AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY pos), {s}) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (
  SELECT doc_id, count(*) AS n_lines FROM el GROUP BY doc_id
)
SELECT r.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       coalesce(t.n_lines, 0) AS n_lines,
       coalesce(a.n_kept, 0) AS n_kept
FROM (SELECT DISTINCT doc_id FROM raw) r
LEFT JOIN agg a USING (doc_id)
LEFT JOIN tot t USING (doc_id)
"""
