"""Per-document repetition metrics — the Gopher-style quality signals
a pre-training corpus is filtered on (type-token ratio, most-frequent
n-gram mass, duplicated n-gram mass).

Two implementations with identical results:

- :func:`repetition_profile` (default) — ZERO-SHUFFLE: per doc, hash
  each n-gram to a long (xxhash64), ``array_sort``, and one
  ``aggregate`` fold computes the modal run length, duplicated mass,
  and total in a single pass over the sorted runs. One projection,
  no explode, no exchange: per-doc cost O(k log k) entirely map-side.
  This is the 100 TB shape — metric extraction rides the same scan
  that reads the text.
- :func:`repetition_profile_grouped` — the explicit relational form
  (tagged explode + two doc_id-keyed aggregations). Kept as the
  parity reference the fold is tested against; also the shape you'd
  use if you additionally needed the grams themselves.

The fold compares 64-bit gram hashes, not gram strings: within one
document a spurious xxhash64 collision (~k²/2⁶⁵) would be needed to
shift a count — negligible, and the DuckDB oracle (string-exact)
verifies it on the gate corpus.

Metrics (all per document):
- ``n_words`` / ``n_distinct_words`` / ``ttr`` — type-token ratio;
  templated spam sits near 0.
- ``top{n}gram_frac`` — occurrences of the modal word n-gram over all
  n-gram occurrences (Gopher's "fraction in most common n-gram").
- ``dup{n}gram_frac`` — occurrences belonging to any n-gram seen ≥2×
  over all occurrences (Gopher's "fraction in duplicated n-grams").

Documents shorter than n words contribute no n-grams and score 0.0
for that n (a 3-word doc is not "repetitive at n=5"); empty docs
score 0.0 everywhere. Normalization matches functions/text.py
(lowercase, collapse whitespace, trim).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions import text as T

_EMPTY_STR_ARRAY = "cast(array() as array<string>)"


def _slicer(n: int):
    # closure factory, NOT a default-arg lambda: a 2-arg lambda is
    # detected by PySpark as (element, index) and silently changes
    # semantics (see round-1 notes).
    return lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, n))


def _tagger(n: int):
    return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))


def _grams(n: int, k: Column) -> Column:
    """Non-distinct word n-grams from the bound token array ``tk``;
    empty (not degenerate-whole-doc) when the doc has < n words."""
    seq = F.sequence(F.lit(0), k - n)
    return F.when(k >= n, F.transform(seq, _slicer(n))).otherwise(
        F.expr(_EMPTY_STR_ARRAY)
    )


def _run_stats(grams: Column) -> Column:
    """struct(mx, dup) from one sorted-run fold over hashed grams:
    mx = longest run (modal gram count), dup = mass of runs ≥ 2."""
    hashed = F.array_sort(F.transform(grams, lambda g: F.xxhash64(g)))
    init = F.struct(
        F.lit(0).cast("bigint").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("mx"),
        F.lit(0).alias("dup"),
    )

    def step(acc: Column, e: Column) -> Column:
        flush_mx = F.greatest(acc["mx"], acc["run"])
        flush_dup = acc["dup"] + F.when(
            acc["run"] >= 2, acc["run"]
        ).otherwise(F.lit(0))
        return (
            F.when(
                acc["run"] == 0,
                F.struct(
                    e.alias("prev"),
                    F.lit(1).alias("run"),
                    acc["mx"].alias("mx"),
                    acc["dup"].alias("dup"),
                ),
            )
            .when(
                e == acc["prev"],
                F.struct(
                    acc["prev"].alias("prev"),
                    (acc["run"] + 1).alias("run"),
                    acc["mx"].alias("mx"),
                    acc["dup"].alias("dup"),
                ),
            )
            .otherwise(
                F.struct(
                    e.alias("prev"),
                    F.lit(1).alias("run"),
                    flush_mx.alias("mx"),
                    flush_dup.alias("dup"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            F.greatest(acc["mx"], acc["run"]).alias("mx"),
            (
                acc["dup"]
                + F.when(acc["run"] >= 2, acc["run"]).otherwise(F.lit(0))
            ).alias("dup"),
        )

    return F.aggregate(hashed, init, step, finish)


def _frac(num: Column, tot: Column) -> Column:
    return F.round(
        F.when(tot > 0, num.cast("double") / tot.cast("double")).otherwise(
            F.lit(0.0)
        ),
        6,
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: Sequence[int] = (2, 3, 5),
) -> DataFrame:
    """Gopher-style repetition metrics, one row per document —
    zero-shuffle sorted-run fold (see module docstring)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        T.words(T.normalize_text(F.col(text_col))).alias("tk"),
    )
    k = F.size(F.col("tk"))
    cols = [
        k.alias("n_words"),
        F.size(F.array_distinct("tk")).alias("n_distinct_words"),
    ]
    for n in ns:
        g = _grams(n, k)
        cols.append(_run_stats(g).alias(f"_s{n}"))
        cols.append(F.size(g).alias(f"_t{n}"))
    staged = base.select("doc_id", *cols)
    ttr = F.when(
        F.col("n_words") > 0,
        F.col("n_distinct_words").cast("double") / F.col("n_words").cast("double"),
    ).otherwise(F.lit(0.0))
    out = [
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.round(ttr, 6).alias("ttr"),
    ]
    for n in ns:
        s, t = F.col(f"_s{n}"), F.col(f"_t{n}")
        out.append(_frac(s["mx"], t).alias(f"top{n}gram_frac"))
        out.append(_frac(s["dup"], t).alias(f"dup{n}gram_frac"))
    return staged.select(*out)


def repetition_profile_grouped(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: Sequence[int] = (2, 3, 5),
) -> DataFrame:
    """Relational reference implementation: tagged explode + two
    doc_id-keyed hash aggregations (map-side combine). Same output as
    :func:`repetition_profile`; use when the exploded grams themselves
    are needed downstream."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        T.words(T.normalize_text(F.col(text_col))).alias("tk"),
    )
    k = F.size(F.col("tk"))
    tagged = F.flatten(F.array(*[F.transform(_grams(n, k), _tagger(n)) for n in ns]))
    # explode_outer: docs with no grams at any n (k < min(ns)) survive
    # as a single null-gram row, folded to 0.0 metrics below.
    pairs = base.select(
        "doc_id",
        k.alias("n_words"),
        F.size(F.array_distinct("tk")).alias("n_distinct_words"),
        F.explode_outer(tagged).alias("g"),
    )
    counts = pairs.groupBy(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.col("g.n").alias("n"),
        F.col("g.gram").alias("gram"),
    ).agg(F.count("*").alias("cnt"))
    per_n = counts.groupBy("doc_id", "n_words", "n_distinct_words", "n").agg(
        F.max("cnt").alias("mx"),
        F.sum("cnt").alias("tot"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup"
        ),
    )

    def frac(n: int, num: str) -> Column:
        picked_num = F.max(F.when(F.col("n") == n, F.col(num)))
        picked_tot = F.max(F.when(F.col("n") == n, F.col("tot")))
        return F.round(
            F.coalesce(
                picked_num.cast("double") / picked_tot.cast("double"), F.lit(0.0)
            ),
            6,
        )

    ttr = F.when(
        F.col("n_words") > 0,
        F.col("n_distinct_words").cast("double") / F.col("n_words").cast("double"),
    ).otherwise(F.lit(0.0))
    metric_cols = []
    for n in ns:
        metric_cols.append(frac(n, "mx").alias(f"top{n}gram_frac"))
        metric_cols.append(frac(n, "dup").alias(f"dup{n}gram_frac"))
    return (
        per_n.groupBy("doc_id", "n_words", "n_distinct_words")
        .agg(*metric_cols)
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            F.round(ttr, 6).alias("ttr"),
            *[c for n in ns for c in (f"top{n}gram_frac", f"dup{n}gram_frac")],
        )
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ttr: float = 0.2,
    max_top2: float = 0.20,
    max_top3: float = 0.18,
    max_dup5: float = 0.30,
    min_words: int = 5,
) -> DataFrame:
    """Keep documents passing the repetition gates (Gopher-flavored
    thresholds; callers tune per corpus). Returns the input rows of
    survivors via a co-partitioned semi join on the id."""
    prof = repetition_profile(df, text_col, id_col, ns=(2, 3, 5))
    keep = prof.filter(
        (F.col("n_words") >= min_words)
        & (F.col("ttr") >= min_ttr)
        & (F.col("top2gram_frac") <= max_top2)
        & (F.col("top3gram_frac") <= max_top3)
        & (F.col("dup5gram_frac") <= max_dup5)
    ).select(F.col("doc_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")
