"""Per-document repetition metrics — the Gopher-style quality signals
a pre-training corpus is filtered on (type-token ratio, most-frequent
n-gram mass, duplicated n-gram mass).

Shape at 100 TB: one projection computes the token array, one explode
fans word n-grams out tagged with their n, and two aggregations keyed
by doc_id reduce them back — both hash aggregations get map-side
partial combine, and everything stays co-partitioned on doc_id after
the first shuffle. Nothing is all-pairs and no state exceeds one
document's gram multiset.

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


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: Sequence[int] = (2, 3, 5),
) -> DataFrame:
    """Gopher-style repetition metrics, one row per document."""
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
