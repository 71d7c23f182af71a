"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent per partitioning — re-running on a
repartitioned table yields a different sample, which poisons
reproducibility. These operators hash a stable key instead: a row is
in the sample iff md5(key) falls below a threshold, so the sample is
a pure function of the data. Per-stratum rates give balanced corpora
(e.g. downsample 'en' to 10%, keep low-resource languages whole).

md5 (not xxhash64) so the exact same sample can be reproduced by any
other engine — the correctness gate exercises this against DuckDB.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(key: Column, buckets: int = 1 << 20) -> Column:
    """Uniform bucket in [0, buckets) from the md5 of the key (first 5
    hex chars = 20 bits), identical in any engine with md5 + conv."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 5), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, chosen by hash of ``key_col`` (+salt).

    Stable under repartitioning, re-runs, and engine changes; different
    salts draw independent samples.
    """
    buckets = 1 << 20
    threshold = int(fraction * buckets)
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    return df.filter(_hash_bucket(key) < threshold)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws u ∈ (0,1] as a pure hash of its key,
    gets sort key u^(1/w), and the top-``n`` sort keys are the sample —
    inclusion probability proportional to weight, reproducible under
    any partitioning / engine / re-run (different salts draw
    independent samples).

    Plan: one codegen'd projection + TakeOrderedAndProject (per-
    partition n-row heaps, driver merges n rows) — no shuffle, no full
    sort. The standard tool for importance-weighted subsampling
    (quality-score-weighted corpus thinning, source rebalancing).
    Rows with weight <= 0 are excluded (their u^(1/w) is undefined).
    """
    buckets = 1 << 52  # double-exact integer range
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    u = (
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") + 1.0
    ) / F.lit(float(buckets))  # (0, 1]
    w = F.col(weight_col).cast("double")
    # round the sort key to 12 dp: pow() is not guaranteed correctly
    # rounded, so two engines can disagree by 1 ulp — enough to swap
    # near-tied rows at the sample boundary. Keys are hash-uniform in
    # (0,1] (typical spacing ≫ 1e-12), so 12 dp keeps them distinct
    # while making the order engine-independent; exact ties fall to
    # the key column.
    sort_key = F.round(F.pow(u, 1.0 / w), 12)
    return (
        df.filter(w > 0)
        .withColumn("_es_key", sort_key)
        .orderBy(F.col("_es_key").desc(), F.col(key_col).asc())
        .limit(n)
        .drop("_es_key")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the `sampleBy` shape, made
    reproducible): each stratum keeps its own fraction."""
    buckets = 1 << 20
    thr = F.lit(int(default_fraction * buckets))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * buckets))
        ).otherwise(thr)
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    return df.filter(_hash_bucket(key) < thr)
