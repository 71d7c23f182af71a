"""Bloom-filter membership — the Dolma dedup posture as relations.

Dolma's deduper (Soldaini et al. 2024) is literally a Bloom filter
over document URLs and paragraph hashes: at crawl scale an EXACT seen
set costs a corpus-sized state join per batch, while a Bloom filter
answers "definitely new" from a structure ~10 bits per item with a
tunable false-positive rate — new items skip the expensive exact
probe entirely, and the filter itself unions by bitwise OR (perfectly
incremental, order-independent).

Spark-first shape: the filter IS a relation — (word, bits), one row
per non-zero 64-bit word of the bit array — built with a groupBy
``bit_or`` aggregate (map-side partial OR absorbs repeats) and probed
with a broadcast join. No driver-side bitmap, no UDFs: bit positions
come from the double-hashing scheme h_i(x) = h1(x) + i·h2(x) mod m
(Kirsch & Mitzenmacher 2006 — two base hashes give the k probes),
with both base hashes REDUCED mod m before the combination so every
intermediate stays far inside long range — no overflow semantics to
match across engines, and :func:`bloom_oracle_sql` replays build AND
probe in plain BIGINT arithmetic with the md5-derived members. The
xxhash64 members are the production default (the dedup-family dual).

Sizing: m bits for n items at k hashes gives false-positive rate
≈ (1 − e^(−k·n/m))^k (:func:`bloom_fp_rate`); the classic optimum is
k ≈ 0.7·m/n. The relation is at most m/64 rows ≈ m/8 bytes — 10
bits/item means ~1.25 bytes/item, broadcastable to ~10⁹ items.

Semantics: ``bloom_probe``'s ``maybe_member`` is TRUE for every
inserted value (no false negatives — tested) and false-positive for
absent values at the designed rate; "definitely new" (False) is the
load-bearing answer. NULL values probe nothing and are never members.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_fp_rate",
    "bloom_oracle_sql",
    "bloom_probe",
]


def _positions(
    col: Column, num_bits: int, num_hashes: int, base_hash: str
) -> Column:
    """Array of ``num_hashes`` bit positions in [0, num_bits) — pure
    Column arithmetic shared by build and probe. Both base hashes
    reduce mod m first: h1m + i·h2m ≤ 17·m stays exactly
    representable for any practical m, so no engine-specific overflow
    wrap ever participates."""
    if base_hash == "xxhash64":
        h1 = F.xxhash64(col)
        h2 = F.xxhash64(col, F.lit("bloom2"))
    elif base_hash == "md5_60":
        s1 = F.md5(col.cast("string"))
        s2 = F.md5(F.concat(col.cast("string"), F.lit("bloom2")))
        h1 = F.conv(F.substring(s1, 1, 15), 16, 10).cast("bigint")
        h2 = F.conv(F.substring(s2, 1, 15), 16, 10).cast("bigint")
    else:
        raise ValueError(f"bloom: unknown base_hash {base_hash!r}")
    m = F.lit(int(num_bits))
    h1m = F.pmod(h1, m)
    h2m = F.pmod(h2, m)
    return F.array(
        *[F.pmod(h1m + F.lit(i) * h2m, m) for i in range(int(num_hashes))]
    )


def bloom_fp_rate(n_items: int, num_bits: int, num_hashes: int) -> float:
    """Design false-positive rate ≈ (1 − e^(−k·n/m))^k."""
    if min(n_items, num_bits, num_hashes) <= 0:
        raise ValueError("bloom_fp_rate: all arguments must be > 0")
    k, n, m = num_hashes, n_items, num_bits
    return (1.0 - math.exp(-k * n / m)) ** k


def _validate(num_bits: int, num_hashes: int) -> None:
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError("bloom: num_bits must be a positive multiple of 64")
    if not (1 <= num_hashes <= 16):
        raise ValueError("bloom: num_hashes must be in [1, 16]")


def _word_mask() -> tuple[Column, Column]:
    """(word index, single-bit mask) from a ``_p`` bit-position
    column — SQL expressions because pyspark's ``shiftleft`` only
    takes a literal shift count; `_p div 64` is exact integer
    division."""
    return (
        F.expr("_p div 64").cast("long").alias("word"),
        F.expr("shiftleft(1L, cast(pmod(_p, 64) as int))").alias("_m"),
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int,
    num_hashes: int = 7,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(word, bits) — the filter's non-zero 64-bit words. One explode
    (k rows per value) + one groupBy ``bit_or`` shuffle bounded by
    min(k·n, m/64) rows; merging two filters (or appending a batch)
    is the same groupBy OR over the union — order-independent, so an
    incremental build is trivially replay-safe."""
    _validate(num_bits, num_hashes)
    pos = _positions(F.col(col), num_bits, num_hashes, base_hash)
    word, mask = _word_mask()
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(pos).alias("_p"))
        .select(word, mask)
        .groupBy("word")
        .agg(F.expr("bit_or(_m)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int = 7,
    base_hash: str = "xxhash64",
    out_col: str = "maybe_member",
    broadcast_filter: bool = True,
) -> DataFrame:
    """df + ``out_col`` boolean: False = DEFINITELY not inserted;
    True = inserted, or a false positive at the designed rate.

    Membership is a function of the VALUE, so the probe runs over the
    distinct values (one explode to k rows, a broadcast join against
    the (word, bits) relation — a word absent from it is an all-zero
    word, the left join's NULL — and one groupBy counting satisfied
    probes), then rejoins the input by value: duplicate rows pay one
    probe, and no synthetic row id is needed (a regenerated
    monotonically_increasing_id can diverge between a self-join's
    branches). NULL values get False.

    ``broadcast_filter=False`` leaves the filter join shuffled for
    filters past broadcast size (the model-relation convention)."""
    _validate(num_bits, num_hashes)
    hint = F.broadcast if broadcast_filter else (lambda d: d)
    vals = df.select(F.col(col).alias("_v")).where(
        F.col("_v").isNotNull()
    ).distinct()
    pos = _positions(F.col("_v"), num_bits, num_hashes, base_hash)
    word, mask = _word_mask()
    probes = vals.select("_v", F.explode(pos).alias("_p")).select(
        "_v", word, mask
    )
    members = (
        probes.join(hint(bloom), "word", "left")
        .withColumn(
            "_hit",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m"))
                == F.col("_m")
            ).cast("long"),
        )
        .groupBy("_v")
        .agg(
            (F.sum("_hit") == F.lit(int(num_hashes))).alias("_member")
        )
    )
    out = df.join(members, df[col] == members["_v"], "left")
    return out.withColumn(
        out_col, F.coalesce(F.col("_member"), F.lit(False))
    ).drop("_v", "_member")


def _duck_positions(x: str, num_bits: int, num_hashes: int) -> str:
    """DuckDB list of bit positions — the md5_60 pair reduced mod m
    exactly as the Spark side: plain BIGINT arithmetic throughout."""
    d60 = (
        "list_sum(list_transform(range(15), q ->"
        " (strpos('0123456789abcdef', md5({e})[q+1:q+1]) - 1)::BIGINT"
        " * (1::BIGINT << (4*(14-q)))))"
    )
    h1 = d60.format(e=f"CAST({x} AS VARCHAR)")
    h2 = d60.format(e=f"CAST({x} AS VARCHAR) || 'bloom2'")
    m = int(num_bits)
    # 60-bit hashes are non-negative, so % m is already in [0, m)
    return (
        f"list_transform(range({int(num_hashes)}),"
        f" i -> (({h1}) % {m} + i * (({h2}) % {m})) % {m})"
    )



def _duck_mask(pexpr: str) -> str:
    """Single-bit BIGINT mask in DuckDB — bit 63 is the sign bit and
    DuckDB's checked `<<` refuses 1<<63, so it is spelled as the
    two's-complement minimum (what Spark's wrapping shiftleft
    yields)."""
    return (
        f"CASE WHEN ({pexpr}) % 64 = 63"
        " THEN CAST('-9223372036854775808' AS BIGINT)"
        f" ELSE 1::BIGINT << (({pexpr}) % 64)::INT END"
    )


def bloom_oracle_sql(
    src: str,
    col: str,
    num_bits: int,
    num_hashes: int = 7,
    probe_src: str | None = None,
    probe_col: str | None = None,
    probe_id: str = "doc_id",
) -> str:
    """DuckDB replay of the ``md5_60`` member. Without ``probe_src``:
    the filter words — (word, bits). With it: per-probe-row
    (``probe_id``, maybe_member) against the filter built from
    ``src`` (NULL probe values get FALSE, the Spark contract).
    Hit counts aggregate per DISTINCT probe VALUE and rejoin the
    probe rows by value — the Spark plan's own shape — so duplicate
    ``probe_id`` values (or duplicate rows) can never merge counts
    across rows (r14 advice); ``probe_id`` carries no uniqueness
    requirement, it is only echoed through."""
    _validate(num_bits, num_hashes)
    pos = _duck_positions(col, num_bits, num_hashes)
    words = f"""
SELECT p // 64 AS word, bit_or({_duck_mask('p')}) AS bits
FROM (
  SELECT unnest({pos}) AS p
  FROM {src} WHERE {col} IS NOT NULL
)
GROUP BY word
"""
    if probe_src is None:
        return words
    pc = probe_col or col
    ppos = _duck_positions("v", num_bits, num_hashes)
    return f"""
WITH bloom_words AS ({words}),
probe_vals AS (
  SELECT DISTINCT {pc} AS v FROM {probe_src} WHERE {pc} IS NOT NULL
),
probe_rows AS (
  SELECT v, unnest({ppos}) AS p
  FROM probe_vals
),
hit_counts AS (
  SELECT pr.v,
         sum(CASE WHEN (coalesce(w.bits, 0) & ({_duck_mask('pr.p')}))
                       = ({_duck_mask('pr.p')})
                  THEN 1 ELSE 0 END) AS nhit
  FROM probe_rows pr
  LEFT JOIN bloom_words w ON w.word = pr.p // 64
  GROUP BY pr.v
)
SELECT s.{probe_id} AS pid,
       coalesce(h.nhit = {int(num_hashes)}, FALSE) AS maybe_member
FROM {probe_src} s
LEFT JOIN hit_counts h ON h.v = s.{pc}
"""
