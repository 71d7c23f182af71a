"""Mergeable HyperLogLog sketch state — incremental distinct counts.

Spark's ``approx_count_distinct`` answers "how many distinct NOW" in
one pass, but its HLL++ state is opaque: you cannot persist a batch's
sketch and merge it with tomorrow's without rescanning both. At
100 TB the pattern that matters is PRE-AGGREGATED SKETCH STATE: each
ingest batch/day/partition reduces to a few KB of registers, stored
next to the data, and any window of batches merges in milliseconds —
distinct users over any date range without touching the events again.

This module implements that state explicitly, flat and engine-
portable (Flajolet et al., "HyperLogLog: the analysis of a near-
optimal cardinality estimation algorithm", AofA 2007):

- :func:`hll_partial`   — (group..., register, rho) rows: one shuffle,
                          the mergeable unit. Store it as a table.
- :func:`hll_merge`     — union + max(rho) per register. Associative
                          and idempotent, so ANY merge tree (daily →
                          monthly → total) gives the identical state.
- :func:`hll_estimate`  — registers → cardinality estimate, with the
                          standard linear-counting small-range branch.

Everything is Column arithmetic (no UDFs). The rho computation uses
``length(bin(w))`` for the integer bit length — exact in both Spark
and DuckDB — and the estimator's register sum is computed in DECIMAL
integer space (each 2^(R-rho) term is exact, the sum is exact, ONE
rounding at the final double division), so the md5-member estimate is
value-reproducible digit-for-digit by a SQL oracle: the
`sketch_aggregates` gate replays state AND estimate in DuckDB.

Accuracy: the standard ~1.04/sqrt(m) relative error (m = 2^p
registers); property-tested against exact distinct counts.

All three sketch families in this module (HLL, count-min, fixed-bin
histogram) are plain groupBy aggregations, so the SAME partial
builders run unchanged on a Structured Streaming readStream — bounded
state in complete/update mode, and the materialized state merges with
stored batch states afterwards (parity-tested in
tests/test_streaming.py::TestStreamingSketchState).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.dedup import BASE_HASH_SQL

_NBITS = {"xxhash64": 64, "md5_64": 64, "md5_60": 60}


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_partial(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p: int = 12,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(group..., register, rho) — the mergeable HLL state, max'd per
    register. One shuffle on (group, register); at most m = 2^p rows
    per group regardless of input size. Null values are ignored
    (COUNT DISTINCT semantics)."""
    nbits = _NBITS[base_hash]
    if not 4 <= p <= nbits - 8:
        raise ValueError(f"hll_partial: p={p} out of range for {base_hash}")
    m = 1 << p
    wbits = nbits - p
    h = BASE_HASH_SQL[base_hash](f"cast(`{value_col}` as string)")
    # register = low p bits; w = the remaining hash bits; rho = count
    # of leading zeros in the wbits window + 1 — via the exact integer
    # bit length length(bin(w)), identical in Spark and DuckDB
    reg = f"cast(({h}) & {m - 1} as int)"
    w = f"shiftrightunsigned({h}, {p})"
    rho = (
        f"cast(if({w} = 0, {wbits + 1},"
        f" {wbits + 1} - length(bin({w}))) as int)"
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.expr(reg).alias("register"),
            F.expr(rho).alias("rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(group_cols: list[str], *states: DataFrame) -> DataFrame:
    """Merge any number of compatible partial states (same p, same
    hash): union + max per register. max is associative/commutative/
    idempotent, so daily → monthly → yearly rollup trees, re-merges,
    and replays all converge to the identical state."""
    if not states:
        raise ValueError("hll_merge: need at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(
    state: DataFrame,
    group_cols: list[str],
    p: int = 12,
    base_hash: str = "xxhash64",
    out_col: str = "approx_distinct",
    decimals: int = 4,
) -> DataFrame:
    """Per-group cardinality estimate from a partial state.

    Exact-arithmetic shape for oracle parity: the indicator sum
    Σ 2^(−rho) is scaled by 2^R (R = max possible rho) into DECIMAL
    integers — every term and the sum are exact — and the only float
    roundings are the final cast + division, which both engines
    perform identically on identical integers. Small-range correction:
    linear counting m·ln(m/V) when E_raw ≤ 2.5m and V (empty
    registers) > 0 — the standard HLL branch structure."""
    nbits = _NBITS[base_hash]
    m = 1 << p
    wbits = nbits - p
    R = wbits + 1
    c = _alpha(m) * m * m * (2.0**R)  # python double, embedded as literal
    agg = state.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_present"),
        F.sum(
            F.expr(f"cast(shiftleft(cast(1 as bigint), {R} - rho) as decimal(38,0))")
        ).alias("_s_present"),
    )
    zeros = (F.lit(m) - F.col("_n_present")).cast("long")
    s_total = F.col("_s_present") + zeros.cast("decimal(38,0)") * F.lit(
        2**R
    ).cast("decimal(38,0)")
    e_raw = F.lit(float(c)) / s_total.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols, F.round(est, decimals).alias(out_col)
    )


def hll_sliding_estimate(
    state: DataFrame,
    group_cols: list[str],
    day_col: str,
    window_days: int,
    p: int = 12,
    base_hash: str = "xxhash64",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Trailing-window distinct counts from STORED per-day states —
    the query the mergeable representation exists for: "distinct users
    over the trailing N days, for every day" without rescanning any
    event. For each day in the state, merge the registers of the
    preceding ``window_days`` days (range join on the tiny state
    table — days × m rows per group — then max(rho) per register) and
    estimate. The events tables never participate; cost is independent
    of corpus size.

    The day frame is DENSIFIED — distinct groups × distinct days in
    the state (a cross join of two tiny driver-bounded sets), not
    just the (group, day) pairs that have events. A group idle on day
    d but active on d-2 still owes a trailing-window row for d; with
    the sparse frame it silently vanished whenever its last event
    predated the anchor day (the hll_trail7 gate only passed because
    the testdata kept every group active on the final day). Pairs
    where the group has NO state day inside the window drop out in
    the inner join below — matching a per-window GROUP BY over the
    raw events, which emits nothing for a group with no events."""
    groups = state.select(*group_cols).distinct()
    days = groups.crossJoin(
        F.broadcast(state.select(F.col(day_col)).distinct())
    )
    s = state.select(
        *[F.col(c).alias(f"_s_{c}") for c in group_cols],
        F.col(day_col).alias("_s_day"),
        "register",
        "rho",
    )
    cond = [days[c] == s[f"_s_{c}"] for c in group_cols] + [
        s["_s_day"] <= days[day_col],
        s["_s_day"] >= F.date_sub(days[day_col], window_days - 1),
    ]
    merged = (
        days.join(s, cond)
        .groupBy(*group_cols, day_col, "register")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_estimate(
        merged, [*group_cols, day_col], p=p, base_hash=base_hash,
        out_col=out_col,
    )


def hll_intersection_estimate(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    p: int = 12,
    base_hash: str = "xxhash64",
    out_col: str = "approx_intersection",
    decimals: int = 4,
) -> DataFrame:
    """|A ∩ B| by inclusion-exclusion over stored states:
    est(A) + est(B) − est(A ∪ B), floored at 0 — the set-algebra
    query mergeable sketches unlock (the union state is one
    max-per-register merge; the raw events never participate).
    Standard HLL caveat: the subtraction compounds the ±1.04/√m
    relative errors of three estimates, so small intersections of
    large sets are noisy — size m for the sets, not the overlap.
    Groups present in only one input yield no row (inner join on the
    group key): an empty other side means est(B) and est(A∪B)−est(A)
    both vanish, i.e. the estimate would be 0 anyway."""
    ea = hll_estimate(a, group_cols, p, base_hash, "_ea", decimals=10)
    eb = hll_estimate(b, group_cols, p, base_hash, "_eb", decimals=10)
    eu = hll_estimate(
        hll_merge(group_cols, a, b), group_cols, p, base_hash, "_eu",
        decimals=10,
    )
    est = F.greatest(
        F.col("_ea") + F.col("_eb") - F.col("_eu"), F.lit(0.0)
    )
    return (
        ea.join(eb, group_cols)
        .join(eu, group_cols)
        .select(*group_cols, F.round(est, decimals).alias(out_col))
    )


def hll_oracle_sql(
    src: str,
    value_sql: str,
    group_sql: str,
    p: int,
    where: str = "TRUE",
    decimals: int = 4,
) -> str:
    """DuckDB replica of hll_partial∘hll_estimate with the md5_60 hash
    member — state construction, register max, exact integer register
    sum, and both estimator branches, so the gate value-verifies the
    whole sketch path digit-for-digit. ``value_sql`` must render the
    SAME string Spark's cast produces (e.g. ``user_id::VARCHAR``)."""
    nbits = 60
    m = 1 << p
    wbits = nbits - p
    R = wbits + 1
    c = _alpha(m) * m * m * (2.0**R)
    md5_60 = (
        "list_sum(list_transform(range(15), q ->"
        " (strpos('0123456789abcdef', md5({e})[q+1:q+1]) - 1)::BIGINT"
        " * (1::BIGINT << (4*(14-q)))))"
    ).format(e=value_sql)
    return f"""
SELECT g, round(CASE WHEN e_raw <= {2.5 * m} AND zeros > 0
                     THEN {float(m)!r} * ln({float(m)!r} / zeros)
                     ELSE e_raw END, {decimals}) AS approx_distinct
FROM (
  SELECT g, ({m} - count(*)) AS zeros,
         {c!r} / (sum((1::BIGINT << ({R} - rho))::DECIMAL(38,0))
                  + ({m} - count(*))::DECIMAL(38,0) * {2**R}::DECIMAL(38,0))::DOUBLE AS e_raw
  FROM (
    SELECT g, register, max(rho) AS rho
    FROM (
      SELECT g, (h & {m - 1}) AS register,
             CASE WHEN (h >> {p}) = 0 THEN {wbits + 1}
                  ELSE {wbits + 1} - length(bin(h >> {p})) END AS rho
      FROM (
        SELECT {group_sql} AS g, {md5_60} AS h
        FROM {src} WHERE ({where}) AND ({value_sql}) IS NOT NULL
      )
    ) GROUP BY g, register
  ) GROUP BY g
)
"""


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency state + heavy hitters
# ---------------------------------------------------------------------------
#
# Same production shape as the HLL above, for FREQUENCIES instead of
# cardinalities (Cormode & Muthukrishnan, "An improved data stream
# summary: the count-min sketch and its applications", J.Alg 2005):
# each batch reduces to a depth×width grid of counters stored next to
# the data; any window of batches merges by cell-wise SUM (exact, since
# counters are additive); a point query reads depth cells and takes the
# min. At 100 TB that means "how often did THIS user/url/token appear
# over any date range" without rescanning, in depth·width·groups rows
# of state — and heavy hitters fall out by probing the batch's distinct
# items against the merged state.
#
# Guarantees: est ≥ true count always (counters only overcount);
# est ≤ true + εN with probability 1−δ for width = ⌈e/ε⌉, depth =
# ⌈ln 1/δ⌉. Hash family: the per-depth salted base hash
# hash('cms{d}:' || value) — independent-enough in practice and, with
# the md5_60 member, digit-for-digit reproducible by the DuckDB oracle
# (the `sketch_aggregates` gate replays state, merge, and query).


def _cms_cell_sql(value_sql: str, d: int, width: int, base_hash: str) -> str:
    """The depth-``d`` cell index for ``value_sql`` (Spark SQL dialect):
    salted base hash mod width. Hash values are non-negative (md5_60
    is 60-bit, xxhash64 is masked below), so `%` == pmod."""
    h = BASE_HASH_SQL[base_hash](f"concat('cms{d}:', {value_sql})")
    if base_hash == "xxhash64":
        h = f"(({h}) & 4611686018427387903)"  # clear sign: 2^62-1 mask
    return f"cast(({h}) % {width} as int)"


def cms_partial(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    depth: int = 4,
    width: int = 512,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(group..., d, w, cnt) — the mergeable count-min state. One
    explode (depth rows per input row, map-side) + one shuffle on
    (group, d, w); at most depth·width rows per group regardless of
    input size. Nulls are ignored."""
    if depth < 1 or width < 2:
        raise ValueError(f"cms_partial: bad depth={depth}/width={width}")
    v = f"cast(`{value_col}` as string)"
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.expr(_cms_cell_sql(v, d, width, base_hash)).alias("w"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.explode(cells).alias("_cell"))
        .groupBy(*group_cols, F.col("_cell.d").alias("d"), F.col("_cell.w").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(group_cols: list[str], *states: DataFrame) -> DataFrame:
    """Merge compatible partial states (same depth/width/hash):
    union + sum per cell. Counter addition is associative and
    commutative, so any merge tree yields the identical state — and
    unlike the HLL max-merge it is NOT idempotent: merging a batch
    twice double-counts, which is the correct semantics for counts."""
    if not states:
        raise ValueError("cms_merge: need at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    state: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 512,
    base_hash: str = "xxhash64",
    out_col: str = "est_count",
) -> DataFrame:
    """Point-query ``probes`` (group..., value) against a state: each
    probe's depth cells left-join the state (missing cell → 0) and the
    minimum over depth is the estimate. The state is bounded at
    depth·width rows per group, so it is broadcast — probes stream
    map-side with zero shuffle on the big side (one small agg brings
    the depth cells of each probe back together)."""
    v = f"cast(`{value_col}` as string)"
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.expr(_cms_cell_sql(v, d, width, base_hash)).alias("w"),
            )
            for d in range(depth)
        ]
    )
    pc = probes.select(
        *group_cols, F.col(value_col), F.explode(cells).alias("_cell")
    ).select(*group_cols, value_col, F.col("_cell.d").alias("d"), F.col("_cell.w").alias("w"))
    joined = pc.join(F.broadcast(state), [*group_cols, "d", "w"], "left")
    return (
        joined.groupBy(*group_cols, value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def cms_heavy_hitters(
    state: DataFrame,
    candidates: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold,
    depth: int = 4,
    width: int = 512,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Items whose estimated count ≥ ``threshold`` (a literal or a
    Column over the estimate row). CMS never undercounts, so recall is
    100% — every true heavy hitter survives; the εN overcount bound
    caps false positives. ``candidates`` supplies the probe set (the
    classic pattern: the current batch's distinct items probe the
    all-time merged state)."""
    est = cms_query(
        state, candidates, group_cols, value_col,
        depth=depth, width=width, base_hash=base_hash,
    )
    thr = threshold if isinstance(threshold, Column) else F.lit(threshold)
    return est.where(F.col("est_count") >= thr)


def cms_oracle_sql(
    src: str,
    value_sql: str,
    group_sql: str,
    depth: int,
    width: int,
    where: str = "TRUE",
) -> str:
    """DuckDB replica of cms_partial∘cms_merge∘cms_query with the
    md5_60 hash member, probing every distinct (group, value) in
    ``src``: yields (g, v, est_count) for the gate to filter/aggregate.
    Counters are integers — no float rounding anywhere."""

    def md5_60(e: str) -> str:
        return (
            "list_sum(list_transform(range(15), q ->"
            f" (strpos('0123456789abcdef', md5({e})[q+1:q+1]) - 1)::BIGINT"
            " * (1::BIGINT << (4*(14-q)))))"
        )

    def cell(d: int) -> str:
        salted = f"'cms{d}:' || v"
        return f"({md5_60(salted)}) % {width}"

    cells = "\n  UNION ALL\n".join(
        f"  SELECT g, v, {d} AS d, {cell(d)} AS w FROM items" for d in range(depth)
    )
    return f"""
WITH items AS (
  SELECT {group_sql} AS g, ({value_sql}) AS v
  FROM {src} WHERE ({where}) AND ({value_sql}) IS NOT NULL
), cells AS (
{cells}
), state AS (
  SELECT g, d, w, count(*) AS cnt FROM cells GROUP BY g, d, w
), probe_cells AS (
  SELECT DISTINCT g, v, d, w FROM cells
)
SELECT p.g, p.v, min(s.cnt) AS est_count
FROM probe_cells p JOIN state s USING (g, d, w)
GROUP BY p.g, p.v
"""


# ---------------------------------------------------------------------------
# Fixed-bin histogram — mergeable quantile state
# ---------------------------------------------------------------------------
#
# The third leg of the mergeable-state trio (HLL → distincts, CMS →
# frequencies, histogram → quantiles). percentile_approx's KLL-style
# state is opaque and randomized; the fixed-bin histogram trades
# adaptivity for a state that is (a) additive — cells merge by SUM,
# any tree converges — and (b) fully deterministic rational
# arithmetic, so estimates replay digit-for-digit in a SQL oracle.
# Bin bounds are part of the contract (from domain knowledge or a
# min/max pass); error is bounded by one bin width. At most nbins
# rows per group regardless of input size.


def hist_partial(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    nbins: int = 256,
) -> DataFrame:
    """(group..., bin, cnt) — the mergeable histogram state. Values
    are clamped into [lo, hi] (outliers land in the edge bins, a
    documented property of the fixed-bin contract). Nulls ignored.
    One shuffle on (group, bin)."""
    if not (hi > lo) or nbins < 1:
        raise ValueError(f"hist_partial: bad bounds lo={lo} hi={hi} nbins={nbins}")
    w = (hi - lo) / nbins
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(float(w))).cast("int")
    clamped = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1))
    return (
        df.where(v.isNotNull())
        .select(*group_cols, clamped.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(group_cols: list[str], *states: DataFrame) -> DataFrame:
    """Union + sum per bin — additive like the CMS (NOT idempotent:
    re-merging a batch double-counts)."""
    if not states:
        raise ValueError("hist_merge: need at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    state: DataFrame,
    group_cols: list[str],
    q: float,
    lo: float,
    hi: float,
    nbins: int = 256,
    out_col: str = "approx_quantile",
    decimals: int = 6,
) -> DataFrame:
    """Per-group quantile estimate: walk the cumulative counts to the
    first bin whose running total reaches rank q·n, then interpolate
    linearly inside it — lo + width·(bin + (q·n − cum_before)/cnt).
    Pure +,−,×,÷ on exact integers and literals (no transcendental
    functions), so both engines produce the identical double before
    the single rounding."""
    from pyspark.sql import Window

    if not 0.0 < q < 1.0:
        raise ValueError(f"hist_quantile: q={q} outside (0, 1)")
    w = (hi - lo) / nbins
    win = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = state.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(win).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("_n"),
    )
    target = F.lit(q) * F.col("_n")
    hit = cum.where(F.col("_cum") >= target).groupBy(*group_cols).agg(
        F.min_by(
            F.struct("bin", "cnt", "_cum", "_n"), F.col("bin")
        ).alias("_h")
    )
    h = F.col("_h")
    frac = (F.lit(q) * h["_n"] - (h["_cum"] - h["cnt"])) / h["cnt"]
    est = F.lit(float(lo)) + F.lit(float(w)) * (h["bin"] + frac)
    return hit.select(*group_cols, F.round(est, decimals).alias(out_col))


def hist_oracle_sql(
    src: str,
    value_sql: str,
    group_sql: str,
    q: float,
    lo: float,
    hi: float,
    nbins: int = 256,
    where: str = "TRUE",
) -> str:
    """DuckDB replica of hist_partial∘hist_quantile — same clamp, same
    cumulative walk, same interpolation, same single rounding."""
    w = (hi - lo) / nbins
    return f"""
SELECT g, round({float(lo)!r} + {float(w)!r} * (bin + ({q!r} * n - (cum - cnt)) / cnt),
                6) AS approx_quantile
FROM (
  SELECT g, bin, cnt, cum, n,
         row_number() OVER (
           PARTITION BY g
           ORDER BY CASE WHEN cum >= {q!r} * n THEN 0 ELSE 1 END, bin
         ) AS rk
  FROM (
    SELECT g, bin, cnt,
           sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
           sum(cnt) OVER (PARTITION BY g) AS n
    FROM (
      SELECT g, least(greatest(floor((v - {float(lo)!r}) / {float(w)!r})::INT, 0),
                      {nbins - 1}) AS bin,
             count(*) AS cnt
      FROM (
        SELECT {group_sql} AS g, ({value_sql})::DOUBLE AS v
        FROM {src} WHERE ({where}) AND ({value_sql}) IS NOT NULL
      ) GROUP BY g, bin
    )
  )
) WHERE rk = 1 AND cum >= {q!r} * n
"""
