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

#: epoch_expand's when-chain/broadcast-relation dispatch point — the
#: url.py _REGEX_RULE_LIMIT convention: past this many domains a
#: literal when-chain bloats codegen (and the collected weight map
#: stops being meaningfully "bounded"), so the weights ship as a
#: broadcast-joined relation instead.
_EXPAND_LITERAL_LIMIT = 64


def _domain_sql_type(keys) -> str:
    """SQL type for a broadcast domain-relation's key column, from the
    map's own Python keys — so the relation join sees the SAME
    analyzer comparison coercion the literal when-chain path applies
    to raw keys (r15 review: a hardcoded string schema was a type
    cliff, and casting the data column to string broke bool/float
    domains whose Python str() differs from Spark's cast rendering).
    Validates HOMOGENEITY over ALL keys (r15 second review: typing
    from the first key alone would re-introduce a works-until-64-
    domains cliff for mixed-type maps — those fail loudly here on
    both paths' behalf)."""
    kinds = {type(k) for k in keys}
    if len(kinds) != 1:
        raise ValueError(
            "domain keys must share one type, got "
            f"{sorted(t.__name__ for t in kinds)}"
        )
    key = next(iter(keys))
    if isinstance(key, bool):  # before int: bool is an int subclass
        return "boolean"
    if isinstance(key, int):
        return "bigint"
    if isinstance(key, float):
        return "double"
    if isinstance(key, str):
        return "string"
    raise ValueError(
        f"domain keys must be str/int/float/bool, got {type(key).__name__}"
    )


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


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float] | None = None,
    salt: str = "",
    group_col: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds ``out_col`` with
    the split name, a pure function of the hashed key — re-runs,
    repartitions, appends, and other engines all agree, so a doc can
    never silently migrate between train and eval.

    ``splits`` maps name -> fraction in declaration order (default
    98/1/1); the last split absorbs hash-bucket rounding. ``group_col``
    is the LEAKAGE GUARD: hash that column instead of the row key so an
    entire group — all docs of one source, or one near-dup cluster id
    from `dedup_clusters` — lands in a single split. Splitting
    independent rows that are near-duplicates of each other puts
    eval answers in the training set; group-hashing is how a 100 TB
    pipeline prevents that without any join or shuffle (the assignment
    stays a codegen'd projection).
    """
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    buckets = 1 << 20
    hash_col = group_col or key_col
    b = _hash_bucket(F.concat(F.col(hash_col).cast("string"), F.lit(salt)))
    names = list(splits)
    acc = 0.0
    expr = F.lit(names[-1])  # last split takes the rounding remainder
    cut = []
    for name in names[:-1]:
        acc += float(splits[name])
        cut.append((name, int(round(acc * buckets))))
    for name, threshold in reversed(cut):
        expr = F.when(b < threshold, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    target_weights: Mapping[str, float],
    size_col: str | None = None,
    budget: float | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic domain-mixture sampling: thin the corpus so the
    surviving mass matches ``target_weights`` per domain (the static
    mixture-reweighting every pretraining run does — e.g. cap web
    crawl at 60%, boost code to 25%).

    Mass is row count, or ``size_col`` (e.g. a token count) when
    given. With no ``budget`` the sample is the LARGEST corpus that
    achieves the exact target proportions without replication:
    total S = min over domains of size_d / w_d, keep fraction
    w_d * S / size_d per domain. With ``budget`` (same unit as mass)
    fractions are min(1, budget * w_d / size_d) — domains short of
    their allocation are kept whole and the mixture degrades
    gracefully rather than failing. Domains absent from
    ``target_weights`` are dropped.

    Plan: one small groupBy over the domain column (collected —
    driver state is O(#domains)), then the same md5-threshold filter
    `stratified_sample` uses: a codegen'd projection over the big
    table, zero shuffles, reproducible in any engine. Fractions round
    to 9 dp before bucket-thresholding so two engines computing them
    independently agree (same protocol as `weighted_sample`). Target
    maps past :data:`_EXPAND_LITERAL_LIMIT` domains ship the
    per-domain thresholds as a broadcast-joined relation instead of a
    literal when-chain (the epoch_expand dispatch — identical keep
    set either way, parity-tested).
    """
    mass = F.count(F.lit(1)) if size_col is None else F.sum(F.col(size_col).cast("double"))
    sizes = {
        r["d"]: float(r["m"])
        for r in df.groupBy(F.col(domain_col).alias("d")).agg(mass.alias("m")).collect()
    }
    weights = {d: float(w) for d, w in target_weights.items() if float(w) > 0}
    if weights:
        # entry-time key validation for BOTH dispatch paths: a mixed-
        # type or exotic-type map must fail loudly at any size, never
        # only past the 64-domain relation cliff (r15 second review)
        _domain_sql_type(list(weights))
    fractions: dict[str, float] = {}
    if budget is None:
        s_total = min(
            (sizes.get(d, 0.0) / w for d, w in weights.items()), default=0.0
        )
        for d, w in weights.items():
            if sizes.get(d):
                fractions[d] = w * s_total / sizes[d]
    else:
        for d, w in weights.items():
            if sizes.get(d):
                fractions[d] = min(1.0, float(budget) * w / sizes[d])
    buckets = 1 << 20
    # one arithmetic site for both dispatch paths (the epoch_expand
    # convention): domains outside the target mixture threshold at -1
    # (every bucket value >= 0, so they drop)
    rows = [
        (d, int(round(frac, 9) * buckets))
        for d, frac in sorted(fractions.items())
    ]
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    if len(rows) > _EXPAND_LITERAL_LIMIT:
        # the relation's key column is TYPED from the map's own keys
        # (r14 advice / r15 review: a hardcoded string schema was a
        # size-dependent createDataFrame cliff, and casting the COLUMN
        # to string instead broke bool/float domains whose Python
        # str() differs from Spark's cast — 'True' vs 'true'). A raw
        # typed join leaves comparison coercion to the analyzer,
        # exactly as the literal when-chain below does.
        ktype = _domain_sql_type([r[0] for r in rows])
        rel = F.broadcast(
            df.sparkSession.createDataFrame(
                rows, f"_mix_d {ktype}, _mix_thr int"
            )
        )
        return (
            df.join(rel, F.col(domain_col) == F.col("_mix_d"), "left")
            .filter(_hash_bucket(key) < F.coalesce(F.col("_mix_thr"), F.lit(-1)))
            .drop("_mix_d", "_mix_thr")
        )
    thr = F.lit(-1)
    for domain, t in rows:
        thr = F.when(F.col(domain_col) == domain, F.lit(t)).otherwise(thr)
    return df.filter(_hash_bucket(key) < thr)


def temperature_weights(
    sizes: Mapping[str, float], alpha: float, max_weight: float | None = None
) -> dict[str, float]:
    """Per-domain epoch weights for temperature sampling (the
    mC4/XLM-R posture — Xue et al. 2021, Conneau et al. 2020):
    target share p_d = m_d^α / Σ m_k^α, weight w_d = p_d · M / m_d
    rounded to 9 dp (the mixture_sample quantization, so an oracle
    recomputing the same formula agrees). α=1 is the identity (every
    w_d = 1); α→0 approaches uniform across domains — low-resource
    domains upsample (w>1), high-resource thin (w<1), total expected
    mass stays M by construction. ``max_weight`` caps tiny domains'
    replication. Pure driver arithmetic over O(#domains) state."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (α=1 natural, α→0 uniform)")
    ms = {d: float(m) for d, m in sizes.items() if float(m) > 0}
    if not ms:
        raise ValueError("temperature_weights: no positive-mass domains")
    # total/denom accumulate in SORTED-domain order: the sizes dict
    # comes from a Spark collect whose row order is nondeterministic,
    # and FP addition order changes the last ulp — a weight landing on
    # a 9-dp rounding boundary would then flip the exact copy set
    # run-to-run. The oracle replays the same ordered running sum
    # (the unimax pk-CTE discipline; r13 advice).
    total = 0.0
    denom = 0.0
    for d in sorted(ms):
        total += ms[d]
        denom += ms[d] ** alpha
    out = {}
    for d, m in ms.items():
        w = m**alpha * total / denom / m
        # cap BEFORE the 9-dp quantization — the oracle computes
        # round(least(raw, cap), 9), so capping after the round would
        # diverge for caps with >9 decimal places (r13 review)
        if max_weight is not None:
            w = min(w, float(max_weight))
        out[d] = round(w, 9)
    return out


def _domain_masses(
    df: DataFrame, domain_col: str, size_col: str | None
) -> dict[str, float]:
    """Per-domain mass (row count or summed ``size_col``), null and
    non-positive domains excluded — ONE definition shared by the
    mixture allocators (temperature / UniMax), so mass semantics
    cannot silently diverge between them. O(#domains) driver state."""
    mass = (
        F.count(F.lit(1)) if size_col is None
        else F.sum(F.col(size_col).cast("double"))
    )
    return {
        r["d"]: float(r["m"])
        for r in df.groupBy(F.col(domain_col).alias("d")).agg(mass.alias("m")).collect()
        if r["d"] is not None and r["m"] is not None and float(r["m"]) > 0
    }


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    alpha: float,
    size_col: str | None = None,
    salt: str = "",
    max_weight: float | None = None,
) -> DataFrame:
    """Temperature-based mixture rebalancing in one deterministic op —
    the multilingual-pretraining standard (mC4/XLM-R: sample language
    l with probability ∝ m_l^α): measure per-domain mass (row count
    or ``size_col``), derive :func:`temperature_weights`, and apply
    them through :func:`epoch_expand` — so high-resource domains THIN
    (w<1 keeps an md5-selected fraction) and low-resource domains
    UPSAMPLE (w>1 replicates with epoch ids) in the same pass, and
    the exact output reproduces in any engine. Null domains keep
    their single epoch 0 (they never match a weight literal).

    Output carries ``epoch``/``epoch_key`` (the epoch_expand
    contract — feed downstream single-key operators ``epoch_key``).
    Plan: one O(#domains) groupBy collect + a codegen projection +
    one bounded explode — zero joins, zero extra shuffles."""
    sizes = _domain_masses(df, domain_col, size_col)
    w = temperature_weights(sizes, alpha, max_weight=max_weight)
    return epoch_expand(df, key_col, domain_col, w, salt=salt)


def temperature_mixture_oracle_sql(
    src: str,
    key_expr: str,
    domain_expr: str,
    alpha: float,
    size_expr: str | None = None,
    salt: str = "",
    max_weight: float | None = None,
) -> str:
    """DuckDB replay of :func:`temperature_mixture` — (id, domain,
    epoch) of the exact expanded rows: recomputes the per-domain
    masses, the 9-dp-rounded temperature weights (same operation
    order as the Python formula, so the rounding sees the same
    double), and epoch_expand's integer replication + md5-threshold
    fractional copy."""
    mass = "COUNT(*)::DOUBLE" if size_expr is None else f"SUM(CAST({size_expr} AS DOUBLE))"
    w = f"pow(m, {alpha!r}) * mtot / denom / m"
    if max_weight is not None:
        w = f"least({w}, {float(max_weight)!r})"
    weights_sql = f"""
WITH RECURSIVE sizes AS (
  SELECT {domain_expr} AS d, {mass} AS m
  FROM {src}
  WHERE {domain_expr} IS NOT NULL
  GROUP BY {domain_expr}
  HAVING {mass} > 0
),
-- mtot/denom accumulate through a RECURSIVE chain in domain order:
-- genuinely sequential left-to-right double additions, matching the
-- Python loop over sorted(ms) bit for bit. (A windowed running SUM
-- is NOT sequential — DuckDB's segment-tree window aggregation
-- combines pairwise past 64 rows and diverges in the last ulp,
-- which could flip a weight's 9-dp rounding; measured in this
-- container at n=1000.)
ordx AS (
  SELECT d, m, row_number() OVER (ORDER BY d) AS rn FROM sizes
),
run(rn, rtot, rden) AS (
  SELECT rn, m, pow(m, {alpha!r}) FROM ordx WHERE rn = 1
  UNION ALL
  SELECT o.rn, r.rtot + o.m, r.rden + pow(o.m, {alpha!r})
  FROM run r JOIN ordx o ON o.rn = r.rn + 1
),
tot AS (
  SELECT rtot AS mtot, rden AS denom FROM run ORDER BY rn DESC LIMIT 1
)
SELECT d, round({w}, 9) AS wt FROM sizes CROSS JOIN tot
"""
    return _expand_oracle_sql(src, key_expr, domain_expr, salt, weights_sql)


def _expand_oracle_sql(
    src: str, key_expr: str, domain_expr: str, salt: str, weights_sql: str
) -> str:
    """Shared DuckDB replay of epoch_expand over a computed (d, wt)
    weight relation — integer replication + the md5-threshold
    fractional copy, with epoch_expand's unlisted-domain default
    (null / zero-mass domains keep their single epoch 0)."""
    return f"""
SELECT id, domain, unnest(list_concat(
         list_transform(range(full_e), i -> i::INT),
         CASE WHEN ('0x' || substr(md5(id::VARCHAR || '{salt}' || 'ep'), 1, 5))::BIGINT
                   < CAST(floor(round(wt - full_e, 9) * {1 << 20}) AS BIGINT)
              THEN [full_e::INT] ELSE []::INT[] END)) AS epoch
FROM (
  SELECT {key_expr} AS id, {domain_expr} AS domain,
         COALESCE(w.wt, 1.0) AS wt,
         CAST(floor(COALESCE(w.wt, 1.0)) AS INT) AS full_e
  FROM {src} t LEFT JOIN ({weights_sql}) w ON {domain_expr} = w.d
)
"""


def unimax_mixture_oracle_sql(
    src: str,
    key_expr: str,
    domain_expr: str,
    budget: float,
    max_epochs: float = 1.0,
    size_expr: str | None = None,
    salt: str = "",
) -> str:
    """DuckDB replay of :func:`unimax_mixture` — (id, domain, epoch)
    of the exact expanded rows: masses, the closed-form waterfill
    (capacity order, prefix sums, the FIRST row whose capacity
    exceeds its greedy share is the breakpoint — exactly the Python
    scan's break), the one equal share with the same operation order,
    and epoch_expand's copy-set arithmetic."""
    mass = "COUNT(*)::DOUBLE" if size_expr is None else f"SUM(CAST({size_expr} AS DOUBLE))"
    b = float(budget)
    cap = float(max_epochs)
    weights_sql = f"""
WITH RECURSIVE sizes AS (
  SELECT {domain_expr} AS d, {mass} AS m
  FROM {src}
  WHERE {domain_expr} IS NOT NULL
  GROUP BY {domain_expr}
  HAVING {mass} > 0
),
ordx AS (
  SELECT d, m, {cap!r} * m AS c,
         row_number() OVER (ORDER BY {cap!r} * m, d) AS rn,
         count(*) OVER () AS n
  FROM sizes
),
-- cum(rn) = capacities of rows 1..rn summed through a RECURSIVE
-- chain: genuinely sequential double additions, matching the Python
-- scan's `prefix` bit for bit. (The previous RUNNING-window form was
-- NOT sequential — DuckDB's segment-tree window aggregation combines
-- pairwise past 64 rows; both the breakpoint DECISION and the share
-- numerator consumed it, so either could diverge from Python in the
-- last ulp at >64 domains.)
runc(rn, cum) AS (
  SELECT rn, c FROM ordx WHERE rn = 1
  UNION ALL
  SELECT o.rn, r.cum + o.c FROM runc r JOIN ordx o ON o.rn = r.rn + 1
),
pre_tbl AS (
  SELECT o.rn, COALESCE(r.cum, 0.0) AS pre
  FROM ordx o LEFT JOIN runc r ON r.rn = o.rn - 1
),
brk AS (
  SELECT COALESCE(min(CASE WHEN o.c > ({b!r} - p.pre) / (o.n - o.rn + 1)
                       THEN o.rn END), max(o.n) + 1) - 1 AS k,
         max(o.n) AS n
  FROM ordx o JOIN pre_tbl p USING (rn)
),
pk AS (
  SELECT COALESCE(
    (SELECT p.pre FROM pre_tbl p, brk WHERE p.rn = brk.k + 1), 0.0
  ) AS pre_k
)
SELECT d, CASE WHEN ordx.rn <= brk.k THEN round({cap!r}, 9)
          ELSE round(({b!r} - pk.pre_k) / (brk.n - brk.k) / ordx.m, 9)
          END AS wt
FROM ordx, brk, pk
"""
    return _expand_oracle_sql(src, key_expr, domain_expr, salt, weights_sql)


def unimax_weights(
    sizes: Mapping[str, float],
    budget: float,
    max_epochs: float = 1.0,
) -> dict[str, float]:
    """Per-domain epoch weights for UniMax sampling (Chung et al.,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining", ICLR 2023) — the
    temperature-sampling successor: distribute a total training
    ``budget`` (same unit as ``sizes``) as UNIFORMLY as possible
    across domains, subject to a per-domain repeat cap
    (``max_epochs`` · m_d — the paper's insight that low-resource
    quality degrades past a few epochs, so fairness must stop at the
    cap, not upsample forever like small-α temperature).

    The published greedy waterfill, in its CLOSED form: visiting
    domains by capacity (cap·m_d) ascending, a PREFIX of them caps
    out (the greedy share exceeds their capacity) and everyone after
    the breakpoint takes the one equal share
    s = (budget − Σ capped capacities)/(#uncapped). Weights
    w_d = cap for the capped prefix, round(s/m_d, 9) for the rest
    (the mixture_sample quantization); capacity ties break by domain
    name. A budget exceeding total capacity allocates everything AT
    the cap (total < budget — the paper's posture; upsampling past
    the cap is the failure mode UniMax exists to prevent). The closed
    form is exactly the sequential greedy AND replayable in SQL with
    identical doubles (one prefix-sum, one breakpoint, one division —
    the 'umax' gate arm), where the loop's per-step remaining would
    accumulate FP differences."""
    if budget <= 0:
        raise ValueError("unimax_weights: budget must be > 0")
    if max_epochs <= 0:
        raise ValueError("unimax_weights: max_epochs must be > 0")
    ms = {d: float(m) for d, m in sizes.items() if float(m) > 0}
    if not ms:
        raise ValueError("unimax_weights: no positive-mass domains")
    b = float(budget)
    order = sorted(ms, key=lambda d: (max_epochs * ms[d], d))
    n = len(order)
    prefix, k = 0.0, 0
    for i, d in enumerate(order):
        c = max_epochs * ms[d]
        if c <= (b - prefix) / (n - i):
            prefix += c
            k += 1
        else:
            break
    out: dict[str, float] = {}
    cap_w = round(float(max_epochs), 9)
    for i, d in enumerate(order):
        if i < k:
            out[d] = cap_w
        else:
            out[d] = round((b - prefix) / (n - k) / ms[d], 9)
    return out


def unimax_mixture(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    budget: float,
    max_epochs: float = 1.0,
    size_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """UniMax mixture rebalancing in one deterministic op (the
    temperature_mixture shape with the waterfill allocation):
    measure per-domain mass (row count or ``size_col``), derive
    :func:`unimax_weights` for the ``budget``, and apply them through
    :func:`epoch_expand` — scarce domains repeat up to ``max_epochs``,
    abundant ones thin to their uniform share. Null domains keep their
    single epoch 0. Output carries ``epoch``/``epoch_key`` (the
    epoch_expand contract)."""
    sizes = _domain_masses(df, domain_col, size_col)
    w = unimax_weights(sizes, budget, max_epochs=max_epochs)
    return epoch_expand(df, key_col, domain_col, w, salt=salt)


def epoch_expand(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    epochs: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic per-domain UPSAMPLING — the half of mixture
    reweighting :func:`mixture_sample` cannot do: repeat a domain's
    documents ``w`` "epochs" (pretraining runs routinely take
    high-quality sources 2-5 times while the crawl runs once).

    Returns the input rows replicated with an ``epoch`` int column:
    every row of domain d appears floor(w_d) times (epochs
    0..floor(w_d)-1), and the md5-selected ``frac(w_d)`` fraction of
    its rows once more (epoch floor(w_d)) — expected mass w_d ×
    size_d, and the EXACT copy set reproduces in any engine (the
    stratified-sample threshold arithmetic, fraction rounded to 9 dp).
    w < 1 therefore degrades to deterministic thinning, and a domain
    absent from ``epochs`` keeps its single epoch 0 (weight 1.0 —
    upsampling must not silently drop unlisted domains; pass an
    explicit 0.0 to drop one).

    Plan: a codegen projection + one explode of a ≤ceil(w)-element
    array — zero shuffles. Weight dispatch follows the url.py
    ``_with_domain_key`` convention: maps up to
    :data:`_EXPAND_LITERAL_LIMIT` domains compile to literal
    when-chains (pure codegen, zero joins — languages/sources); past
    it the (domain, full_epochs, fraction-threshold) map ships as a
    BROADCAST-joined relation instead — a 10⁴–10⁶-domain when-chain
    (per-registered-domain mixtures over ``url.domain_stats`` keys)
    would break codegen and stop being "bounded driver state". Both
    paths carry the SAME precomputed integer (full, threshold) pairs,
    so the copy set is identical (parity-tested).

    Replicas share ``key_col``, so the output also carries
    ``epoch_key`` = ``key:epoch`` — the UNIQUE per-copy key downstream
    single-key operators must use. In particular
    ``pack_sequences``/``training_sequences`` tape placement breaks
    on duplicate ids (colliding order keys put both replicas at one
    offset while bucket totals count both — silent token loss): feed
    them ``id_col="epoch_key"``, never the original key."""
    weights = {str(d): float(w) for d, w in epochs.items()}
    if any(w < 0 for w in weights.values()):
        raise ValueError("epoch_expand: epoch weights must be >= 0")
    buckets = 1 << 20
    # one arithmetic site for both dispatch paths: (domain, floor(w),
    # md5-bucket threshold of the 9-dp-rounded fraction)
    rows = [
        (d, int(w), int(round(w - int(w), 9) * buckets))
        for d, w in sorted(weights.items())
    ]
    # the keys are str()'d above (this function's historical
    # contract), so both paths compare the RAW domain column against
    # string keys and the analyzer's comparison coercion applies
    # identically (int/float columns coerce; r15 review reverted a
    # column-side string cast that broke the coercion parity)
    if len(rows) > _EXPAND_LITERAL_LIMIT:
        rel = F.broadcast(
            df.sparkSession.createDataFrame(
                rows, "_exp_d string, _exp_full int, _exp_thr int"
            )
        )
        df = df.join(rel, F.col(domain_col) == F.col("_exp_d"), "left")
        n_full = F.coalesce(F.col("_exp_full"), F.lit(1))
        thr = F.coalesce(F.col("_exp_thr"), F.lit(0))
    else:
        n_full = F.lit(1)  # unlisted domains: one epoch, no fraction
        thr = F.lit(0)
        for domain, full, t in rows:
            n_full = F.when(
                F.col(domain_col) == domain, F.lit(full)
            ).otherwise(n_full)
            thr = F.when(F.col(domain_col) == domain, F.lit(t)).otherwise(
                thr
            )
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt), F.lit("ep"))
    base = F.when(
        n_full > 0, F.sequence(F.lit(0), n_full - 1)
    ).otherwise(F.array().cast("array<int>"))  # sequence(0,-1) would
    #                                            count DOWN, not empty
    extra = F.when(
        _hash_bucket(key) < thr, F.array(n_full)
    ).otherwise(F.array().cast("array<int>"))
    out = df.withColumn(
        "epoch", F.explode(F.concat(base, extra))
    ).withColumn(
        "epoch_key",
        F.concat(
            F.col(key_col).cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        ),
    )
    if len(rows) > _EXPAND_LITERAL_LIMIT:
        out = out.drop("_exp_d", "_exp_full", "_exp_thr")
    return out
