"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).

The published recipe for picking pretraining documents that LOOK LIKE
a target distribution (e.g. "select web crawl that resembles
Wikipedia+books"): fit two hashed bag-of-n-grams generative models —
p̂ on a TARGET corpus, q̂ on the RAW corpus — weight every raw
document by its log importance ratio log p̂(x) − log q̂(x), then
resample k documents WITHOUT replacement with probability
proportional to the importance weight (Gumbel top-k). It completes
the selection stack next to the trained quality gate
(operators/quality_classifier.py) and the CCNet perplexity
partitioning (operators/lm_score.py): those score FLUENCY, DSIR
scores DOMAIN MATCH against a corpus you point at.

Factoring (the quality_classifier/lang_classifier discipline —
distributed counting, bounded driver state, JVM-side inference,
SQL-replayable scoring):

- **features**: word unigrams (+ adjacent bigrams at ``ngrams=2``,
  the paper's configuration) hashed into ``dim`` buckets — the same
  feature constructor the quality classifier uses (its ``_feats_sql``
  one-element-transform idiom, measured there to keep the explode
  linear). A document's raw-count bag, NOT mean-pooled: the paper's
  log ratio is a sum over n-gram OCCURRENCES.
- **fit**: one explode → fid → count aggregation per corpus (map-side
  partial agg, ≤dim result rows each; ONE shuffle per corpus, the
  lm_score fit shape) and a ≤dim-row collect. Bucket probabilities
  are Laplace-smoothed, p̂_b = (c_b + α)/(T + α·dim); the per-bucket
  log ratio λ_b = ln p̂_b − ln q̂_b is computed on the driver from
  EXACT integer counts and quantized to 6-dp micro-units
  (λ6 = round(λ·10⁶)) — driver state is dim ints, bounded by
  construction.
- **inference**: per-doc log weight = Σ_occurrences λ6[fid] summed as
  INTEGERS (the lang_classifier micro-unit discipline), so the
  relation path, the array-literal expression path, and the DuckDB
  oracle are bit-identical regardless of partitioning or summation
  order; the float ``logw`` column is that integer / 10⁶.
- **selection**: Gumbel top-k — sort key log w_i + g_i with
  g_i = −ln(−ln(u_i)) and u_i a PURE HASH of the document key
  (md5-derived, strictly interior (0,1)), take the top k. Gumbel
  top-k over log weights IS sampling-without-replacement with
  inclusion ∝ w_i (Vieira 2014), and hashing u makes the exact
  sample a pure function of the data — reproducible across re-runs,
  partitionings, and engines (the weighted_sample A-ES precedent;
  the Gumbel term rounds to 9 dp because ln() is not guaranteed
  correctly rounded across engines, exact ties fall to the key).
  Plan: codegen projection + TakeOrderedAndProject — no shuffle,
  no full sort.

SQL replay: scoring and selection are literal arithmetic with fixed
λ6 (:func:`dsir_oracle_sql`, :func:`dsir_select_oracle_sql`) — the
md5_60 bucket hash, integer sums, the md5-derived Gumbel key.
Fitting is counting + driver-side ln: deterministic and
property-tested in pytest (tests/test_dsir.py); the gate embeds
fixed literals (the qc_score/lang_pred precedent), so training
drift can never silently move an oracle.

Reference: the reference repo has no data-selection stage at all
(single-source game telemetry); this is LLM-pipeline extension
surface built from the published method.

At 100 TB: fit is two linear scans with one dim-bounded shuffle
each; scoring is a broadcast join (or a zero-shuffle codegen
expression at dim ≤ 4096); selection is a per-partition top-k heap
merged on the driver (k rows). Nothing is quadratic, nothing
collects unbounded state.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.quality_classifier import (
    _DUCK_MD5_60,
    _EXPR_DIM_LIMIT,
    _SPARK_HASH,
    _feats_col,
    _feats_sql,
    _fid_sql,
    _weights_fingerprint,
)

__all__ = [
    "DsirModel",
    "dsir_fit",
    "dsir_score",
    "dsir_logweight_expr",
    "dsir_select",
    "dsir_oracle_sql",
    "dsir_select_oracle_sql",
    "save_dsir",
    "load_dsir",
]

_W6 = 1_000_000  # 6-dp micro-unit scale for exact integer log-ratio sums
_U52 = float(1 << 52)  # md5-prefix range for the Gumbel uniform


@dataclass
class DsirModel:
    """Hashed-n-gram importance model: per-bucket log(p̂_target/q̂_raw)
    in 6-dp integer micro-units. Size is ``dim`` ints — driver/
    broadcast bounded by construction."""

    dim: int
    ngrams: int = 2
    base_hash: str = "xxhash64"
    lowercase: bool = True
    smoothing: float = 1.0
    log_ratio6: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.base_hash not in _SPARK_HASH:
            raise ValueError(f"unknown base_hash: {self.base_hash!r}")
        if self.ngrams not in (1, 2):
            raise ValueError("ngrams must be 1 or 2")
        if self.smoothing <= 0:
            raise ValueError(
                "smoothing must be > 0 (α=0 makes an unseen bucket's "
                "log ratio undefined)"
            )
        if not self.log_ratio6:
            self.log_ratio6 = [0] * self.dim
        if len(self.log_ratio6) != self.dim:
            raise ValueError("len(log_ratio6) != dim")
        if any(int(v) != v for v in self.log_ratio6):
            raise ValueError("log_ratio6 must be integers (micro-units)")


def _bucket_counts(
    docs: DataFrame, text_col: str, model_dim: int, ngrams: int,
    base_hash: str, lowercase: bool,
) -> tuple[dict[int, int], int]:
    """(bucket -> occurrence count, total occurrences) — one explode →
    fid shuffle with map-side partial agg, ≤dim result rows."""
    feats = _feats_col(text_col, ngrams, lowercase)
    rows = (
        docs.select(F.explode(feats).alias("_f"))
        .withColumn("_fid", F.expr(_fid_sql("_f", model_dim, base_hash)))
        .groupBy("_fid")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    counts = {int(r["_fid"]): int(r["_c"]) for r in rows}
    return counts, sum(counts.values())


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    dim: int = 1 << 14,
    ngrams: int = 2,
    base_hash: str = "xxhash64",
    lowercase: bool = True,
    smoothing: float = 1.0,
) -> DsirModel:
    """Fit the importance model: hashed-n-gram unigram distributions
    over ``target`` and ``raw``, Laplace-smoothed, log ratio per
    bucket quantized to micro-units. Deterministic: the counts are
    exact integers and the driver's ln() sees identical inputs on
    every run. Raises if either corpus has zero feature occurrences
    (a ratio against nothing selects nothing meaningful — fail loud,
    the mixture_sample convention)."""
    if dim > (1 << 22):
        raise ValueError(
            "dim > 2^22: the driver log-ratio vector is the documented "
            "bounded state — raise deliberately, not by default"
        )
    a = float(smoothing)
    ct, tt = _bucket_counts(target, text_col, dim, ngrams, base_hash, lowercase)
    cr, tr = _bucket_counts(raw, text_col, dim, ngrams, base_hash, lowercase)
    if tt == 0 or tr == 0:
        raise ValueError(
            "dsir_fit: empty feature stream "
            f"(target={tt}, raw={tr} occurrences)"
        )
    return DsirModel(
        dim=dim,
        ngrams=ngrams,
        base_hash=base_hash,
        lowercase=lowercase,
        smoothing=a,
        log_ratio6=_lam6_from_counts(ct, cr, dim, a),
    )


def dsir_fit_tagged(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    dim: int = 1 << 14,
    ngrams: int = 2,
    base_hash: str = "xxhash64",
    lowercase: bool = True,
    smoothing: float = 1.0,
) -> DsirModel:
    """:func:`dsir_fit` for the common case where TARGET is a
    predicate over the raw corpus itself (the paper's domain-match
    shape — e.g. ``target_cond = col('lang') == 'en'`` with the whole
    corpus as RAW): both bucket distributions from ONE explode →
    fid shuffle (a conditional sum rides the same aggregate) instead
    of two full corpus passes (r16 optimization, guide §2.4).
    Bit-identical to ``dsir_fit(docs.where(target_cond), docs, …)``:
    the counts are exact integers either way and the λ6 arithmetic is
    the same shared formula (parity-pinned in tests)."""
    if dim > (1 << 22):
        raise ValueError(
            "dim > 2^22: the driver log-ratio vector is the documented "
            "bounded state — raise deliberately, not by default"
        )
    a = float(smoothing)
    feats = _feats_col(text_col, ngrams, lowercase)
    rows = (
        docs.select(
            target_cond.alias("_t"), F.explode(feats).alias("_f")
        )
        .withColumn("_fid", F.expr(_fid_sql("_f", dim, base_hash)))
        .groupBy("_fid")
        .agg(
            F.count(F.lit(1)).alias("_cr"),
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_ct"),
        )
        .collect()
    )
    cr = {int(r["_fid"]): int(r["_cr"]) for r in rows}
    ct = {int(r["_fid"]): int(r["_ct"]) for r in rows if int(r["_ct"])}
    tt, tr = sum(ct.values()), sum(cr.values())
    if tt == 0 or tr == 0:
        raise ValueError(
            "dsir_fit_tagged: empty feature stream "
            f"(target={tt}, raw={tr} occurrences)"
        )
    return DsirModel(
        dim=dim,
        ngrams=ngrams,
        base_hash=base_hash,
        lowercase=lowercase,
        smoothing=a,
        log_ratio6=_lam6_from_counts(ct, cr, dim, a),
    )


def _lam6_from_counts(
    target: dict[int, int], raw: dict[int, int], dim: int, smoothing: float
) -> list[int]:
    """The λ6 arithmetic, ONE definition on purpose: the incremental
    path (streaming/dsir.py) refits from merged count snapshots and
    must produce bit-identical micro-units to a from-scratch fit over
    the union — only a shared formula (same op order, same doubles)
    can guarantee that."""
    a = float(smoothing)
    denom_t = math.log(sum(target.values()) + a * dim)
    denom_r = math.log(sum(raw.values()) + a * dim)
    return [
        round(
            (math.log(target.get(b, 0) + a) - denom_t
             - math.log(raw.get(b, 0) + a) + denom_r) * _W6
        )
        for b in range(dim)
    ]


def dsir_logweight_expr(
    model: DsirModel, text_col: str = "text"
) -> Column:
    """Zero-shuffle codegen forward pass: the λ6 vector as a BIGINT
    array literal, per-doc micro-unit sum over feature occurrences.
    Returns the INTEGER micro-unit sum (callers divide by 10⁶ for the
    float log weight — the integer is the exactly-comparable form).
    Allowed up to dim 4096 (codegen method size); bigger models use
    the relation path in :func:`dsir_score`."""
    if model.dim > _EXPR_DIM_LIMIT:
        raise ValueError(
            f"dim {model.dim} > {_EXPR_DIM_LIMIT}: use dsir_score's "
            "relation path"
        )
    feats = _feats_sql(text_col, model.ngrams, model.lowercase)
    larr = (
        "array("
        + ", ".join(f"{int(v)}L" for v in model.log_ratio6)
        + ")"
    )
    # coalesce: a NULL text yields a NULL feature array, whose
    # aggregate is NULL — the relation path and the oracle both score
    # such docs 0 (the empty sum), so the expression path must too
    return F.expr(
        f"coalesce(aggregate(transform({feats}, f -> "
        f"element_at({larr}, {_fid_sql('f', model.dim, model.base_hash)}"
        f" + 1)), cast(0 as bigint), (acc, v) -> acc + v), cast(0 as bigint))"
    )


def dsir_score(
    docs: DataFrame,
    model: DsirModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dsir_logw",
    micro_col: str | None = None,
    as_expression: bool | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """docs + (out_col [, micro_col]): per-document log importance
    weight log p̂(x) − log q̂(x). ``out_col`` is the float form
    (micro-units / 10⁶); ``micro_col`` additionally exposes the exact
    BIGINT micro-unit sum (what gates compare — integer formatting is
    engine-independent, float formatting is not). Zero-feature docs
    weigh 0 (the empty sum). ``as_expression=None`` picks the array-
    literal codegen path when dim allows, else the relation path:
    explode → λ join (broadcast by default; ``broadcast_model=False``
    for dims too large to ship) → one id shuffle."""
    if as_expression is None:
        as_expression = model.dim <= _EXPR_DIM_LIMIT
    if as_expression:
        s = dsir_logweight_expr(model, text_col)
        out = docs.withColumn("_dsir6", s)
    else:
        import pandas as pd

        spark = docs.sparkSession
        nz = [(i, int(v)) for i, v in enumerate(model.log_ratio6) if v != 0]
        lrel = (
            spark.createDataFrame(
                pd.DataFrame(
                    {"_fid": [i for i, _ in nz],
                     "_lam6": [v for _, v in nz]}
                ).astype({"_fid": "int32", "_lam6": "int64"})
            )
            if nz
            else spark.createDataFrame([], "_fid int, _lam6 long")
        )
        if broadcast_model:
            lrel = F.broadcast(lrel)
        feats = _feats_col(text_col, model.ngrams, model.lowercase)
        per_doc = (
            docs.select(
                F.col(id_col).alias("_id"), F.explode(feats).alias("_f")
            )
            .withColumn(
                "_fid", F.expr(_fid_sql("_f", model.dim, model.base_hash))
            )
            .join(lrel, "_fid", "left")
            .groupBy("_id")
            .agg(
                F.sum(F.coalesce(F.col("_lam6"), F.lit(0))).alias("_dsir6")
            )
        )
        out = docs.join(
            per_doc, docs[id_col] == per_doc["_id"], "left"
        ).select(
            *[docs[c] for c in docs.columns],
            F.coalesce(F.col("_dsir6"), F.lit(0)).alias("_dsir6"),
        )
    out = out.withColumn(
        out_col, F.col("_dsir6").cast("double") / F.lit(float(_W6))
    )
    if micro_col is not None:
        out = out.withColumn(micro_col, F.col("_dsir6"))
    return out.drop("_dsir6")


def _gumbel9(key: Column, salt: str) -> Column:
    """9-dp-rounded standard Gumbel draw as a pure hash of the key:
    u = (md5-prefix + 0.5)/2⁵² is strictly interior to (0,1) — the
    +0.5 keeps −ln(−ln(u)) finite at both hash extremes and stays
    exactly representable (< 2⁵³). Rounded because ln() may differ by
    1 ulp across engines (the weighted_sample sort-key protocol)."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(salt), F.lit("gum"))), 1, 13),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_U52)
    return F.round(-F.log(-F.log(u)), 9)


def dsir_select(
    docs: DataFrame,
    model: DsirModel,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    logw_col: str = "dsir_logw",
    micro_col: str | None = None,
) -> DataFrame:
    """Resample ``n`` documents without replacement with inclusion
    probability proportional to the importance weight (Gumbel top-k
    over log w + g, g a pure hash of the key) — the DSIR selection
    step, deterministic under any partitioning/engine/re-run;
    different salts draw independent samples. Output carries
    ``logw_col`` (and ``micro_col`` when asked). Plan: codegen
    projection + TakeOrderedAndProject (per-partition n-row heaps,
    driver merges n rows) — no shuffle, no full sort."""
    scored = dsir_score(
        docs, model, text_col=text_col, id_col=id_col,
        out_col=logw_col, micro_col=micro_col or "_dsir_micro",
    )
    mc = micro_col or "_dsir_micro"
    key = F.col(id_col).cast("string")
    sort_key = (
        F.col(mc).cast("double") / F.lit(float(_W6)) + _gumbel9(key, salt)
    )
    out = (
        scored.withColumn("_gk", sort_key)
        .orderBy(F.col("_gk").desc(), F.col(id_col).asc())
        .limit(int(n))
        .drop("_gk")
    )
    return out if micro_col else out.drop("_dsir_micro")


def _duck_feats(src: str, text_expr: str, id_expr: str, model: DsirModel) -> str:
    """DuckDB CTE body producing (doc_id, feats) — the SHARED
    quality_classifier oracle feature construction (one tokenization
    definition on the oracle side, mirroring the shared Spark-side
    ``_feats_sql``)."""
    from cod_stats_spark.operators.quality_classifier import _duck_feats_sql

    return _duck_feats_sql(
        src, text_expr, id_expr, model.ngrams, model.lowercase
    )


def dsir_oracle_sql(
    model: DsirModel,
    src: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB replica of the scoring pass — (doc_id, dsir_micro
    BIGINT, dsir_logw) with λ6 as a literal list; integer sums, so
    dsir_micro is bit-identical to Spark's. Requires
    ``base_hash='md5_60'`` (the oracle-replayable member)."""
    if model.base_hash != "md5_60":
        raise ValueError("oracle replay requires base_hash='md5_60'")
    larr = "[" + ", ".join(str(int(v)) for v in model.log_ratio6) + "]"
    h = _DUCK_MD5_60.format(x="f")
    # the λ6 literal appears ONCE (inner micro-unit sum); dsir_logw
    # derives from it in the outer select — at larger dims the array
    # literal dominates the generated SQL, so inlining it twice would
    # double the statement size for no behavioral gain (r13 advice)
    return f"""
SELECT doc_id, dsir_micro, dsir_micro / 1000000.0 AS dsir_logw
FROM (
  SELECT doc_id,
         CASE WHEN len(feats) > 0
              THEN list_sum(list_transform(feats, f ->
                   ({larr}::BIGINT[])[(({h}) % {model.dim} + 1)::BIGINT]))
              ELSE 0 END AS dsir_micro
  FROM ({_duck_feats(src, text_expr, id_expr, model)})
)
"""


def dsir_select_oracle_sql(
    model: DsirModel,
    n: int,
    salt: str = "",
    src: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB replica of the Gumbel-top-k selection — (doc_id,
    dsir_micro) of the exact ``n`` documents :func:`dsir_select`
    keeps (same hash-derived uniform, same 9-dp-rounded Gumbel,
    same tie-break)."""
    scored = dsir_oracle_sql(model, src, text_expr, id_expr)
    u = (
        f"((('0x' || substr(md5(doc_id::VARCHAR || '{salt}' || 'gum'), 1, 13))::BIGINT"
        f" + 0.5) / {_U52!r})"
    )
    return f"""
SELECT doc_id, dsir_micro
FROM ({scored})
ORDER BY (dsir_micro / 1000000.0 + round(-ln(-ln({u})), 9)) DESC,
         doc_id ASC
LIMIT {int(n)}
"""


def save_dsir(spark, model: DsirModel, path: str) -> None:
    """Persist as a two-table parquet dir (the save_classifier
    discipline): ``ratios/`` holds (fid, lam6) for the NONZERO
    buckets, ``meta/`` one row of hyperparameters written LAST with
    an order-independent integer fingerprint so a torn re-save loads
    loudly, never silently."""
    nz = [(i, int(v)) for i, v in enumerate(model.log_ratio6) if v != 0]
    spark.createDataFrame(
        nz or [], "fid int, lam6 long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/ratios")
    fp = _weights_fingerprint([(i, float(v)) for i, v in nz])
    spark.createDataFrame(
        [
            (
                model.dim,
                model.ngrams,
                model.base_hash,
                model.lowercase,
                float(model.smoothing),
                len(nz),
                fp,
            )
        ],
        "dim int, ngrams int, base_hash string, lowercase boolean, "
        "smoothing double, n_nonzero int, wfp long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_dsir(spark, path: str) -> DsirModel:
    """Load a persisted model (absent fids restore as exact zeros).
    Raises if the ratios don't match the meta fingerprint."""
    m = spark.read.parquet(f"{path}/meta").first()
    rows = spark.read.parquet(f"{path}/ratios").collect()
    torn = len(rows) != int(m["n_nonzero"]) or _weights_fingerprint(
        [(int(r["fid"]), float(int(r["lam6"]))) for r in rows]
    ) != int(m["wfp"])
    if torn:
        raise ValueError(
            f"load_dsir: {path} is torn — ratios don't match the meta "
            "fingerprint (crashed mid re-save?); re-save the model"
        )
    lam6 = [0] * int(m["dim"])
    for r in rows:
        lam6[int(r["fid"])] = int(r["lam6"])
    return DsirModel(
        dim=int(m["dim"]),
        ngrams=int(m["ngrams"]),
        base_hash=m["base_hash"],
        lowercase=bool(m["lowercase"]),
        smoothing=float(m["smoothing"]),
        log_ratio6=lam6,
    )
