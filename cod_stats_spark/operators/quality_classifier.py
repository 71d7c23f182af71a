"""Trained quality classifier — fastText-style hashed bag-of-n-grams
logistic regression.

The model class the public web-scale pipelines use to gate text on a
TRAINED fluent-vs-junk signal (Joulin et al., "Bag of Tricks for
Efficient Text Classification", EACL 2017 — the fastText supervised
model; CCNet-era corpus work routinely pairs it with the LM-perplexity
gate already in this family, operators/lm_score.py). It completes the
quality stack: heuristic ratios (functions/text.quality_score), LM
likelihood (lm_score), and now a supervised classifier.

Factoring (the BPE/PQ discipline — distributed statistics, bounded
driver-side optimization, JVM-side inference):

- **features**: word unigrams plus (``ngrams=2``) adjacent word
  bigrams, hashed into ``dim`` buckets (the hashing trick). A
  document's feature value is bucket count / total feature count
  (mean pooling, fastText's normalization), so the margin is
  ``bias + mean(weights[fid(feature)])``.
- **fit**: full-batch gradient descent. Each iteration computes the
  exact gradient DISTRIBUTED — one doc_id shuffle for the margins,
  one fid shuffle for the gradient, over a once-persisted feature
  frame — and applies the update on the driver. Driver state is
  exactly ``dim`` floats + 1 bias, bounded by construction (the
  k-means/BPE contract); nothing else is ever collected.
- **inference**: a pure forward pass. With the weight vector shipped
  as an ARRAY LITERAL (``as_expression``, allowed up to dim 4096) it
  is a ZERO-SHUFFLE whole-stage-codegen dot product:
  ``sigmoid(bias + aggregate(feats, w[fid(f)])/n)``. The general path
  ships the model as a (fid, weight) relation — broadcast by default,
  ``broadcast_model=False`` for dims too large to broadcast (the
  lm_score contract; AQE handles the Zipf head on the shuffled join).

SQL replay: with FIXED weights the forward pass is exactly
reproducible in DuckDB (:func:`quality_classifier_oracle_sql`) — the
md5-derived bucket hash, the n-gram construction, the in-order list
sum, and the sigmoid are all literal arithmetic; only exp() may
differ by 1 ulp, so gates round the score (6 decimals). Training is
NOT SQL-expressible (an iterative optimizer), the BPE precedent:
fit is property-tested in pytest, the forward pass is oracle-gated.
"""

from __future__ import annotations

import math
import struct
import zlib
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions import text as T

from cod_stats_spark.operators.dedup import BASE_HASH_SQL

#: the dedup family's hash templates are the single Spark-side source
#: (xxhash64 for production, md5_60 when a DuckDB oracle must replay);
#: this operator supports the two oracle-relevant members.
_SPARK_HASH = {k: BASE_HASH_SQL[k] for k in ("xxhash64", "md5_60")}

_DUCK_MD5_60 = (
    "list_sum(list_transform(range(15), q ->"
    " (strpos('0123456789abcdef', md5({x})[q+1:q+1]) - 1)::BIGINT"
    " * (1::BIGINT << (4*(14-q)))))"
)

_EXPR_DIM_LIMIT = 4096  # array-literal path bound (codegen method size)


@dataclass
class QualityClassifierModel:
    """Trained (or hand-fixed) classifier: ``dim`` hashed buckets,
    n-gram order, hash member, bias, and the dense weight vector.
    Size is dim floats — driver/broadcast bounded by construction."""

    dim: int
    ngrams: int = 2
    base_hash: str = "xxhash64"
    lowercase: bool = True
    bias: float = 0.0
    weights: list[float] = field(default_factory=list)
    loss_history: list[float] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.base_hash not in _SPARK_HASH:
            raise ValueError(f"unknown base_hash: {self.base_hash!r}")
        if self.ngrams not in (1, 2):
            raise ValueError("ngrams must be 1 or 2")
        if not self.weights:
            self.weights = [0.0] * self.dim
        if len(self.weights) != self.dim:
            raise ValueError("len(weights) != dim")


def _feats_sql(text_sql: str, ngrams: int, lowercase: bool) -> str:
    """SQL rendering of the feature array: tokens (+ adjacent-pair
    bigrams). The token array binds to a lambda variable via the
    one-element-transform idiom (functions/text.shingles_sql) — HOF
    lambdas evaluate interpreted, so inlining the split at every
    element_at leaf would re-split the document PER TOKEN PAIR
    (measured: the naive Column form made the sf0.1 feature explode
    ~10 s instead of ~1 s)."""
    src = f"lower({text_sql})" if lowercase else text_sql
    toks = f"filter(split(trim({src}), '\\\\s+'), w -> w != '')"
    if ngrams == 1:
        return toks
    body = (
        "concat(tk, if(size(tk) >= 2,"
        " transform(sequence(0, size(tk) - 2),"
        " i -> concat(element_at(tk, i + 1), ' ', element_at(tk, i + 2))),"
        " cast(array() as array<string>)))"
    )
    return f"transform(array({toks}), tk -> {body})[0]"


def _feats_col(text_col: str, ngrams: int, lowercase: bool) -> Column:
    """Array of string features for a column NAME (the call sites all
    pass names; arbitrary expressions would need quoting)."""
    return F.expr(_feats_sql(text_col, ngrams, lowercase))


def _fid_sql(x: str, dim: int, base_hash: str) -> str:
    """Bucket id as a SQL fragment over an expression string ``x``."""
    return f"cast(pmod({_SPARK_HASH[base_hash](x)}, {dim}) as int)"


def quality_classifier_fit(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 16,
    ngrams: int = 2,
    iters: int = 20,
    # mean pooling keeps |x| <= 1 with most mass ~1/n_feats, so full-
    # batch GD is stable (and needs) a large step; 10.0 descends
    # monotonically on the fluent-vs-junk fixtures, 40 oscillates first
    lr: float = 10.0,
    l2: float = 1e-6,
    base_hash: str = "xxhash64",
    lowercase: bool = True,
) -> QualityClassifierModel:
    """Fit by full-batch gradient descent on the logistic loss.

    ``label_col`` must be 0/1. Per iteration: one broadcast of the
    current (nonzero) weights, one doc_id shuffle for margins + errors,
    one fid shuffle for the exact gradient, one ≤dim-row collect.
    The hashed feature frame is computed ONCE and persisted across
    iterations (at 100 TB this is the dominant cost — the per-iteration
    work is two shuffles over the already-materialized sparse matrix).
    Returns the model with the per-iteration mean logloss recorded in
    ``loss_history`` (strictly evaluated BEFORE each update, so
    history[0] is the untrained loss)."""
    import pandas as pd

    if dim > (1 << 22):
        raise ValueError(
            "dim > 2^22: the driver weight vector is the documented "
            "bounded state — raise deliberately, not by default"
        )
    spark = docs.sparkSession
    feats = _feats_col(text_col, ngrams, lowercase)
    from pyspark.sql import Window

    grouped = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).cast("double").alias("_y"),
            F.explode(feats).alias("_f"),
        )
        .withColumn("_fid", F.expr(_fid_sql("_f", dim, base_hash)))
        .groupBy("_id", "_y", "_fid")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # per-doc normalization: val = count / n_feats (mean pooling) via a
    # window over the grouped rows — a totals self-join here would make
    # the (unpersisted) explode+groupBy run twice in one plan
    x = (
        grouped.withColumn(
            "_v",
            F.col("_c")
            / F.sum("_c").over(Window.partitionBy("_id")),
        )
        .select("_id", "_y", "_fid", "_v")
        .persist()
    )
    n_docs = x.select("_id").distinct().count()  # also materializes x
    if n_docs == 0:
        raise ValueError("quality_classifier_fit: no documents")

    w = [0.0] * dim
    bias = 0.0
    history: list[float] = []
    for _ in range(int(iters)):
        nz = [(i, wi) for i, wi in enumerate(w) if wi != 0.0]
        if nz:
            wrel = F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame(
                        {"_fid": [i for i, _ in nz],
                         "_w": [wi for _, wi in nz]}
                    )
                )
            )
            joined = x.join(wrel, "_fid", "left").withColumn(
                "_w", F.coalesce(F.col("_w"), F.lit(0.0))
            )
        else:
            joined = x.withColumn("_w", F.lit(0.0))
        # all training-loop sums run as DECIMAL(38,18): double sums are
        # shuffle-order-dependent, which would make the learned weights
        # (and the bias literal baked into downstream plans) drift run
        # to run — decimal addition is exact, so the fit is
        # bit-deterministic (and the bench signature stays frozen)
        dec = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")
        doc = joined.groupBy("_id", "_y").agg(
            dec(F.col("_v") * F.col("_w")).alias("_m")
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_m") + F.lit(bias))))
        # pinned: both the gradient join and the loss total read derr —
        # without the checkpoint the margin shuffle would run twice per
        # iteration (one row per doc, bounded like the doc frame itself)
        derr = doc.select(
            "_id",
            (p - F.col("_y")).alias("_e"),
            (
                -(
                    F.col("_y") * F.log(F.greatest(p, F.lit(1e-12)))
                    + (F.lit(1.0) - F.col("_y"))
                    * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-12)))
                )
            ).alias("_l"),
        ).localCheckpoint(eager=True)
        # ONE collect for the gradient AND the loss/bias totals (r16:
        # the separate totals action paid a full scheduler round trip
        # per iteration — both branches read the checkpointed derr, so
        # a union evaluates them in one job; fids are pmod ≥ 0, so -1
        # cannot collide). Sums stay DECIMAL — bit-identical updates.
        gb = (
            x.join(derr, "_id")
            .groupBy("_fid")
            .agg(dec(F.col("_e") * F.col("_v")).alias("_g"))
            .withColumn("_l", F.lit(None).cast("double"))
        )
        tot_df = derr.agg(
            dec(F.col("_e")).alias("_g"), dec(F.col("_l")).alias("_l")
        ).select(F.lit(-1).alias("_fid"), "_g", "_l")
        se = sl = 0.0
        grad_rows = []
        for r in gb.unionByName(tot_df).collect():
            if int(r["_fid"]) == -1:
                se, sl = float(r["_g"]), float(r["_l"])
            else:
                grad_rows.append(r)
        history.append(sl / n_docs)
        for r in grad_rows:
            i = int(r["_fid"])
            w[i] -= lr * (float(r["_g"]) / n_docs + l2 * w[i])
        bias -= lr * se / n_docs
        if math.isnan(bias):
            raise ArithmeticError("quality_classifier_fit diverged")
    x.unpersist()
    return QualityClassifierModel(
        dim=dim,
        ngrams=ngrams,
        base_hash=base_hash,
        lowercase=lowercase,
        bias=bias,
        weights=w,
        loss_history=history,
    )


def _weights_fingerprint(pairs) -> int:
    """Order-independent EXACT fingerprint of (fid, w) weight rows:
    sum (mod 2**63) of a CRC over each pair's (fid, IEEE-754 bits of
    w). Integer arithmetic only — parquet read-back order cannot
    perturb it, unlike a float sum whose reorder error scales with
    n and sum(|w|) at large dims."""
    acc = 0
    for fid, w in pairs:
        acc = (acc + zlib.crc32(struct.pack("<qd", int(fid), float(w)))) % (
            2**63
        )
    return acc


def save_classifier(spark, model: QualityClassifierModel, path: str) -> None:
    """Persist the trained model as a two-table parquet dir — the
    artifact a pipeline ships so every later batch (and every other
    engine reading the same layout) scores identically: ``weights/``
    holds (fid, w) for the NONZERO weights, ``meta/`` one row of
    hyperparameters + bias (the BPE save_merges discipline)."""
    nz = [(i, float(w)) for i, w in enumerate(model.weights) if w != 0.0]
    spark.createDataFrame(
        nz or [], "fid int, w double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/weights")
    # meta is written LAST and carries a weights fingerprint: a crash
    # between the two overwrites (re-saving over an old artifact)
    # would otherwise leave a torn hybrid that loads silently —
    # load_classifier verifies the fingerprint and refuses instead
    wfp = _weights_fingerprint(nz)
    spark.createDataFrame(
        [
            (
                model.dim,
                model.ngrams,
                model.base_hash,
                model.lowercase,
                float(model.bias),
                len(nz),
                wfp,
            )
        ],
        "dim int, ngrams int, base_hash string, lowercase boolean, "
        "bias double, n_nonzero int, wfp long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_classifier(spark, path: str) -> QualityClassifierModel:
    """Load a persisted model; weights restore dense (absent fids are
    exact zeros, the representation fit produced). Raises if the
    weights don't match the meta fingerprint (torn re-save)."""
    m = spark.read.parquet(f"{path}/meta").first()
    w = [0.0] * int(m["dim"])
    rows = spark.read.parquet(f"{path}/weights").collect()
    meta_fields = set(m.asDict().keys())
    if "wfp" in meta_fields:
        # exact equality: the fingerprint is an integer accumulation
        # of (fid, weight-bits) pairs, so it is order-independent — a
        # float sum would accrue reorder error scaling with n and
        # sum(|w|) and could spuriously reject an intact large-dim
        # artifact
        torn = len(rows) != int(m["n_nonzero"]) or _weights_fingerprint(
            [(int(r["fid"]), float(r["w"])) for r in rows]
        ) != int(m["wfp"])
    else:
        # legacy artifact (saved with the float-sum 'wsum' check):
        # verify with the old semantics at a relative tolerance so an
        # intact old model still loads — crashing on the field lookup
        # would strand every previously shipped artifact
        wsum = sum(float(r["w"]) for r in rows)
        tol = 1e-6 + 1e-12 * sum(abs(float(r["w"])) for r in rows)
        torn = len(rows) != int(m["n_nonzero"]) or abs(
            wsum - float(m["wsum"])
        ) > tol
    if torn:
        raise ValueError(
            f"load_classifier: {path} is torn — weights don't match the "
            "meta fingerprint (crashed mid re-save?); re-save the model"
        )
    for r in rows:
        w[int(r["fid"])] = float(r["w"])
    return QualityClassifierModel(
        dim=int(m["dim"]),
        ngrams=int(m["ngrams"]),
        base_hash=m["base_hash"],
        lowercase=bool(m["lowercase"]),
        bias=float(m["bias"]),
        weights=w,
    )


def quality_classifier_expr(
    model: QualityClassifierModel, text_col: str = "text"
) -> Column:
    """The zero-shuffle codegen forward pass: the weight vector as an
    array literal, score = sigmoid(bias + mean(w[fid(feature)])).
    Allowed up to dim 4096 (codegen method size); bigger models use
    the relation path in :func:`quality_classifier_score`."""
    if model.dim > _EXPR_DIM_LIMIT:
        raise ValueError(
            f"dim {model.dim} > {_EXPR_DIM_LIMIT}: use "
            "quality_classifier_score's relation path"
        )
    feats = _feats_sql(text_col, model.ngrams, model.lowercase)
    warr = "array(" + ", ".join(repr(float(v)) for v in model.weights) + ")"
    # the feature array binds to `fs` once per row (same idiom as
    # _feats_sql) — it is referenced three times in the margin
    margin = (
        f"if(size(fs) > 0, aggregate(transform(fs, f -> "
        f"element_at({warr}, {_fid_sql('f', model.dim, model.base_hash)}"
        f" + 1)), "
        f"cast(0.0 as double), (acc, v) -> acc + v) / size(fs), 0.0) "
        f"+ ({model.bias!r})"
    )
    return F.expr(
        f"transform(array({feats}), fs -> "
        f"1.0 / (1.0 + exp(-({margin}))))[0]"
    )


def quality_classifier_score(
    docs: DataFrame,
    model: QualityClassifierModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "qc_score",
    as_expression: bool | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """docs + (out_col,). ``as_expression=None`` picks the array-
    literal codegen path when dim allows it, else the relation path:
    explode → weight join (broadcast, or shuffled with
    ``broadcast_model=False`` for dims too large to ship) → one doc_id
    shuffle → sigmoid. Docs with zero features score sigmoid(bias)."""
    if as_expression is None:
        as_expression = model.dim <= _EXPR_DIM_LIMIT
    if as_expression:
        return docs.withColumn(
            out_col, quality_classifier_expr(model, text_col)
        )
    import pandas as pd

    spark = docs.sparkSession
    nz = [(i, v) for i, v in enumerate(model.weights) if v != 0.0]
    wrel = (
        spark.createDataFrame(
            pd.DataFrame(
                {"_fid": [i for i, _ in nz], "_w": [v for _, v in nz]}
            )
        )
        if nz
        else spark.createDataFrame([], "_fid int, _w double")
    )
    if broadcast_model:
        wrel = F.broadcast(wrel)
    feats = _feats_col(text_col, model.ngrams, model.lowercase)
    exploded = docs.select(
        F.col(id_col).alias("_id"), F.explode(feats).alias("_f")
    ).withColumn(
        "_fid", F.expr(_fid_sql("_f", model.dim, model.base_hash))
    )
    per_doc = (
        exploded.join(wrel, "_fid", "left")
        .groupBy("_id")
        .agg(
            F.sum(F.coalesce(F.col("_w"), F.lit(0.0))).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "_id",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(F.col("_s") / F.col("_n") + F.lit(model.bias))
                    )
                )
            ).alias(out_col),
        )
    )
    empty_score = 1.0 / (1.0 + math.exp(-model.bias))
    return docs.join(
        per_doc, docs[id_col] == per_doc["_id"], "left"
    ).select(
        *[docs[c] for c in docs.columns],
        F.coalesce(F.col(out_col), F.lit(empty_score)).alias(out_col),
    )


def _duck_feats_sql(
    src: str, text_expr: str, id_expr: str, ngrams: int, lowercase: bool
) -> str:
    """DuckDB subquery body producing (doc_id, feats) — the ONE
    definition of the hashed-feature tokenization on the oracle side,
    shared by this classifier's oracle and the DSIR oracle
    (operators/dsir.py): a tokenization fix must land in one place or
    the two replays silently drift apart (r13 review)."""
    src_txt = f"lower({text_expr})" if lowercase else text_expr
    bigram_part = (
        " || (CASE WHEN len(tk) >= 2 THEN list_transform("
        "range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2])"
        " ELSE []::VARCHAR[] END)"
        if ngrams == 2
        else ""
    )
    return f"""
  SELECT {id_expr} AS doc_id, tk{bigram_part} AS feats
  FROM (
    SELECT {id_expr},
           list_filter(string_split(trim(regexp_replace({src_txt}, '\\s+', ' ', 'g')), ' '),
                       t -> t <> '') AS tk
    FROM {src}
  )"""


def quality_classifier_oracle_sql(
    model: QualityClassifierModel,
    src: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB replica of the forward pass with the md5_60 hash member
    and the weights as a literal list — (doc_id, qc_score) rounded to
    6 decimals (exp() is the only 1-ulp-risk op). Requires
    ``base_hash='md5_60'`` (the oracle-replayable member)."""
    if model.base_hash != "md5_60":
        raise ValueError("oracle replay requires base_hash='md5_60'")
    warr = "[" + ", ".join(repr(float(v)) for v in model.weights) + "]"
    h = _DUCK_MD5_60.format(x="f")
    feats = _duck_feats_sql(
        src, text_expr, id_expr, model.ngrams, model.lowercase
    )
    return f"""
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(CASE WHEN len(feats) > 0
             THEN list_sum(list_transform(feats, f -> ({warr}::DOUBLE[])[(({h}) % {model.dim} + 1)::BIGINT]))
                  / len(feats)
             ELSE 0.0 END + ({model.bias!r})))), 6) AS qc_score
FROM (
{feats}
)
"""
