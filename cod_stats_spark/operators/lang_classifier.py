"""Trained language identification — multiclass hashed character-n-gram
logistic regression (the fastText lang-id posture).

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020) identifies language with a
trained fastText classifier (Joulin et al., EACL 2017) over character
n-grams BEFORE the per-language perplexity partitioning — the stage
this repo's :func:`operators.lm_score.perplexity_partition` mirrors.
Until r13 the repo fed that stage from a stopword-marker heuristic
(functions/text.lang_id); this module replaces it with the trained
form, reusing the exact machinery :mod:`operators.quality_classifier`
established (hashed features, distributed full-batch exact GD with
bounded driver state, JVM-side forward pass, SQL-replayable
inference), generalized from binary logistic to K-class softmax.

Factoring:

- **features**: character n-grams of the ``orders`` lengths (default
  1–3) over the space-padded normalized text (lowercase, collapsed
  whitespace, one leading/trailing space so grams see word
  boundaries), hashed into ``dim`` buckets, mean-pooled — per-class
  margin = ``bias_k + mean(weights_k[fid(gram)])``. Null text scores
  as the empty string — its two padding spaces cover every order ≤ 2,
  and a doc too short for EVERY order (possible only when
  min(orders) > 2) scores the biases alone — so every doc gets a
  deterministic prediction on every path.
- **fit**: full-batch softmax gradient descent. Per iteration: one
  broadcast of the nonzero weight rows (WIDE — one row per fid with K
  weight columns, so the exploded feature frame joins once, not K
  times), one doc shuffle for margins→softmax→errors, one fid shuffle
  for the exact gradient, a ≤dim×K collect. All sums DECIMAL(38,18)
  (shuffle-order-independent ⇒ bit-deterministic weights, the
  quality_classifier discipline). Driver state: K·dim floats.
- **inference**: the forward pass quantizes weights to 6-dp
  MICRO-UNITS (``w6 = round(w·10⁶)``) and sums INTEGERS, so the
  relation path (broadcast wide weight table → one doc shuffle), the
  array-literal expression path, and the DuckDB oracle replay compute
  bit-identical margins regardless of partitioning or summation
  order — the argmax needs no rounding fuzz at all. Ties break by
  language code ascending (the heuristic's convention). ``fit``
  returns weights already rounded to 6 dp, so quantization loses
  nothing.

SQL replay: with fixed weights the whole forward pass — padding,
n-gram construction, the md5-derived bucket hash, integer weight
sums, the greatest/CASE argmax — is literal arithmetic
(:func:`lang_classifier_oracle_sql`). Training is an iterative
optimizer, NOT SQL-expressible: property-tested in pytest (the BPE /
quality-classifier precedent), forward pass oracle-gated
(plans/bench_queries.py quality_tokens 'lang_pred').

Reference: the reference has no language handling at all (its corpus
is single-language game telemetry); this is LLM-pipeline extension
surface, built from the published fastText/CCNet method.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import LANG_MARKERS
from cod_stats_spark.operators.quality_classifier import (
    _DUCK_MD5_60,
    _EXPR_DIM_LIMIT,
    _SPARK_HASH,
    _fid_sql,
    _weights_fingerprint,
)

__all__ = [
    "LangClassifierModel",
    "lang_classifier_fit",
    "lang_classifier_score",
    "lang_classifier_expr",
    "lang_classifier_oracle_sql",
    "save_lang_classifier",
    "load_lang_classifier",
    "synthetic_lang_corpus",
]

_W6 = 1_000_000  # 6-dp micro-unit scale for exact integer weight sums


@dataclass
class LangClassifierModel:
    """K-class hashed char-n-gram softmax classifier. Size is
    ``K × dim`` floats — driver/broadcast bounded by construction."""

    dim: int
    classes: list[str]
    orders: tuple[int, ...] = (1, 2, 3)
    base_hash: str = "xxhash64"
    biases: list[float] = field(default_factory=list)
    weights: list[list[float]] = field(default_factory=list)
    loss_history: list[float] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.base_hash not in _SPARK_HASH:
            raise ValueError(f"unknown base_hash: {self.base_hash!r}")
        if not self.classes:
            raise ValueError("need at least one class")
        if list(self.classes) != sorted(set(self.classes)):
            # sorted-unique class order IS the tie-break rule; accepting
            # an arbitrary order would silently change predictions
            raise ValueError("classes must be sorted and unique")
        if not all(1 <= int(n) <= 8 for n in self.orders) or not self.orders:
            raise ValueError("orders must be n-gram lengths in 1..8")
        k = len(self.classes)
        if not self.biases:
            self.biases = [0.0] * k
        if not self.weights:
            self.weights = [[0.0] * self.dim for _ in range(k)]
        if len(self.biases) != k or len(self.weights) != k or any(
            len(w) != self.dim for w in self.weights
        ):
            raise ValueError("biases/weights shape != (K, dim)")

    def w6(self) -> list[list[int]]:
        """Weights quantized to integer micro-units — what every
        scoring path sums (exactly, in any order)."""
        return [
            [int(round(w * _W6)) for w in row] for row in self.weights
        ]


def _grams_sql(text_sql: str, orders: tuple[int, ...]) -> str:
    """SQL for the padded char-n-gram feature array. The padded text
    binds to a lambda variable via the one-element-transform idiom —
    inlining it at every substring leaf would re-normalize the doc per
    gram (the HOF-inlining hazard quality_classifier measured)."""
    norm = (
        f"concat(' ', trim(regexp_replace(lower(coalesce({text_sql}, '')),"
        f" '\\\\s+', ' ')), ' ')"
    )
    parts = [
        f"if(length(pt) >= {n}, transform(sequence(1, length(pt) - {n} + 1),"
        f" i -> substring(pt, i, {n})), cast(array() as array<string>))"
        for n in orders
    ]
    body = parts[0] if len(parts) == 1 else "concat(" + ", ".join(parts) + ")"
    return f"transform(array({norm}), pt -> {body})[0]"


def _grams_col(text_col: str, orders: tuple[int, ...]) -> Column:
    return F.expr(_grams_sql(text_col, orders))


def _grams_duck(text_expr: str, orders: tuple[int, ...]) -> str:
    """DuckDB replica of :func:`_grams_sql` — same padding, same
    1-based substring windows, same order concatenation."""
    norm = (
        f"' ' || trim(regexp_replace(lower(coalesce({text_expr}, '')),"
        f" '\\s+', ' ', 'g')) || ' '"
    )
    parts = [
        f"(CASE WHEN length(pt) >= {n} THEN "
        f"list_transform(range(1, length(pt) - {n} + 2),"
        f" i -> substr(pt, i, {n})) ELSE []::VARCHAR[] END)"
        for n in orders
    ]
    body = " || ".join(parts)
    return f"list_transform([{norm}], pt -> {body})[1]"


def lang_classifier_fit(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    classes: list[str] | None = None,
    dim: int = 2048,
    orders: tuple[int, ...] = (1, 2, 3),
    iters: int = 25,
    lr: float = 10.0,
    l2: float = 1e-6,
    base_hash: str = "xxhash64",
) -> LangClassifierModel:
    """Fit by full-batch gradient descent on the softmax cross-entropy.

    ``label_col`` holds language-code strings; ``classes`` defaults to
    the sorted distinct labels (one bounded collect — languages, not
    data). The hashed feature frame is computed ONCE and persisted;
    per-iteration work is two shuffles over it plus a ≤dim×K collect
    (at 100 TB the one-time featurization dominates, the
    quality_classifier shape). Weights/biases return rounded to 6 dp —
    exactly what the micro-unit scoring paths preserve. ``loss_history``
    records the mean cross-entropy BEFORE each update."""
    import pandas as pd
    from pyspark.sql import Window

    if dim * 8 > (1 << 25):
        raise ValueError(
            "dim too large: driver weight state is K*dim floats — raise "
            "deliberately, not by default"
        )
    spark = docs.sparkSession
    if classes is None:
        classes = sorted(
            r[0]
            for r in docs.select(label_col).distinct().collect()
            if r[0] is not None
        )
    k = len(classes)
    if k < 2:
        raise ValueError("lang_classifier_fit: need >= 2 classes")
    cls_idx = {c: i for i, c in enumerate(classes)}
    lbl = F.col(label_col)
    y = F.coalesce(
        *[F.when(lbl == c, F.lit(i)) for c, i in cls_idx.items()]
    )
    grouped = (
        docs.select(
            F.col(id_col).alias("_id"),
            y.alias("_y"),
            F.explode(_grams_col(text_col, orders)).alias("_f"),
        )
        .where(F.col("_y").isNotNull())  # unlisted labels don't train
        .withColumn("_fid", F.expr(_fid_sql("_f", dim, base_hash)))
        .groupBy("_id", "_y", "_fid")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    x = (
        grouped.withColumn(
            "_v", F.col("_c") / F.sum("_c").over(Window.partitionBy("_id"))
        )
        .select("_id", "_y", "_fid", "_v")
        .persist()
    )
    n_docs = x.select("_id").distinct().count()
    if n_docs == 0:
        raise ValueError("lang_classifier_fit: no labeled documents")

    w = [[0.0] * dim for _ in range(k)]
    b = [0.0] * k
    history: list[float] = []
    dec = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")
    for _ in range(int(iters)):
        nz = sorted(
            {i for row in w for i, wi in enumerate(row) if wi != 0.0}
        )
        if nz:
            wrel = F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame(
                        {
                            "_fid": nz,
                            **{
                                f"_w{j}": [w[j][i] for i in nz]
                                for j in range(k)
                            },
                        }
                    )
                )
            )
            joined = x.join(wrel, "_fid", "left")
        else:
            joined = x
            for j in range(k):
                joined = joined.withColumn(f"_w{j}", F.lit(0.0))
        margins = joined.groupBy("_id", "_y").agg(
            *[
                dec(F.col("_v") * F.coalesce(F.col(f"_w{j}"), F.lit(0.0)))
                .alias(f"_m{j}")
                for j in range(k)
            ]
        )
        m = [F.col(f"_m{j}") + F.lit(b[j]) for j in range(k)]
        mx = F.greatest(*m) if k > 1 else m[0]
        z = sum((F.exp(mj - mx) for mj in m[1:]), F.exp(m[0] - mx))
        probs = [F.exp(mj - mx) / z for mj in m]
        err_cols = [
            (probs[j] - (F.col("_y") == j).cast("double")).alias(f"_e{j}")
            for j in range(k)
        ]
        logp_y = F.coalesce(
            *[
                F.when(
                    F.col("_y") == j,
                    F.log(F.greatest(probs[j], F.lit(1e-12))),
                )
                for j in range(k)
            ]
        )
        # pinned: the gradient join and the loss/bias totals both read
        # derr — without the checkpoint the margin shuffle runs twice
        # per iteration (one row per doc, bounded like the doc frame)
        derr = margins.select(
            "_id", *err_cols, (-logp_y).alias("_l")
        ).localCheckpoint(eager=True)
        grad_rows = (
            x.join(derr, "_id")
            .groupBy("_fid")
            .agg(
                *[
                    dec(F.col(f"_e{j}") * F.col("_v")).alias(f"_g{j}")
                    for j in range(k)
                ]
            )
            .collect()
        )
        tot = derr.agg(
            *[dec(F.col(f"_e{j}")).alias(f"se{j}") for j in range(k)],
            dec(F.col("_l")).alias("sl"),
        ).first()
        history.append(float(tot["sl"]) / n_docs)
        for r in grad_rows:
            i = int(r["_fid"])
            for j in range(k):
                w[j][i] -= lr * (float(r[f"_g{j}"]) / n_docs + l2 * w[j][i])
        for j in range(k):
            b[j] -= lr * float(tot[f"se{j}"]) / n_docs
        if any(math.isnan(v) for v in b):
            raise ArithmeticError("lang_classifier_fit diverged")
    x.unpersist()
    return LangClassifierModel(
        dim=dim,
        classes=list(classes),
        orders=tuple(orders),
        base_hash=base_hash,
        biases=[round(v, 6) for v in b],
        weights=[[round(v, 6) for v in row] for row in w],
        loss_history=history,
    )


def _argmax_label(margins: list[Column], classes: list[str]) -> Column:
    """First class (ascending code order — classes are sorted) whose
    margin equals the greatest: greatest() returns one of its inputs
    bit-identically, so the equality is exact, and the CASE order IS
    the deterministic tie-break."""
    g = F.greatest(*margins) if len(margins) > 1 else margins[0]
    out = F.when(margins[0] == g, F.lit(classes[0]))
    for j in range(1, len(classes)):
        out = out.when(margins[j] == g, F.lit(classes[j]))
    return out


def _margins_array_sql(
    model: LangClassifierModel, text_col: str
) -> str:
    """SQL for the per-class margin ARRAY, computed once per row: the
    fid array binds to a lambda variable (one gram pass), each class
    margin is one integer aggregate over it, and the K margins
    materialize into an array so the argmax CASE reads elements
    instead of re-evaluating aggregates (the HOF re-evaluation
    hazard)."""
    grams = _grams_sql(text_col, model.orders)
    fid = _fid_sql("f", model.dim, model.base_hash)
    w6 = model.w6()
    margins = []
    for j in range(len(model.classes)):
        arr = "array(" + ", ".join(str(v) for v in w6[j]) + ")"
        # zero-gram guard: a doc too short for every order (possible
        # when min(orders) > 2 — the two padding spaces cover 1/2-
        # grams) must score the bias alone, matching the relation
        # path's fallback, not divide by size(fids) = 0 (an ANSI
        # crash; r13 review)
        margins.append(
            f"if(size(fids) > 0, (cast(aggregate(fids, cast(0 as bigint),"
            f" (acc, i) -> acc + element_at({arr}, i + 1)) as double)"
            f" / {float(_W6)!r}) / size(fids), cast(0.0 as double))"
            f" + ({model.biases[j]!r})"
        )
    return (
        f"transform(array(transform({grams}, f -> {fid})), fids -> "
        f"array({', '.join(margins)}))[0]"
    )


def _check_expr_size(model: LangClassifierModel) -> None:
    k = len(model.classes)
    if model.dim * k > _EXPR_DIM_LIMIT:
        raise ValueError(
            f"K*dim {model.dim * k} > {_EXPR_DIM_LIMIT}: use "
            "lang_classifier_score's relation path"
        )


def _argmax_case_sql(classes: list[str]) -> str:
    """The argmax CASE over a lambda-bound margins array ``ms`` —
    ONE definition shared by the label-only and label+margin
    expression paths (a tie-break or escaping fix must not have two
    places to land)."""
    return " ".join(
        f"WHEN element_at(ms, {j + 1}) = array_max(ms) THEN '{c}'"
        for j, c in enumerate(classes)
    )


def lang_classifier_expr(
    model: LangClassifierModel, text_col: str = "text"
) -> Column:
    """Zero-shuffle codegen forward pass: per-class micro-unit weight
    arrays as literals, integer sums, array_max/CASE argmax (ascending
    class order = the tie-break). Allowed up to K*dim <=
    ``_EXPR_DIM_LIMIT`` total literals (codegen method size); bigger
    models take the relation path."""
    _check_expr_size(model)
    return F.expr(
        f"transform(array({_margins_array_sql(model, text_col)}), "
        f"ms -> CASE {_argmax_case_sql(model.classes)} END)[0]"
    )


def lang_classifier_score(
    docs: DataFrame,
    model: LangClassifierModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lang_pred",
    margin_col: str | None = None,
    as_expression: bool | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """docs + (out_col [, margin_col]). Default path selection: the
    array-literal expression when K·dim fits codegen, else the
    relation path — grams explode → fid → ONE wide weight join
    (broadcast by default; ``broadcast_model=False`` shuffles it for
    dims too large to ship) → one doc shuffle → integer margin sums →
    argmax. Bit-identical answers on every path (micro-unit integer
    sums are order-free). ``margin_col`` adds the winning margin,
    rounded to 6 dp."""
    if as_expression is None:
        as_expression = model.dim * len(model.classes) <= _EXPR_DIM_LIMIT
    k = len(model.classes)
    if as_expression:
        if margin_col is None:
            return docs.withColumn(
                out_col, lang_classifier_expr(model, text_col)
            )
        # label + margin in ONE evaluation: the margins array feeds a
        # struct built inside the lambda binding, and the struct rides
        # through an explode (a Generate node — project collapsing
        # cannot inline the expression into each field extraction, so
        # the grams/hash/weight work runs once per row, not twice;
        # r13 review). Same literal-size guard as the label-only
        # branch — this path builds the same weight literals
        _check_expr_size(model)
        struct_sql = (
            f"transform(array({_margins_array_sql(model, text_col)}), "
            f"ms -> struct(CASE {_argmax_case_sql(model.classes)} END "
            f"AS label, array_max(ms) AS margin))[0]"
        )
        return (
            docs.withColumn("_lc", F.explode(F.array(F.expr(struct_sql))))
            .withColumn(out_col, F.col("_lc.label"))
            .withColumn(margin_col, F.round(F.col("_lc.margin"), 6))
            .drop("_lc")
        )
    import pandas as pd

    spark = docs.sparkSession
    w6 = model.w6()
    nz = sorted(
        {i for row in w6 for i, v in enumerate(row) if v != 0}
    )
    if nz:
        wrel = spark.createDataFrame(
            pd.DataFrame(
                {
                    "_fid": pd.Series(nz, dtype="int32"),
                    **{
                        f"_w{j}": pd.Series(
                            [w6[j][i] for i in nz], dtype="int64"
                        )
                        for j in range(k)
                    },
                }
            )
        )
    else:
        wrel = spark.createDataFrame(
            [],
            "_fid int, " + ", ".join(f"_w{j} long" for j in range(k)),
        )
    if broadcast_model:
        wrel = F.broadcast(wrel)
    exploded = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(_grams_col(text_col, model.orders)).alias("_f"),
    ).withColumn("_fid", F.expr(_fid_sql("_f", model.dim, model.base_hash)))
    sums = (
        exploded.join(wrel, "_fid", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.coalesce(F.col(f"_w{j}"), F.lit(0)))
                .alias(f"_s{j}")
                for j in range(k)
            ],
        )
    )
    margins = [
        (
            F.coalesce(F.col(f"_s{j}"), F.lit(0)).cast("double")
            / F.lit(float(_W6))
        )
        / F.col("_n")
        + F.lit(model.biases[j])
        for j in range(k)
    ]
    per_doc = sums.select(
        "_id",
        _argmax_label(margins, model.classes).alias(out_col),
        *(
            [
                F.round(
                    F.greatest(*margins) if k > 1 else margins[0], 6
                ).alias(margin_col)
            ]
            if margin_col is not None
            else []
        ),
    )
    # text coalesces to '' inside the gram builder, so every doc has
    # grams and the join is total — left + coalesce kept for the
    # belt-and-braces posture (a dropped doc would be silent)
    bias_only = max(
        range(k), key=lambda j: (model.biases[j], -j)
    )
    joined = docs.join(per_doc, docs[id_col] == per_doc["_id"], "left")
    cols = [docs[c] for c in docs.columns] + [
        F.coalesce(F.col(out_col), F.lit(model.classes[bias_only])).alias(
            out_col
        )
    ]
    if margin_col is not None:
        # zero-gram docs (min(orders) > 2 on too-short text) have no
        # per_doc row: their margin is the winning bias, matching the
        # expression path's guarded form (r13 review)
        cols.append(
            F.coalesce(
                F.col(margin_col),
                F.round(F.lit(max(model.biases)), 6),
            ).alias(margin_col)
        )
    return joined.select(*cols)


def lang_classifier_oracle_sql(
    model: LangClassifierModel,
    src: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB replica of the forward pass — (doc_id, lang_pred,
    lang_margin): same padding/grams, the md5_60 bucket hash, the SAME
    integer micro-unit sums (list_sum over BIGINT is exact in any
    order), the same double arithmetic shape ((sum/1e6)/n + bias), the
    same greatest/CASE ascending-code argmax. Requires
    ``base_hash='md5_60'`` (the oracle-replayable member)."""
    if model.base_hash != "md5_60":
        raise ValueError("oracle replay requires base_hash='md5_60'")
    k = len(model.classes)
    w6 = model.w6()
    h = _DUCK_MD5_60.format(x="f")
    fid = f"((({h}) % {model.dim})::BIGINT)"
    margins = []
    for j in range(k):
        arr = "[" + ", ".join(str(v) for v in w6[j]) + "]"
        margins.append(
            f"(CASE WHEN len(fids) > 0 THEN"
            f" (list_sum(list_transform(fids, i ->"
            f" ({arr}::BIGINT[])[i + 1]))::DOUBLE"
            f" / {float(_W6)!r}) / len(fids) ELSE 0.0 END)"
            f" + ({model.biases[j]!r})"
        )
    g = f"greatest({', '.join(margins)})" if k > 1 else margins[0]
    case = " ".join(
        f"WHEN m{j} = g THEN '{model.classes[j]}'" for j in range(k)
    )
    m_cols = ", ".join(f"{m} AS m{j}" for j, m in enumerate(margins))
    return f"""
SELECT doc_id,
       CASE {case} END AS lang_pred,
       round(g, 6) AS lang_margin
FROM (
  SELECT doc_id, {m_cols}, {g} AS g
  FROM (
    SELECT {id_expr} AS doc_id,
           list_transform({_grams_duck(text_expr, model.orders)},
                          f -> {fid}) AS fids
    FROM {src}
  )
)
"""


def save_lang_classifier(spark, model: LangClassifierModel, path: str) -> None:
    """Two-table parquet artifact: ``weights/`` (fid, class, w) for the
    nonzero weights, ``meta/`` one row of hyperparameters + biases +
    a weights fingerprint written LAST (torn re-saves load-refuse —
    the quality_classifier save discipline)."""
    nz = [
        (i, j, float(wv))
        for j, row in enumerate(model.weights)
        for i, wv in enumerate(row)
        if wv != 0.0
    ]
    spark.createDataFrame(
        nz or [], "fid int, cls int, w double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/weights")
    wfp = _weights_fingerprint(
        [(fid * len(model.classes) + j, wv) for fid, j, wv in nz]
    )
    spark.createDataFrame(
        [
            (
                model.dim,
                list(model.classes),
                [int(n) for n in model.orders],
                model.base_hash,
                [float(v) for v in model.biases],
                len(nz),
                wfp,
            )
        ],
        "dim int, classes array<string>, orders array<int>, "
        "base_hash string, biases array<double>, n_nonzero int, wfp long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_lang_classifier(spark, path: str) -> LangClassifierModel:
    m = spark.read.parquet(f"{path}/meta").first()
    classes = list(m["classes"])
    k = len(classes)
    w = [[0.0] * int(m["dim"]) for _ in range(k)]
    rows = spark.read.parquet(f"{path}/weights").collect()
    torn = len(rows) != int(m["n_nonzero"]) or _weights_fingerprint(
        [
            (int(r["fid"]) * k + int(r["cls"]), float(r["w"]))
            for r in rows
        ]
    ) != int(m["wfp"])
    if torn:
        raise ValueError(
            f"load_lang_classifier: {path} is torn — weights don't match "
            "the meta fingerprint (crashed mid re-save?); re-save"
        )
    for r in rows:
        w[int(r["cls"])][int(r["fid"])] = float(r["w"])
    return LangClassifierModel(
        dim=int(m["dim"]),
        classes=classes,
        orders=tuple(int(n) for n in m["orders"]),
        base_hash=m["base_hash"],
        biases=[float(v) for v in m["biases"]],
        weights=w,
    )


#: Training lexicons: the heuristic's marker words plus common words
#: and planted MORPHOLOGY (suffixes + language-typical characters) so
#: the char-n-gram features carry real per-language signal. Built from
#: public linguistic commonplace; the point is a deterministic,
#: dependency-free trainable corpus, not linguistic fidelity.
LANG_LEXICON: dict[str, list[str]] = {
    "en": LANG_MARKERS["en"]
    + ["that", "for", "this", "you", "have", "are", "was", "not",
       "they", "from", "which", "would", "there", "their", "about",
       "people", "because", "through", "thought", "should"],
    "de": LANG_MARKERS["de"]
    + ["ein", "eine", "ich", "sie", "auf", "für", "wird", "auch",
       "nach", "über", "zwischen", "während", "können", "müssen",
       "schön", "straße", "zeit", "jahr", "immer", "doch"],
    "fr": LANG_MARKERS["fr"]
    + ["une", "des", "dans", "pour", "que", "qui", "avec", "sur",
       "être", "avoir", "faire", "très", "même", "après", "où",
       "français", "toujours", "beaucoup", "déjà", "aussi"],
    "es": LANG_MARKERS["es"]
    + ["una", "del", "con", "para", "que", "como", "más", "pero",
       "años", "también", "cuando", "desde", "están", "señor",
       "niño", "pequeño", "español", "siempre", "ahora", "así"],
    "zh": LANG_MARKERS["zh"]
    + ["zhong1", "guo2", "ren2", "da4", "xiao3", "hao3", "xue2",
       "sheng1", "lao3", "shi1", "ming2", "tian1", "jin1", "nian2",
       "yue4", "hui4", "dui4", "mei2", "you3", "zai4"],
}

_LANG_SUFFIXES: dict[str, list[str]] = {
    "en": ["ing", "tion", "ness", "ed", "ly"],
    "de": ["ung", "keit", "lich", "chen", "heit"],
    "fr": ["ment", "eux", "ique", "ais", "oir"],
    "es": ["ción", "dad", "ando", "illo", "mente"],
    "zh": ["1", "2", "3", "4", "5"],  # pinyin tone digits
}

_LANG_CHARS: dict[str, str] = {
    "en": "abcdefghijklmnopqrstuvwxyz",
    "de": "abcdefghiklmnorstuzäöüß",
    "fr": "abcdefgilmnoprstuvéèêàçô",
    "es": "abcdefgilmnoprstuvñáéíóú",
    "zh": "bcdfghjklmnpqrstwxyz",  # pinyin onsets
}


def synthetic_lang_corpus(
    n_per_lang: int = 120,
    seed: int = 7,
    langs: list[str] | None = None,
    doc_id_start: int = 0,
) -> list[tuple[int, str, str]]:
    """Deterministic (doc_id, lang, text) rows: each doc mixes lexicon
    words with synthesized stems carrying planted per-language
    morphology. Driver-side by design — a training fixture, not a
    corpus operator."""
    langs = sorted(langs or LANG_LEXICON)
    out: list[tuple[int, str, str]] = []
    did = doc_id_start
    for lang in langs:
        lex = LANG_LEXICON[lang]
        sufs = _LANG_SUFFIXES[lang]
        chars = _LANG_CHARS[lang]
        for i in range(n_per_lang):
            rng = random.Random(f"{seed}:{lang}:{i}")
            toks: list[str] = []
            for _ in range(rng.randint(20, 60)):
                if rng.random() < 0.55:
                    toks.append(rng.choice(lex))
                else:
                    stem = "".join(
                        rng.choice(chars)
                        for _ in range(rng.randint(2, 6))
                    )
                    toks.append(stem + rng.choice(sufs))
            out.append((did, lang, " ".join(toks)))
            did += 1
    return out
