"""Unigram language-model scoring — corpus-likelihood document quality.

The CCNet/KenLM-style quality signal (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020): fit a language model on a corpus, score each document by
its average per-token negative log-likelihood, and gate or bucket
documents on the score — fluent in-distribution text scores low,
gibberish and boilerplate-free noise score high. A full KenLM is out
of scope for a pure-Spark engine; the unigram model captures the
workhorse part of the signal (vocabulary fit) with exact, replayable
arithmetic:

- :func:`unigram_lm_fit`   — token → count model: one explode + one
  shuffle on token (map-side partial agg absorbs the Zipf head).
- :func:`unigram_lm_score` — per-document mean negative log-likelihood
  under the add-alpha-smoothed model. The model is broadcast by
  default, which also neutralizes token-frequency skew in the join
  (the 'the' key never shuffles); for a vocabulary too large to
  broadcast, pass ``broadcast_model=False`` and let AQE handle it.

Driver state: two scalars (total count N, vocabulary size V) — the
same bounded-collect contract as the k×d k-means partials.

Determinism for the SQL oracle: probabilities are exact integer
ratios in double arithmetic, identical in Spark and DuckDB; only
``ln`` may differ by 1 ulp per token, so gates round the per-doc mean
(the `quality_tokens` gate uses 6 decimals, error margin ~1e9 below
the rounding step).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions import text as T


#: kn_lm_score's broadcast-default guard: trigram-support rows past
#: this count refuse the broadcast join hint instead of silently
#: shipping a corpus-sized model to every executor (~10⁷ rows of
#: three words + count ≈ several hundred MB serialized — the
#: docstring's documented crossover to the shuffled posture).
_KN_BROADCAST_ROW_CAP = 10_000_000


def _tokens(text_col: str, lowercase: bool):
    c = F.col(text_col)
    return T.words(F.lower(c) if lowercase else c)


def unigram_lm_fit(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(token, cnt) — the unigram model. Store it as a table; refitting
    per batch and merging is just summing counts (the
    :mod:`rollup_state` contract applies if you maintain it
    incrementally)."""
    return (
        docs.select(F.explode(_tokens(text_col, lowercase)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_lm_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    alpha: float = 1.0,
    lowercase: bool = True,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the add-alpha
    model: (id..., lm_tokens, lm_nll). Unseen tokens get the smoothed
    floor probability alpha/(N + alpha·V); zero-token documents score
    (0, 0.0). Lower = more in-distribution; exp(lm_nll) is the
    perplexity.

    The model plan executes exactly ONCE. ``broadcast_model=True``
    (the default) collects it driver-side — the same driver-sized
    contract broadcasting already implies — computes N/V locally, and
    ships the (token, logp) model to the scoring pass: as
    ``create_map`` literals inside the token projection when the
    vocabulary fits :data:`_ARPA_EXPR_ROW_CAP` (r17 — the
    arpa_lm_score literal-map discipline applied to the unigram path,
    VERDICT #6: zero joins, zero broadcast stages; ``try_element_at``
    on the map returns null for a missing token exactly like the left
    join's no-match in ANY session mode, and the logp literals are the SAME
    driver-computed doubles the relation carried, so scores are
    bit-identical), else as a literal broadcast relation to the
    scoring join (the Heaps-law posture: real-corpus vocabularies
    outgrow any expression budget, and the cap gates on the MODEL,
    which does not grow with the scored corpus).
    ``broadcast_model=False`` persists the model instead (the N/V
    totals action materializes the cache the scoring join then reads);
    the cache lives as long as the returned frame — callers doing a
    one-shot score may ``model.unpersist()`` after their action.
    Pre-fix, the N/V ``.first()`` and the unpersisted join each ran
    the full fit (explode + token shuffle) — twice per call."""
    id_cols = id_cols or ["doc_id"]
    spark = docs.sparkSession
    logp_expr = None
    if broadcast_model:
        import pandas as pd

        mrows = model.select("token", "cnt").toPandas()
        n_total = float(mrows["cnt"].sum()) if len(mrows) else 0.0
        vocab = float(len(mrows))
        denom = n_total + alpha * vocab
        if denom <= 0:
            raise ValueError("unigram_lm_score: empty model")
        logp = [math.log((c + alpha) / denom) for c in mrows["cnt"]]
        if len(mrows) <= _ARPA_EXPR_ROW_CAP:
            # sorted: the collected row order depends on the session's
            # shuffle partitioning, and an order-dependent literal
            # would move the plan signature between sessions (map
            # lookup itself is order-independent)
            logp_expr = _lit_map(dict(sorted(zip(mrows["token"], logp))))
        else:
            scored_model = F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame({"token": mrows["token"], "_logp": logp})
                )
            )
    else:
        from pyspark.storagelevel import StorageLevel

        model = model.persist(StorageLevel.MEMORY_AND_DISK)
        totals = model.agg(
            F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
        ).first()
        n_total = float(totals["n"] or 0)
        vocab = float(totals["v"] or 0)
        denom = n_total + alpha * vocab
        if denom <= 0:
            raise ValueError("unigram_lm_score: empty model")
        scored_model = model.select(
            "token",
            F.log(
                (F.col("cnt") + F.lit(alpha)) / F.lit(denom)
            ).alias("_logp"),
        )
    unseen = math.log(alpha / denom)
    tk = docs.select(*id_cols, F.explode(_tokens(text_col, lowercase)).alias("token"))
    if logp_expr is not None:
        # try_element_at, not element_at: under ANSI a plain map probe
        # THROWS for an unseen token where the left join produced the
        # null this path coalesces to the OOV floor; under non-ANSI
        # (every engine/driver session) the two forms compile to the
        # identical physical expression, so the safe form is free
        # (r17 review — the winnow_sql finding, map flavor)
        scored_tk = tk.withColumn(
            "_logp", F.try_element_at(logp_expr, F.col("token"))
        )
    else:
        scored_tk = tk.join(scored_model, "token", "left")
    per_doc = (
        scored_tk
        .groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("lm_tokens"),
            (
                -F.sum(F.coalesce(F.col("_logp"), F.lit(unseen)))
                / F.count(F.lit(1))
            ).alias("lm_nll"),
        )
    )
    return (
        docs.select(*id_cols)
        .join(per_doc, id_cols, "left")
        .select(
            *id_cols,
            F.coalesce(F.col("lm_tokens"), F.lit(0)).alias("lm_tokens"),
            F.coalesce(F.col("lm_nll"), F.lit(0.0)).alias("lm_nll"),
        )
    )


def bigram_lm_fit(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(w1, w2, cnt) — adjacent-token bigram counts. One explode + one
    shuffle on the pair; the Zipf head collapses map-side exactly like
    the unigram fit. Merge incrementally by summing cnt."""
    tk = _tokens(text_col, lowercase)
    src = docs.select(tk.alias("_tk"))
    pairs = F.expr(
        "filter(transform(_tk, (w, i) ->"
        " struct(if(i > 0, element_at(_tk, i), null) as w1, w as w2)),"
        " p -> p.w1 is not null)"
    )
    return (
        src.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bigram_lm_score(
    docs: DataFrame,
    uni_model: DataFrame,
    bi_model: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    alpha: float = 1.0,
    lam: float = 0.7,
    lowercase: bool = True,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document mean NLL under a Jelinek-Mercer interpolated
    bigram model: (id..., lm2_tokens, lm2_nll).

    P(w_i | w_{i-1}) = λ·c(w_{i-1}, w_i)/c(w_{i-1})
                     + (1-λ)·P_uni(w_i)           (positions ≥ 2)
    P(w_1)           = P_uni(w_1)                 (no context)

    with P_uni the add-alpha unigram (same convention as
    unigram_lm_score; unseen tokens get the α/(N+αV) floor; unseen
    contexts/pairs contribute nothing to the bigram term).

    ``broadcast_model=True`` (default) collects both models once
    driver-side and ships literal relations — right while they fit
    (vocabularies are Heaps-bounded; bigram SUPPORT grows much
    faster, so this path is for corpus scales where the pair table
    is still tens of millions of rows). At 100 TB pass
    ``broadcast_model=False``: the models persist and the scoring
    runs as shuffled joins on w2 and (w1, w2) — AQE handles the Zipf
    head — with each fit still executing exactly once. Zero-token
    documents score (0, 0.0); exp(lm2_nll) is the interpolated
    perplexity."""
    import pandas as pd

    id_cols = id_cols or ["doc_id"]
    spark = docs.sparkSession
    if broadcast_model:
        uni = uni_model.select("token", "cnt").toPandas()
        n_total = float(uni["cnt"].sum()) if len(uni) else 0.0
        vocab = float(len(uni))
        denom = n_total + alpha * vocab
        if denom <= 0:
            raise ValueError("bigram_lm_score: empty unigram model")
        floor = alpha / denom
        puni = {
            w: (c + alpha) / denom for w, c in zip(uni["token"], uni["cnt"])
        }
        cuni = dict(zip(uni["token"], (float(c) for c in uni["cnt"])))
        bi = bi_model.select("w1", "w2", "cnt").toPandas()
        # A context token absent from the unigram model (possible when
        # the two models were merged/refreshed independently) has no
        # cnt to normalize by. The shuffle path below drops such rows
        # via its inner join on w1 — mirror that here instead of
        # KeyError'ing, so both paths fail the same way (by backoff).
        if len(bi):
            known = bi["w1"].isin(cuni.keys())
            bi = bi[known]
        uni_rel = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(
                    {"w2": uni["token"], "_pu": [puni[w] for w in uni["token"]]}
                )
            )
        )
        bi_rel = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "w1": bi["w1"],
                        "w2b": bi["w2"],
                        "_bp": [
                            lam * float(c) / cuni[w1]
                            for w1, c in zip(bi["w1"], bi["cnt"])
                        ],
                    }
                )
            )
            if len(bi)
            else spark.createDataFrame([], "w1 string, w2b string, _bp double")
        )
    else:
        from pyspark.storagelevel import StorageLevel

        uni_model = uni_model.persist(StorageLevel.MEMORY_AND_DISK)
        totals = uni_model.agg(
            F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
        ).first()
        denom = float(totals["n"] or 0) + alpha * float(totals["v"] or 0)
        if denom <= 0:
            raise ValueError("bigram_lm_score: empty unigram model")
        floor = alpha / denom
        uni_rel = uni_model.select(
            F.col("token").alias("w2"),
            ((F.col("cnt") + F.lit(alpha)) / F.lit(denom)).alias("_pu"),
        )
        ctx = uni_model.select(
            F.col("token").alias("w1"), F.col("cnt").alias("_c1")
        )
        bi_rel = bi_model.join(ctx, "w1").select(
            "w1",
            F.col("w2").alias("w2b"),
            (F.lit(lam) * F.col("cnt") / F.col("_c1")).alias("_bp"),
        )
    tk = _tokens(text_col, lowercase)
    ent = F.expr(
        "transform(_tk, (w, i) ->"
        " struct(if(i > 0, element_at(_tk, i), null) as wp, w as w))"
    )
    pos = (
        docs.select(*id_cols, tk.alias("_tk"))
        .select(*id_cols, F.explode(ent).alias("_e"))
        .select(*id_cols, F.col("_e.wp").alias("_wp"), F.col("_e.w").alias("_w"))
    )
    joined = (
        pos.join(uni_rel, pos["_w"] == uni_rel["w2"], "left")
        .join(
            bi_rel,
            (pos["_wp"] == bi_rel["w1"]) & (pos["_w"] == bi_rel["w2b"]),
            "left",
        )
    )
    pu = F.coalesce(F.col("_pu"), F.lit(floor))
    prob = F.when(F.col("_wp").isNull(), pu).otherwise(
        F.coalesce(F.col("_bp"), F.lit(0.0)) + F.lit(1.0 - lam) * pu
    )
    per_doc = joined.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("lm2_tokens"),
        (-F.sum(F.log(prob)) / F.count(F.lit(1))).alias("lm2_nll"),
    )
    return (
        docs.select(*id_cols)
        .join(per_doc, id_cols, "left")
        .select(
            *id_cols,
            F.coalesce(F.col("lm2_tokens"), F.lit(0)).alias("lm2_tokens"),
            F.coalesce(F.col("lm2_nll"), F.lit(0.0)).alias("lm2_nll"),
        )
    )


def bigram_lm_oracle_sql(
    src: str,
    text_sql: str = "text",
    id_sql: str = "doc_id",
    alpha: float = 1.0,
    lam: float = 0.7,
) -> str:
    """DuckDB replica of bigram fit∘score over the same corpus:
    identical tokens, counts, interpolation, and per-doc mean —
    (doc_id, lm2_tokens, lm2_nll) unrounded. Training == scoring
    corpus, so every observed pair and context resolves (the Spark
    path's unseen branches are unit-test territory)."""
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_sql})), '\\s+'),"
        " t -> t <> '')"
    )
    return f"""
SELECT d.{id_sql} AS doc_id,
       coalesce(s.lm2_tokens, 0) AS lm2_tokens,
       coalesce(s.lm2_nll, 0.0) AS lm2_nll
FROM {src} d
LEFT JOIN (
  WITH tok AS (
    SELECT {id_sql} AS doc_id, {toks} AS tk FROM {src}
  ), uni AS (
    SELECT t, count(*) AS c
    FROM (SELECT unnest(tk) AS t FROM tok) GROUP BY t
  ), tot AS (
    SELECT sum(c)::DOUBLE AS n, count(*)::DOUBLE AS v FROM uni
  ), pr AS (
    SELECT doc_id, i, tk[i + 1] AS w,
           CASE WHEN i > 0 THEN tk[i] END AS wp
    FROM tok, UNNEST(CASE WHEN len(tk) = 0 THEN []
                     ELSE generate_series(0, len(tk) - 1) END) AS u(i)
  ), big AS (
    SELECT wp AS w1, w AS w2, count(*) AS c12
    FROM pr WHERE wp IS NOT NULL GROUP BY 1, 2
  ), terms AS (
    SELECT p.doc_id,
           CASE WHEN p.wp IS NULL
                THEN (u2.c + {alpha!r}) / (tot.n + {alpha!r} * tot.v)
                ELSE {lam!r} * b.c12::DOUBLE / u1.c
                     + {1.0 - lam!r} * (u2.c + {alpha!r})
                       / (tot.n + {alpha!r} * tot.v)
           END AS prob
    FROM pr p
    CROSS JOIN tot
    JOIN uni u2 ON u2.t = p.w
    LEFT JOIN uni u1 ON u1.t = p.wp
    LEFT JOIN big b ON b.w1 = p.wp AND b.w2 = p.w
  )
  SELECT doc_id, count(*) AS lm2_tokens,
         -sum(ln(prob)) / count(*) AS lm2_nll
  FROM terms GROUP BY doc_id
) s ON s.doc_id = d.{id_sql}
"""


def unigram_lm_oracle_sql(
    src: str,
    text_sql: str = "text",
    id_sql: str = "doc_id",
    alpha: float = 1.0,
) -> str:
    """DuckDB replica of fit∘score over the same corpus: same token
    expression, same smoothed ratio, same mean — yields
    (doc_id, lm_tokens, lm_nll) unrounded; the gate applies its own
    rounding. Scoring the training corpus itself means every token is
    seen, so the inner model join is exhaustive (the Spark path's
    unseen floor is exercised by unit tests instead)."""
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_sql})), '\\s+'),"
        " t -> t <> '')"
    )
    return f"""
SELECT d.{id_sql} AS doc_id,
       coalesce(s.lm_tokens, 0) AS lm_tokens,
       coalesce(s.lm_nll, 0.0) AS lm_nll
FROM {src} d
LEFT JOIN (
  WITH tkn AS (
    SELECT {id_sql} AS doc_id, unnest({toks}) AS t FROM {src}
  ), model AS (
    SELECT t, count(*) AS cnt FROM tkn GROUP BY t
  ), tot AS (
    SELECT sum(cnt)::DOUBLE AS n, count(*)::DOUBLE AS v FROM model
  )
  SELECT tkn.doc_id, count(*) AS lm_tokens,
         -sum(ln((m.cnt + {alpha!r}) / (tot.n + {alpha!r} * tot.v)))
           / count(*) AS lm_nll
  FROM tkn JOIN model m ON tkn.t = m.t CROSS JOIN tot
  GROUP BY tkn.doc_id
) s ON s.doc_id = d.{id_sql}
"""


def trigram_lm_fit(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(w1, w2, w3, cnt) — adjacent-token trigram counts, the bigram
    fit's shape one order up: one explode + one shuffle on the
    triple. Merge incrementally by summing cnt."""
    tk = _tokens(text_col, lowercase)
    src = docs.select(tk.alias("_tk"))
    triples = F.expr(
        "filter(transform(_tk, (w, i) ->"
        " struct(if(i > 1, element_at(_tk, i - 1), null) as w1,"
        " if(i > 0, element_at(_tk, i), null) as w2, w as w3)),"
        " t -> t.w1 is not null)"
    )
    return (
        src.select(F.explode(triples).alias("t"))
        .select("t.w1", "t.w2", "t.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_fit(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(w1..wn, cnt) — adjacent-token n-gram counts for any order
    n ≥ 1: the bigram/trigram fits generalized (one explode + one
    shuffle on the tuple; the Zipf head collapses map-side). Merge
    incrementally by summing cnt. ``n=1`` yields (w1, cnt) — the
    unigram model under the generic column convention (the KN family
    accepts either ``token`` or ``w1`` for order 1)."""
    n = int(n)
    if n < 1:
        raise ValueError("ngram_lm_fit: n must be >= 1")
    tk = _tokens(text_col, lowercase)
    src = docs.select(tk.alias("_tk"))
    # the n-gram ENDING at 0-based position i: words at 1-based
    # indices i-n+2 .. i+1, defined only when i >= n-1 (no padding —
    # the bigram/trigram convention); w1 is the strictest guard, so
    # filtering on it drops every short-prefix position
    fields = ", ".join(
        f"if(i > {n - 2 - j}, element_at(_tk, i - {n - 2 - j}), null)"
        f" as w{j + 1}"
        for j in range(n)
    )
    grams = F.expr(
        f"filter(transform(_tk, (w, i) -> struct({fields})),"
        " g -> g.w1 is not null)"
    )
    return (
        src.select(F.explode(grams).alias("g"))
        .select(*[f"g.w{j + 1}" for j in range(n)])
        .groupBy(*[f"w{j + 1}" for j in range(n)])
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_fit_multi(
    docs: DataFrame,
    K: int,
    text_col: str = "text",
    lowercase: bool = True,
) -> list[DataFrame]:
    """Count tables for ALL orders 1..K from ONE corpus pass — each
    row-identical to ``ngram_lm_fit(docs, k)`` (exact integer counts;
    parity-pinned in tests), but the corpus is tokenized, exploded and
    shuffled ONCE instead of K times (r16 optimization: the kn5_score
    fit phase ran five separate explode+shuffle passes over the
    reference slice — guide §2.4, remove shuffles outright).

    Mechanics: every position emits the K-gram ENDING there (nulls
    where the document starts too late); a GROUPING SETS aggregation
    over the K suffix sets {(g_{K-k+1}..g_K)} counts every order in
    one Expand + one shuffle (partial map-side aggregation collapses
    the Zipf head per set before the exchange). Positions whose
    furthest context word is null fall into null-keyed groups, which
    the per-order extraction drops — exactly the per-order fits'
    ``w1 is not null`` guard, applied post-aggregation where it is
    equivalent (null never collides with a real token: tokens come
    from split and are never null).

    The grouped table is localCheckpoint'ed (lazily — the caller's
    first action materializes it) so every returned order — and every
    statistic the KN scorers derive from them — reads one physical
    table. A plain ``persist`` is NOT enough here (r17 fix): the KN
    scorers consume these tables through self-joins, and the
    analyzer's self-join deduplication re-instantiates one side's
    plan with fresh expression ids; a GROUPING SETS (Expand) subtree
    does not canonicalize back to the cache key after that rewrite,
    so CacheManager substitution silently missed and every derived
    statistic re-ran the full tokenize+explode+aggregate fit from
    parquet (r16 after-plans: 18 distinct fit re-derivations in
    kn5_score). Checkpointing truncates the lineage to a LogicalRDD,
    whose re-instantiated copies still point at the SAME computed
    RDD — the reuse is physical, not a cache lookup that can miss.
    Scale note: localCheckpoint trades re-computability for that
    guarantee (lost executors fail the job instead of recomputing);
    the grouped table is model-sized (the Zipf-collapsed count table,
    not the corpus), which is the posture broadcast already assumes."""
    K = int(K)
    if K < 1:
        raise ValueError("ngram_lm_fit_multi: K must be >= 1")
    if K == 1:
        return [ngram_lm_fit(docs, 1, text_col, lowercase)]
    tk = _tokens(text_col, lowercase)
    src = docs.select(tk.alias("_tk"))
    # g_K = the position's token; g_{K-j} = j tokens back (null early)
    fields = ", ".join(
        f"if(i > {K - 2 - j}, element_at(_tk, i - {K - 2 - j}), null)"
        f" as g{j + 1}"
        for j in range(K - 1)
    ) + f", w as g{K}"
    ent = F.expr(f"transform(_tk, (w, i) -> struct({fields}))")
    cols = [f"g{j}" for j in range(1, K + 1)]
    pos = (
        src.select(F.explode(ent).alias("_e"))
        .select(*[F.col(f"_e.g{j}").alias(f"g{j}") for j in range(1, K + 1)])
    )
    sets = [[f"g{j}" for j in range(K - k + 1, K + 1)] for k in range(1, K + 1)]
    grouped = (
        pos.groupingSets(sets, *[F.col(c) for c in cols])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.grouping_id().alias("_gid"),
        )
        .localCheckpoint(eager=False)
    )
    models = []
    for k in range(1, K + 1):
        gid = (1 << K) - (1 << k)  # columns g1..g_{K-k} aggregated
        models.append(
            grouped.filter(
                (F.col("_gid") == gid)
                & F.col(f"g{K - k + 1}").isNotNull()
            ).select(
                *[
                    F.col(f"g{K - k + j}").alias(f"w{j}")
                    for j in range(1, k + 1)
                ],
                "cnt",
            )
        )
    return models


def _uni_as_w1(uni_model: DataFrame) -> DataFrame:
    """Normalize the order-1 table's word column to ``w1``
    (:func:`unigram_lm_fit` emits ``token``; :func:`ngram_lm_fit`
    emits ``w1``) so the generic KN code paths see one convention."""
    if "token" in uni_model.columns and "w1" not in uni_model.columns:
        return uni_model.withColumnRenamed("token", "w1")
    return uni_model


def _validate_kn_models(models, caller: str) -> list[DataFrame]:
    """Entry checks shared by the generic KN family: orders 1..K with
    2 <= K <= :data:`_ARPA_MAX_ORDER`, each table carrying its w1..wk
    key columns plus cnt. Returns the models with order 1 normalized
    to the ``w1`` convention."""
    models = list(models)
    K = len(models)
    if K < 2:
        raise ValueError(
            f"{caller}: need count tables for orders 1..K with K >= 2 "
            f"(got {K})"
        )
    if K > _ARPA_MAX_ORDER:
        raise ValueError(
            f"{caller}: order {K} exceeds the supported order "
            f"{_ARPA_MAX_ORDER} — fit and pass at most "
            f"{_ARPA_MAX_ORDER} tables"
        )
    models[0] = _uni_as_w1(models[0])
    for k, df in enumerate(models, start=1):
        want = {f"w{i}" for i in range(1, k + 1)} | {"cnt"}
        have = set(df.columns)
        if not want <= have:
            raise ValueError(
                f"{caller}: order-{k} table is missing columns "
                f"{sorted(want - have)} (has {sorted(have)})"
            )
    return models


def _kn_scalar_probes(pairs) -> dict[str, float]:
    """Evaluate several (tag, one-row single-column aggregate) scalar
    probes in ONE tagged-union job (r17 — guide §5, the
    quality-classifier union-collect discipline): each scalar was
    previously its own driver round trip, ~0.3–0.6 s of pure
    scheduling apiece on small data. The union job is also the action
    that materializes any persisted frame a probe reads, exactly as
    the separate counts were. Returns {tag: float} with SQL nulls
    (empty-input sums) mapped to 0.0."""
    u = None
    for tag, agg in pairs:
        p = agg.select(
            F.lit(tag).alias("_k"), F.col(agg.columns[0]).alias("_v")
        )
        u = p if u is None else u.unionByName(p)
    return {r["_k"]: float(r["_v"] or 0) for r in u.collect()}


def kn_lm_score(
    docs: DataFrame,
    uni_model: DataFrame,
    bi_model: DataFrame,
    tri_model: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    discount: float = 0.75,
    alpha: float = 1.0,
    lowercase: bool = True,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document mean NLL under an interpolated Kneser-Ney TRIGRAM
    model (Kneser & Ney 1995; the Chen & Goodman 1999 interpolated
    form with one fixed discount D — the model family KenLM, and
    therefore CCNet's published scorer, builds on):
    (id..., lm3_tokens, lm3_nll).

    Layers, each backing off into the next on an unseen context:

    - P₁(w)      = (N₁₊(·w) + α) / (N₁₊(··) + α·V) — the CONTINUATION
      unigram ("how many contexts does w complete"), add-α-floored so
      out-of-vocabulary tokens score the floor (the family's
      convention; pure KN would give them zero). V is the unigram
      model's vocabulary size.
    - P₂(w|v)    = max(N₁₊(·vw) − D, 0)/N₁₊(·v·)
                   + D·N₁₊(v·)/N₁₊(·v·) · P₁(w); contexts v with no
      trigram through them (N₁₊(·v·) = 0) back off wholly to P₁(w).
    - P₃(w|u,v)  = max(c(uvw) − D, 0)/c(uv)
                   + D·N₁₊(uv·)/c(uv) · P₂(w|v); unseen (u,v)
      contexts back off wholly to P₂(w|v).

    Positions 1 and 2 of each document score P₁ and P₂ (no padding
    symbols — the no-context convention the bigram scorer set).

    Every derived statistic is a count-distinct or sum over the model
    tables — ONE code path builds them as DataFrames (bounded aggs;
    the only driver values are the three totals), with
    ``broadcast_model`` controlling only the join hint: True ships
    the relations broadcast (gate scale), False leaves them to
    shuffled joins + AQE (the 100 TB posture — trigram support grows
    far past broadcast size long before the corpus does). All
    probabilities are exact integer ratios in double arithmetic —
    identical in any engine; only ln() risks 1 ulp, so gates round
    the mean to 6 dp (:func:`kn_lm_oracle_sql` replays everything).
    Zero-token documents score (0, 0.0).

    Broadcast safety: with ``broadcast_model=True`` the trigram
    SUPPORT (largest model relation) is counted first and anything
    past :data:`_KN_BROADCAST_ROW_CAP` raises loudly — a
    corpus-dependent model table silently shipped to every executor
    is the one 100 TB failure mode a default must not hide (the
    dsir_fit dim-cap convention; r13 advice). The count is one
    bounded agg over the model table; pass ``broadcast_model=False``
    for big models (same output, shuffled joins + AQE). Side effect:
    ``tri_model`` is persisted for the returned plan's lifetime (it
    feeds three derived relations; under the broadcast default the
    guard count doubles as the cache-populating action) — released
    only on the cap-raise path."""
    if not (0.0 < discount < 1.0):
        raise ValueError("kn_lm_score: discount must be in (0, 1)")
    if alpha <= 0:
        # α=0 passes the denom>0 check but floors OOV probability at
        # exactly 0 — ln(0) then NULLs out of the sum (understating
        # the mean NLL) or crashes under ANSI; the docstring's whole
        # point is that the floor EXISTS (r13 review)
        raise ValueError("kn_lm_score: alpha must be > 0")
    id_cols = id_cols or ["doc_id"]
    hint = F.broadcast if broadcast_model else (lambda df: df)
    d = float(discount)

    from pyspark.storagelevel import StorageLevel

    # persisted: the trigram relation feeds THREE consumers (n1_vw,
    # fanout_uv, rel_top) — and under the broadcast default the guard
    # count below is the action that materializes the cache, so the
    # guard costs no extra model pass (r14 review: an unpersisted
    # count re-ran the whole trigram fit once per call). Lives as
    # long as the returned plan, the cont-persist contract.
    tri_model = tri_model.persist(StorageLevel.MEMORY_AND_DISK)
    # the bigram relation ALSO feeds three consumers (cont below plus
    # the two c_uv top-layer relations): unpersisted, each broadcast
    # build re-ran the full bigram fit (r16 optimization — guide §2.4;
    # the n_cc action materializes this cache on the way to cont)
    bi_model = bi_model.persist(StorageLevel.MEMORY_AND_DISK)
    # persisted: the probe action below materializes the cache, which
    # rel_p1 then reads inside the scoring plan — without it the
    # bigram groupBy would run twice per call (and with
    # broadcast_model=False that is a full model-table pass; r13
    # second review). Bounded ≤ vocabulary rows; lives as long as the
    # returned plan, the unigram_lm_score persist contract.
    cont = bi_model.groupBy("w2").agg(
        F.count(F.lit(1)).alias("_n1w")  # N1+(·w): distinct v per w
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ONE build-time action for the guard count, V and N1+(··) —
    # see _kn_scalar_probes; it still materializes the tri/bi/cont
    # persists exactly as the separate counts did.
    probes = [
        ("v", uni_model.agg(F.count(F.lit(1)).cast("double"))),
        ("cc", cont.agg(F.sum("_n1w").cast("double"))),
    ]
    if broadcast_model:
        probes.append(
            ("top", tri_model.agg(F.count(F.lit(1)).cast("double")))
        )
    vals = _kn_scalar_probes(probes)
    if broadcast_model and vals["top"] > _KN_BROADCAST_ROW_CAP:
        n_tri = int(vals["top"])
        # release the just-materialized caches before raising: the
        # caller will rebuild/re-pass the model for the
        # broadcast_model=False retry, and an orphaned >10⁷-row
        # cache would stay pinned for the session (r14 review).
        # bi_model too (r17 review): the cont probe scanned — and
        # therefore cached — the comparably large persisted bigram
        # table before the guard could fire.
        tri_model.unpersist()
        bi_model.unpersist()
        cont.unpersist()
        raise ValueError(
            f"kn_lm_score: trigram model has {n_tri:,} rows — past "
            f"the broadcast cap ({_KN_BROADCAST_ROW_CAP:,}); pass "
            "broadcast_model=False (shuffled joins, identical "
            "output) for models this size"
        )
    v_size = vals["v"]
    n_cc = vals["cc"]  # N1+(··): distinct bigram types
    denom1 = n_cc + alpha * v_size
    if denom1 <= 0:
        raise ValueError("kn_lm_score: empty model")
    floor1 = alpha / denom1
    rel_p1 = hint(
        cont.select(
            F.col("w2").alias("_p1w"),
            ((F.col("_n1w") + F.lit(alpha)) / F.lit(denom1)).alias("_p1"),
        )
    )

    # middle layer: N1+(·vw) per (v,w); N1+(·v·) per v; N1+(v·) per v
    n1_vw = tri_model.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).alias("_nvw")  # distinct u per (v, w)
    )
    n1_vdot = n1_vw.groupBy("w2").agg(
        F.sum("_nvw").alias("_nvd")  # distinct (u, w) through v
    )
    # N1+(v·) for the middle layer's λ(v) counts distinct w with
    # N1+(·vw) > 0 — i.e. the CONTINUATION distribution's own support
    # (rows of n1_vw), NOT the raw bigram fanout: with no sentence
    # padding, a bigram vw occurring only document-initially has
    # c(vw) > 0 but N1+(·vw) = 0, and the bigram-table fanout would
    # inflate λ(v) so P₂(·|v) sums above 1 (Chen & Goodman 1999 §3;
    # r13 advice). Discounted mass D·|support| now exactly equals the
    # redistributed mass λ(v)·N1+(·v·) modulo the α floor on P₁.
    fanout_v = n1_vw.groupBy("w2").agg(
        F.count(F.lit(1)).alias("_fv")  # N1+(v·): distinct w, cont. support
    )
    rel_mid = hint(
        n1_vw.join(n1_vdot, "w2").select(
            F.col("w2").alias("_mv"),
            F.col("w3").alias("_mw"),
            (
                F.greatest(F.col("_nvw") - F.lit(d), F.lit(0.0))
                / F.col("_nvd")
            ).alias("_mmain"),
        )
    )
    rel_midlam = hint(
        n1_vdot.join(fanout_v, "w2").select(
            F.col("w2").alias("_lv"),
            (F.lit(d) * F.col("_fv") / F.col("_nvd")).alias("_mlam"),
        )
    )

    # top layer: c(uvw), c(uv), N1+(uv·)
    fanout_uv = tri_model.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_fuv")  # distinct w after (u, v)
    )
    c_uv = bi_model.select(
        F.col("w1").alias("_cu"), F.col("w2").alias("_cv"),
        F.col("cnt").alias("_cuv"),
    )
    rel_top = hint(
        tri_model.join(
            c_uv,
            (tri_model["w1"] == c_uv["_cu"]) & (tri_model["w2"] == c_uv["_cv"]),
        ).select(
            F.col("w1").alias("_tu"), F.col("w2").alias("_tv"),
            F.col("w3").alias("_tw"),
            (
                F.greatest(F.col("cnt") - F.lit(d), F.lit(0.0))
                / F.col("_cuv")
            ).alias("_tmain"),
        )
    )
    rel_toplam = hint(
        fanout_uv.join(
            c_uv,
            (fanout_uv["w1"] == c_uv["_cu"]) & (fanout_uv["w2"] == c_uv["_cv"]),
        ).select(
            F.col("w1").alias("_gu"), F.col("w2").alias("_gv"),
            (F.lit(d) * F.col("_fuv") / F.col("_cuv")).alias("_tlam"),
        )
    )

    tk = _tokens(text_col, lowercase)
    ent = F.expr(
        "transform(_tk, (w, i) -> struct("
        " if(i > 1, element_at(_tk, i - 1), null) as wpp,"
        " if(i > 0, element_at(_tk, i), null) as wp, w as w))"
    )
    pos = (
        docs.select(*id_cols, tk.alias("_tk"))
        .select(*id_cols, F.explode(ent).alias("_e"))
        .select(
            *id_cols,
            F.col("_e.wpp").alias("_wpp"),
            F.col("_e.wp").alias("_wp"),
            F.col("_e.w").alias("_w"),
        )
    )
    joined = (
        pos.join(rel_p1, pos["_w"] == rel_p1["_p1w"], "left")
        .join(
            rel_mid,
            (pos["_wp"] == rel_mid["_mv"]) & (pos["_w"] == rel_mid["_mw"]),
            "left",
        )
        .join(rel_midlam, pos["_wp"] == rel_midlam["_lv"], "left")
        .join(
            rel_top,
            (pos["_wpp"] == rel_top["_tu"])
            & (pos["_wp"] == rel_top["_tv"])
            & (pos["_w"] == rel_top["_tw"]),
            "left",
        )
        .join(
            rel_toplam,
            (pos["_wpp"] == rel_toplam["_gu"])
            & (pos["_wp"] == rel_toplam["_gv"]),
            "left",
        )
    )
    p1 = F.coalesce(F.col("_p1"), F.lit(floor1))
    p2 = F.when(
        F.col("_mlam").isNotNull(),
        F.coalesce(F.col("_mmain"), F.lit(0.0)) + F.col("_mlam") * p1,
    ).otherwise(p1)
    p3 = F.when(
        F.col("_tlam").isNotNull(),
        F.coalesce(F.col("_tmain"), F.lit(0.0)) + F.col("_tlam") * p2,
    ).otherwise(p2)
    prob = (
        F.when(F.col("_wp").isNull(), p1)
        .when(F.col("_wpp").isNull(), p2)
        .otherwise(p3)
    )
    per_doc = joined.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("lm3_tokens"),
        (-F.sum(F.log(prob)) / F.count(F.lit(1))).alias("lm3_nll"),
    )
    return (
        docs.select(*id_cols)
        .join(per_doc, id_cols, "left")
        .select(
            *id_cols,
            F.coalesce(F.col("lm3_tokens"), F.lit(0)).alias("lm3_tokens"),
            F.coalesce(F.col("lm3_nll"), F.lit(0.0)).alias("lm3_nll"),
        )
    )


def kn_ngram_score(
    docs: DataFrame,
    models,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    discount: float = 0.75,
    alpha: float = 1.0,
    lowercase: bool = True,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document mean NLL under an interpolated Kneser-Ney model of
    ANY order 2..5 — :func:`kn_lm_score` with the hardwired trigram
    recursion generalized (Chen & Goodman 1999 §3: the layer recursion
    is uniform), so the engine FITS the same 5-gram model family
    :func:`arpa_lm_score` consumes (the CCNet/KenLM posture — Wenzek
    et al. 2020 filter on 5-gram KenLM scores): (id..., kn_tokens,
    kn_nll).

    ``models`` is the list of raw count tables for orders 1..K
    (:func:`ngram_lm_fit`; order 1 may use the ``token`` column from
    :func:`unigram_lm_fit`). Layers, each backing off into the next
    on an unseen context — exactly the kn_lm_score formulas at every
    order, and bit-identical to it at K=3 (parity-tested):

    - P₁(w)       = (N₁₊(·w) + α) / (N₁₊(··) + α·V) — continuation
      unigram with the add-α OOV floor.
    - P_k(w|ctx)  for 1 < k < K: continuation statistics from the
      order-(k+1) table — max(N₁₊(·ctx w) − D, 0)/N₁₊(·ctx ·)
      + D·N₁₊(ctx·)/N₁₊(·ctx ·) · P_{k-1}(w|ctx′), where N₁₊(ctx·)
      counts the CONTINUATION support (distinct w with
      N₁₊(·ctx w) > 0 — the r13 document-initial fix, applied at
      every middle layer).
    - P_K(w|ctx)  = max(c(ctx·w) − D, 0)/c(ctx)
      + D·N₁₊(ctx·)/c(ctx) · P_{K-1}(w|ctx′) — raw counts at the
      top, denominators from the order-(K−1) table.

    Position i (0-based) scores layer min(K, i+1) — the no-padding
    convention. Zero-token documents score (0, 0.0). All
    probabilities are exact integer ratios in double arithmetic
    (:func:`kn_ngram_oracle_sql` replays everything; gates round the
    mean to 6 dp for the ln ulp).

    Plan shape: pos explode + (2K−1) model-relation left joins —
    broadcast by default with the :data:`_KN_BROADCAST_ROW_CAP` guard
    counted on the top-order table (the largest relation);
    ``broadcast_model=False`` leaves them shuffled + AQE (the 100 TB
    posture). The top table and each middle layer's continuation
    table persist for the returned plan's lifetime (each feeds 3
    derived relations — the kn_lm_score cont-persist contract); the
    guard count doubles as the top table's cache-populating action."""
    if not (0.0 < float(discount) < 1.0):
        raise ValueError("kn_ngram_score: discount must be in (0, 1)")
    if alpha <= 0:
        raise ValueError("kn_ngram_score: alpha must be > 0")
    models = _validate_kn_models(models, "kn_ngram_score")
    K = len(models)
    id_cols = id_cols or ["doc_id"]
    hint = F.broadcast if broadcast_model else (lambda df: df)
    d = float(discount)

    from pyspark.storagelevel import StorageLevel

    top = models[K - 1].persist(StorageLevel.MEMORY_AND_DISK)
    # the order-(K-1) table feeds the two top-layer denominator
    # relations (rel_top, rel_toplam) — unpersisted, each broadcast
    # build re-ran that order's full fit (r16 optimization, the
    # kn_lm_score bi_model persist generalized; materialized lazily
    # by the scoring action — no extra driver action)
    models[K - 2] = models[K - 2].persist(StorageLevel.MEMORY_AND_DISK)
    cont = models[1].groupBy("w2").agg(
        F.count(F.lit(1)).alias("_n1w")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ONE build-time action for the guard count, V and N1+(··) —
    # see _kn_scalar_probes; it still materializes the top/cont
    # persists exactly as the separate counts did.
    probes = [
        ("v", models[0].agg(F.count(F.lit(1)).cast("double"))),
        ("cc", cont.agg(F.sum("_n1w").cast("double"))),
    ]
    if broadcast_model:
        probes.append(("top", top.agg(F.count(F.lit(1)).cast("double"))))
    vals = _kn_scalar_probes(probes)
    if broadcast_model and vals["top"] > _KN_BROADCAST_ROW_CAP:
        n_top = int(vals["top"])
        # release everything the probe job materialized (r17 review):
        # at K=3 the cont probe scans — and caches — the persisted
        # models[K-2] (== the bigram table); unpersist is a no-op on
        # frames the probe never touched
        top.unpersist()
        models[K - 2].unpersist()
        cont.unpersist()
        raise ValueError(
            f"kn_ngram_score: order-{K} model has {n_top:,} rows — "
            f"past the broadcast cap ({_KN_BROADCAST_ROW_CAP:,}); "
            "pass broadcast_model=False (shuffled joins, identical "
            "output) for models this size"
        )
    v_size = vals["v"]
    n_cc = vals["cc"]
    denom1 = n_cc + alpha * v_size
    if denom1 <= 0:
        raise ValueError("kn_ngram_score: empty model")
    floor1 = alpha / denom1
    rel_p1 = hint(
        cont.select(
            F.col("w2").alias("_p1w"),
            ((F.col("_n1w") + F.lit(alpha)) / F.lit(denom1)).alias("_p1"),
        )
    )

    # middle layers k = 2..K-1: continuation statistics from the
    # order-(k+1) table — nv keyed (v1..v_{k-1}, w) with v1 the
    # FURTHEST context word (matching the w2..w_{k+1} suffix of the
    # source table); each nv persists (it feeds the per-context sum,
    # the continuation-support fanout, and the main-term relation)
    rel_mid, rel_midlam, nv_cache = {}, {}, []
    for k in range(2, K):
        src_t = models[k]  # order k+1
        nv = src_t.groupBy(
            *[f"w{i}" for i in range(2, k + 2)]
        ).agg(F.count(F.lit(1)).alias("_nvw"))
        for i in range(2, k + 1):
            nv = nv.withColumnRenamed(f"w{i}", f"v{i - 1}")
        nv = nv.withColumnRenamed(f"w{k + 1}", "w").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        nv_cache.append(nv)
        ctx = [f"v{i}" for i in range(1, k)]
        nvd = nv.groupBy(*ctx).agg(F.sum("_nvw").alias("_nvd"))
        fv = nv.groupBy(*ctx).agg(F.count(F.lit(1)).alias("_fv"))
        rel_mid[k] = hint(
            nv.join(nvd, ctx).select(
                *[F.col(f"v{i}").alias(f"_m{k}v{i}") for i in range(1, k)],
                F.col("w").alias(f"_m{k}w"),
                (
                    F.greatest(F.col("_nvw") - F.lit(d), F.lit(0.0))
                    / F.col("_nvd")
                ).alias(f"_mmain{k}"),
            )
        )
        rel_midlam[k] = hint(
            nvd.join(fv, ctx).select(
                *[F.col(f"v{i}").alias(f"_l{k}v{i}") for i in range(1, k)],
                (F.lit(d) * F.col("_fv") / F.col("_nvd")).alias(f"_mlam{k}"),
            )
        )

    # top layer: raw counts, denominators from the order-(K-1) table
    topctx = [f"w{i}" for i in range(1, K)]
    c_low = models[K - 2].select(
        *topctx, F.col("cnt").alias("_clow")
    )
    rel_top = hint(
        top.join(c_low, topctx).select(
            *[F.col(f"w{i}").alias(f"_t{K}v{i}") for i in range(1, K)],
            F.col(f"w{K}").alias(f"_t{K}w"),
            (
                F.greatest(F.col("cnt") - F.lit(d), F.lit(0.0))
                / F.col("_clow")
            ).alias("_tmain"),
        )
    )
    fuv = top.groupBy(*topctx).agg(F.count(F.lit(1)).alias("_fuv"))
    rel_toplam = hint(
        fuv.join(c_low, topctx).select(
            *[F.col(f"w{i}").alias(f"_g{K}v{i}") for i in range(1, K)],
            (F.lit(d) * F.col("_fuv") / F.col("_clow")).alias("_tlam"),
        )
    )

    # position frame: target _w + contexts _c1.._c{K-1} (_cj = j back)
    tk = _tokens(text_col, lowercase)
    fields = ["w as w"] + [
        f"if(i > {j - 1}, element_at(_tk, i - {j - 1}), null) as c{j}"
        for j in range(1, K)
    ]
    ent = F.expr("transform(_tk, (w, i) -> struct(" + ", ".join(fields) + "))")
    joined = (
        docs.select(*id_cols, tk.alias("_tk"))
        .select(*id_cols, F.explode(ent).alias("_e"))
        .select(
            *id_cols,
            F.col("_e.w").alias("_w"),
            *[F.col(f"_e.c{j}").alias(f"_c{j}") for j in range(1, K)],
        )
    )
    joined = joined.join(rel_p1, joined["_w"] == F.col("_p1w"), "left").drop(
        "_p1w"
    )
    # layer-k context word v_i is the (k-i)-back position column
    for k in range(2, K):
        cond = F.col("_w") == F.col(f"_m{k}w")
        for i in range(1, k):
            cond = cond & (F.col(f"_c{k - i}") == F.col(f"_m{k}v{i}"))
        joined = joined.join(rel_mid[k], cond, "left").drop(
            f"_m{k}w", *[f"_m{k}v{i}" for i in range(1, k)]
        )
        lcond = F.col(f"_c{k - 1}") == F.col(f"_l{k}v1")
        for i in range(2, k):
            lcond = lcond & (F.col(f"_c{k - i}") == F.col(f"_l{k}v{i}"))
        joined = joined.join(rel_midlam[k], lcond, "left").drop(
            *[f"_l{k}v{i}" for i in range(1, k)]
        )
    tcond = F.col("_w") == F.col(f"_t{K}w")
    for i in range(1, K):
        tcond = tcond & (F.col(f"_c{K - i}") == F.col(f"_t{K}v{i}"))
    joined = joined.join(rel_top, tcond, "left").drop(
        f"_t{K}w", *[f"_t{K}v{i}" for i in range(1, K)]
    )
    gcond = F.col(f"_c{K - 1}") == F.col(f"_g{K}v1")
    for i in range(2, K):
        gcond = gcond & (F.col(f"_c{K - i}") == F.col(f"_g{K}v{i}"))
    joined = joined.join(rel_toplam, gcond, "left").drop(
        *[f"_g{K}v{i}" for i in range(1, K)]
    )

    ps = [F.coalesce(F.col("_p1"), F.lit(floor1))]
    for k in range(2, K):
        ps.append(
            F.when(
                F.col(f"_mlam{k}").isNotNull(),
                F.coalesce(F.col(f"_mmain{k}"), F.lit(0.0))
                + F.col(f"_mlam{k}") * ps[-1],
            ).otherwise(ps[-1])
        )
    ps.append(
        F.when(
            F.col("_tlam").isNotNull(),
            F.coalesce(F.col("_tmain"), F.lit(0.0))
            + F.col("_tlam") * ps[-1],
        ).otherwise(ps[-1])
    )
    prob = F.when(F.col("_c1").isNull(), ps[0])
    for j in range(2, K):
        prob = prob.when(F.col(f"_c{j}").isNull(), ps[j - 1])
    prob = prob.otherwise(ps[K - 1])
    per_doc = joined.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("kn_tokens"),
        (-F.sum(F.log(prob)) / F.count(F.lit(1))).alias("kn_nll"),
    )
    return (
        docs.select(*id_cols)
        .join(per_doc, id_cols, "left")
        .select(
            *id_cols,
            F.coalesce(F.col("kn_tokens"), F.lit(0)).alias("kn_tokens"),
            F.coalesce(F.col("kn_nll"), F.lit(0.0)).alias("kn_nll"),
        )
    )


def kn_to_arpa(
    *models: DataFrame,
    discount: float = 0.75,
    alpha: float = 1.0,
) -> "ArpaModel":
    """Convert an interpolated-KN model of ANY order 2..5 (the
    :func:`kn_ngram_score` statistics; orders 1..K count tables as
    positional args — ``kn_to_arpa(uni, bi, tri)`` is the historical
    trigram call) into a standard BACKOFF :class:`ArpaModel` — the
    SRILM ``ngram -write-lm`` workflow: fit the filter LM on the
    cluster, :func:`write_arpa` the artifact, and any external
    KenLM/SRILM consumer loads it.

    The conversion is EXACT, not approximate: an interpolated model
    P(w|ctx) = main(ctx,w) + λ(ctx)·P(w|ctx′) is a backoff model
    whose listed entries carry the full interpolated probability and
    whose backoff weights are b(ctx) = log₁₀ λ(ctx) — an unlisted
    (ctx,w) then scores 10^b·P(w|ctx′) = λ·P(w|ctx′), exactly the
    interpolated value (Chen & Goodman 1999 §2: interpolated models
    are expressible in backoff form). Listings, per order k:

    - 1-grams: the WHOLE vocabulary (continuation-floored P₁ — words
      never seen as a continuation get the α floor), backoff
      b(v) = log₁₀ λ₂(v) where layer 2 has statistics through v
      (absent = 0: such contexts back off wholesale); plus ``<unk>``
      at the α floor, so the export carries KN's OOV convention in
      the format's own mechanism.
    - k-grams (1 < k < K): the continuation support N₁₊(·ctx w) > 0
      UNION every layer-(k+1) backoff context (the format requires a
      context's own entry to host its backoff weight), each with the
      interpolated P_k; backoff b = log₁₀ λ_{k+1} where present.
    - K-grams: the seen top-order support with interpolated P_K.

    ``arpa_lm_score(docs, kn_to_arpa(*models))`` equals
    ``kn_ngram_score(docs, models)`` on EVERY document — seen and
    unseen n-grams, OOV words and contexts, early positions — up to
    the log₁₀·ln 10 ulp (parity-tested at orders 3 AND 5; the
    formulas are re-derived here over the model SUPPORT instead of
    document positions, and those tests are the no-divergence pin).
    All derivations are bounded model-support aggregations; driver
    state is the totals plus the per-order counts.

    The models must come from the same corpus fit — and that contract
    is now PROBED at entry instead of trusted (r15 advice: the old
    inner joins silently dropped orphan trigram contexts): every
    k-gram's prefix and suffix (k−1)-gram must be an observed
    (k−1)-gram, checked with bounded anti-join probes that raise
    loudly on the first orphan. The probes double as the
    cache-populating pass over the persisted inputs."""
    if not (0.0 < float(discount) < 1.0):
        raise ValueError("kn_to_arpa: discount must be in (0, 1)")
    if alpha <= 0:
        raise ValueError("kn_to_arpa: alpha must be > 0")
    models = _validate_kn_models(models, "kn_to_arpa")
    K = len(models)
    d = float(discount)
    spark = models[0].sparkSession
    if models[0].filter(F.col("w1") == "<unk>").limit(1).collect():
        raise ValueError(
            "kn_to_arpa: the corpus vocabulary contains the literal "
            "'<unk>' — it would collide with the export's OOV entry"
        )

    from pyspark.storagelevel import StorageLevel

    # every input feeds 2+ lineages below (stats, entry unions, raw
    # denominators) — persist the ones the CALLER has not already
    # persisted; the contract probes and the vocab count are the
    # cache-populating actions. Tracking ownership matters on exit:
    # unpersisting a caller-persisted frame would evict a cache a
    # live kn_ngram_score plan (or the caller) still relies on (r16
    # review — the fit-score-export workflow passes the same tables
    # to both functions)
    own_persists = [
        m for m in models if m.storageLevel == StorageLevel.NONE
    ]
    for m in own_persists:
        m.persist(StorageLevel.MEMORY_AND_DISK)
    # same-fit contract (r15 advice): for every order k, each k-gram's
    # prefix AND suffix (k-1)-gram must be an observed (k-1)-gram —
    # the raw-count denominators join on prefixes and the lower-order
    # probability lookups join on suffixes, and an orphan would be
    # silently dropped by those inner joins (counts are taken
    # post-join, so nothing else would raise). The probes are the
    # function's designed raise: release our just-materialized caches
    # before raising (the kn_lm_score broadcast-cap convention).
    for k in range(2, K + 1):
        lower = models[k - 2].select(*[f"w{i}" for i in range(1, k)])
        for which, cols in (
            ("prefix", [f"w{i}" for i in range(1, k)]),
            ("suffix", [f"w{i}" for i in range(2, k + 1)]),
        ):
            orphan = (
                models[k - 1]
                .select(
                    *[
                        F.col(c).alias(f"w{i + 1}")
                        for i, c in enumerate(cols)
                    ]
                )
                .join(lower, [f"w{i}" for i in range(1, k)], "left_anti")
                .limit(1)
                .collect()
            )
            if orphan:
                for m in own_persists:
                    m.unpersist()
                raise ValueError(
                    f"kn_to_arpa: the order-{k} model carries the "
                    f"{which} (k-1)-gram {tuple(orphan[0])!r} absent "
                    f"from the order-{k - 1} model — the tables must "
                    "come from the same corpus fit"
                )

    # ---- layer statistics (the kn_ngram_score formulas over the
    # model support; parity with the scorer is pinned by test) ----
    cont = models[1].groupBy("w2").agg(
        F.count(F.lit(1)).alias("_n1w")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_cc = float(cont.agg(F.sum("_n1w")).first()[0] or 0)
    v_size = float(models[0].count())
    denom1 = n_cc + alpha * v_size
    if denom1 <= 0:
        raise ValueError("kn_to_arpa: empty model")
    floor1 = alpha / denom1

    # middle layers k = 2..K-1: continuation statistics from the
    # order-(k+1) table, keyed (v1..v_{k-1}, w), v1 the furthest
    nv, nvd, lam = {}, {}, {}
    for k in range(2, K):
        nvk = models[k].groupBy(
            *[f"w{i}" for i in range(2, k + 2)]
        ).agg(F.count(F.lit(1)).alias("_nvw"))
        for i in range(2, k + 1):
            nvk = nvk.withColumnRenamed(f"w{i}", f"v{i - 1}")
        nv[k] = nvk.withColumnRenamed(f"w{k + 1}", "w").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        ctx = [f"v{i}" for i in range(1, k)]
        nvd[k] = nv[k].groupBy(*ctx).agg(F.sum("_nvw").alias("_nvd"))
        fvk = nv[k].groupBy(*ctx).agg(F.count(F.lit(1)).alias("_fv"))
        lam[k] = nvd[k].join(fvk, ctx).select(
            *ctx, (F.lit(d) * F.col("_fv") / F.col("_nvd")).alias(f"_lam{k}")
        )

    # top layer: raw counts with order-(K-1) denominators
    topctx = [f"w{i}" for i in range(1, K)]
    c_low = models[K - 2].select(*topctx, F.col("cnt").alias("_clow"))
    fuv = models[K - 1].groupBy(*topctx).agg(
        F.count(F.lit(1)).alias("_fuv")
    )
    lam[K] = fuv.join(c_low, topctx).select(
        *[F.col(f"w{i}").alias(f"v{i}") for i in range(1, K)],
        (F.lit(d) * F.col("_fuv") / F.col("_clow")).alias(f"_lam{K}"),
    )

    # ---- 1-grams: whole vocabulary + <unk> ----
    p1_expr = (F.coalesce(F.col("_n1w"), F.lit(0.0)) + F.lit(alpha)) / F.lit(
        denom1
    )
    uni_grams = (
        models[0].select("w1")
        .join(cont.withColumnRenamed("w2", "w1"), "w1", "left")
        .join(lam[2].withColumnRenamed("v1", "w1"), "w1", "left")
        .select(
            "w1",
            F.log10(p1_expr).alias("log10p"),
            F.log10(F.col("_lam2")).alias("backoff"),  # NULL stays NULL
        )
        .unionByName(
            spark.createDataFrame(
                [("<unk>", math.log10(floor1), None)],
                "w1 string, log10p double, backoff double",
            )
        )
    )

    # ---- middle-order entry tables, bottom-up: support ∪ hosted
    # backoff contexts, with interpolated P_k; each persists (it
    # feeds BOTH its own gram output and the next layer's suffix
    # lookup — the r15 p2_tbl convention) ----
    p1_of_w = cont.select(
        F.col("w2").alias("w"),
        ((F.col("_n1w") + F.lit(alpha)) / F.lit(denom1)).alias("_plow"),
    )
    p_tbl = {}
    for k in range(2, K):
        ctx = [f"v{i}" for i in range(1, k)]
        if k < K - 1:
            hosts = nv[k + 1].select(
                *[F.col(f"v{i}") for i in range(1, k)],
                F.col(f"v{k}").alias("w"),
            )
        else:
            hosts = models[K - 1].select(
                *[F.col(f"w{i}").alias(f"v{i}") for i in range(1, k)],
                F.col(f"w{k}").alias("w"),
            )
        entries = nv[k].select(*ctx, "w").unionByName(hosts).distinct()
        e = (
            entries.join(nv[k], ctx + ["w"], "left")
            .join(nvd[k], ctx, "left")
            .join(lam[k].select(*ctx, f"_lam{k}"), ctx, "left")
        )
        if k == 2:
            e = e.join(p1_of_w, "w", "left")
            pk_low = F.coalesce(F.col("_plow"), F.lit(floor1))
        else:
            e = e.join(
                p_tbl[k - 1].select(
                    *[
                        F.col(f"v{i}").alias(f"v{i + 1}")
                        for i in range(1, k - 1)
                    ],
                    "w",
                    F.col("_p").alias("_plow"),
                ),
                [f"v{i}" for i in range(2, k)] + ["w"],
            )  # inner — every entry's suffix is listed (contract-probed)
            pk_low = F.col("_plow")
        p_tbl[k] = e.select(
            *ctx,
            "w",
            F.when(
                F.col(f"_lam{k}").isNotNull(),
                F.coalesce(
                    F.greatest(F.col("_nvw") - F.lit(d), F.lit(0.0))
                    / F.col("_nvd"),
                    F.lit(0.0),
                )
                + F.col(f"_lam{k}") * pk_low,
            )
            .otherwise(pk_low)
            .alias("_p"),
        ).persist(StorageLevel.MEMORY_AND_DISK)

    mid_grams = {}
    for k in range(2, K):
        ctx = [f"v{i}" for i in range(1, k)]
        bo2 = lam[k + 1].select(
            *[F.col(f"v{i}") for i in range(1, k)],
            F.col(f"v{k}").alias("w"),
            F.col(f"_lam{k + 1}").alias("_bo"),
        )
        mid_grams[k] = p_tbl[k].join(bo2, ctx + ["w"], "left").select(
            *[F.col(f"v{i}").alias(f"w{i}") for i in range(1, k)],
            F.col("w").alias(f"w{k}"),
            F.log10(F.col("_p")).alias("log10p"),
            F.log10(F.col("_bo")).alias("backoff"),
        )

    # ---- K-grams: seen top-order support with interpolated P_K ----
    lamK_w = lam[K].select(
        *[F.col(f"v{i}").alias(f"w{i}") for i in range(1, K)], f"_lam{K}"
    )
    e = models[K - 1].join(c_low, topctx).join(lamK_w, topctx)
    if K == 2:
        e = e.join(p1_of_w.withColumnRenamed("w", "w2"), "w2", "left")
        plow = F.coalesce(F.col("_plow"), F.lit(floor1))
    else:
        e = e.join(
            p_tbl[K - 1].select(
                *[
                    F.col(f"v{i}").alias(f"w{i + 1}")
                    for i in range(1, K - 1)
                ],
                F.col("w").alias(f"w{K}"),
                F.col("_p").alias("_plow"),
            ),
            [f"w{i}" for i in range(2, K + 1)],
        )  # inner — contract-probed
        plow = F.col("_plow")
    top_grams = e.select(
        *[f"w{i}" for i in range(1, K + 1)],
        F.log10(
            F.greatest(F.col("cnt") - F.lit(d), F.lit(0.0))
            / F.col("_clow")
            + F.col(f"_lam{K}") * plow
        ).alias("log10p"),
        F.lit(None).cast("double").alias("backoff"),
    )

    grams = {}
    counts = {}
    ordered = [(1, uni_grams)] + [(k, mid_grams[k]) for k in range(2, K)]
    ordered.append((K, top_grams))
    for k, df in ordered:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        counts[k] = df.count()  # the cache-populating action
        grams[k] = df
    # the gram tables are materialized above; the shared intermediates
    # only re-run if a gram cache is evicted, so release them now —
    # but ONLY the frames this function persisted: caller-persisted
    # model tables keep their caches (r16 review)
    for mid in [cont, *nv.values(), *p_tbl.values(), *own_persists]:
        mid.unpersist()
    return ArpaModel(grams, counts)


def kn_lm_oracle_sql(
    src: str,
    text_sql: str = "text",
    id_sql: str = "doc_id",
    discount: float = 0.75,
    alpha: float = 1.0,
) -> str:
    """DuckDB replica of trigram-KN fit∘score over the same corpus:
    identical tokens, counts, continuation statistics, discounting,
    and backoff — (doc_id, lm3_tokens, lm3_nll) unrounded. Training ==
    scoring corpus, so every position's token is in-vocabulary and
    every (u,v) context of positions ≥ 3 is an observed bigram (the
    Spark path's unseen-context/OOV branches are unit-test
    territory, the lm2 convention)."""
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_sql})), '\\s+'),"
        " t -> t <> '')"
    )
    dd = float(discount)
    return f"""
SELECT d.{id_sql} AS doc_id,
       coalesce(s.lm3_tokens, 0) AS lm3_tokens,
       coalesce(s.lm3_nll, 0.0) AS lm3_nll
FROM {src} d
LEFT JOIN (
  WITH tok AS (
    SELECT {id_sql} AS doc_id, {toks} AS tk FROM {src}
  ), pr AS (
    SELECT doc_id, i, tk[i + 1] AS w,
           CASE WHEN i > 0 THEN tk[i] END AS wp,
           CASE WHEN i > 1 THEN tk[i - 1] END AS wpp
    FROM tok, UNNEST(CASE WHEN len(tk) = 0 THEN []
                     ELSE generate_series(0, len(tk) - 1) END) AS u(i)
  ), uni AS (
    SELECT t, count(*) AS c
    FROM (SELECT unnest(tk) AS t FROM tok) GROUP BY t
  ), big AS (
    SELECT wp AS w1, w AS w2, count(*) AS c12
    FROM pr WHERE wp IS NOT NULL GROUP BY 1, 2
  ), tri AS (
    SELECT wpp AS w1, wp AS w2, w AS w3, count(*) AS c123
    FROM pr WHERE wpp IS NOT NULL GROUP BY 1, 2, 3
  ), cont AS (SELECT w2 AS w, count(*) AS n1w FROM big GROUP BY w2),
  tot AS (
    SELECT (SELECT sum(n1w)::DOUBLE FROM cont) AS ncc,
           (SELECT count(*)::DOUBLE FROM uni) AS v
  ), nvw AS (
    SELECT w2, w3, count(*) AS c FROM tri GROUP BY w2, w3
  ), nvd AS (SELECT w2, sum(c)::DOUBLE AS c FROM nvw GROUP BY w2),
  -- N1+(v·) = distinct w with N1+(·vw) > 0 (continuation support,
  -- NOT bigram fanout — the document-initial-bigram case; r13 advice)
  fv AS (SELECT w2 AS w1, count(*) AS c FROM nvw GROUP BY w2),
  fuv AS (SELECT w1, w2, count(*) AS c FROM tri GROUP BY w1, w2),
  terms AS (
    SELECT p.doc_id,
           CASE
             WHEN p.wp IS NULL THEN
               (coalesce(cont.n1w, 0) + {alpha!r}) / (tot.ncc + {alpha!r} * tot.v)
             WHEN p.wpp IS NULL THEN
               CASE WHEN nvd.c IS NOT NULL THEN
                 coalesce(greatest(nvw.c - {dd!r}, 0.0) / nvd.c, 0.0)
                 + {dd!r} * fv.c / nvd.c
                   * (coalesce(cont.n1w, 0) + {alpha!r}) / (tot.ncc + {alpha!r} * tot.v)
               ELSE
                 (coalesce(cont.n1w, 0) + {alpha!r}) / (tot.ncc + {alpha!r} * tot.v)
               END
             ELSE
               coalesce(greatest(tri.c123 - {dd!r}, 0.0) / big2.c12, 0.0)
               + {dd!r} * fuv.c / big2.c12
                 * (CASE WHEN nvd.c IS NOT NULL THEN
                      coalesce(greatest(nvw.c - {dd!r}, 0.0) / nvd.c, 0.0)
                      + {dd!r} * fv.c / nvd.c
                        * (coalesce(cont.n1w, 0) + {alpha!r})
                          / (tot.ncc + {alpha!r} * tot.v)
                    ELSE
                      (coalesce(cont.n1w, 0) + {alpha!r}) / (tot.ncc + {alpha!r} * tot.v)
                    END)
           END AS prob
    FROM pr p
    CROSS JOIN tot
    LEFT JOIN cont ON cont.w = p.w
    LEFT JOIN nvw ON nvw.w2 = p.wp AND nvw.w3 = p.w
    LEFT JOIN nvd ON nvd.w2 = p.wp
    LEFT JOIN fv ON fv.w1 = p.wp
    LEFT JOIN tri ON tri.w1 = p.wpp AND tri.w2 = p.wp AND tri.w3 = p.w
    LEFT JOIN big big2 ON big2.w1 = p.wpp AND big2.w2 = p.wp
    LEFT JOIN fuv ON fuv.w1 = p.wpp AND fuv.w2 = p.wp
  )
  SELECT doc_id, count(*) AS lm3_tokens,
         -sum(ln(prob)) / count(*) AS lm3_nll
  FROM terms GROUP BY doc_id
) s ON s.doc_id = d.{id_sql}
"""


def kn_ngram_oracle_sql(
    src: str,
    text_sql: str = "text",
    id_sql: str = "doc_id",
    order: int = 5,
    discount: float = 0.75,
    alpha: float = 1.0,
) -> str:
    """DuckDB replica of order-K KN fit∘score over the same corpus —
    :func:`kn_lm_oracle_sql` generalized to any order 2..5, mirroring
    :func:`kn_ngram_score` layer by layer: identical tokens, counts,
    continuation statistics at every middle layer, discounting, and
    backoff — (doc_id, kn_tokens, kn_nll) unrounded. Training ==
    scoring corpus, so every position's top-layer context is an
    observed (K−1)-gram and its own n-gram statistics exist (the
    order-3 oracle's argument at every order); the middle layers keep
    their NULL-context wholesale-backoff guards (the document-initial
    case occurs at ANY order). The Spark path's OOV branches stay
    unit-test territory (the lm2/lm3 convention)."""
    K = int(order)
    if not 2 <= K <= _ARPA_MAX_ORDER:
        raise ValueError(
            f"kn_ngram_oracle_sql: order must be 2..{_ARPA_MAX_ORDER}"
        )
    dd = float(discount)
    al = float(alpha)
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_sql})), '\\s+'),"
        " t -> t <> '')"
    )
    ctx_cols = "".join(
        f",\n           CASE WHEN i > {j - 1} THEN tk[i + 1 - {j}] END AS c{j}"
        for j in range(1, K)
    )
    # raw n-gram counts gk keyed (v1..v_{k-1}, w), v1 the furthest
    g_ctes = []
    for k in range(2, K + 1):
        cols = ", ".join(
            f"c{k - i} AS v{i}" for i in range(1, k)
        )
        g_ctes.append(
            f"g{k} AS (\n    SELECT {cols}, w, count(*) AS c\n"
            f"    FROM pr WHERE c{k - 1} IS NOT NULL GROUP BY ALL\n  )"
        )
    # middle-layer continuation statistics from g_{k+1}
    mid_ctes = []
    for k in range(2, K):
        keep = ", ".join(f"v{i + 1} AS v{i}" for i in range(1, k))
        ctx = ", ".join(f"v{i}" for i in range(1, k))
        mid_ctes.append(
            f"nv{k} AS (\n    SELECT {keep}, w, count(*) AS c\n"
            f"    FROM g{k + 1} GROUP BY ALL\n  )"
        )
        mid_ctes.append(
            f"nvd{k} AS (SELECT {ctx}, sum(c)::DOUBLE AS c"
            f" FROM nv{k} GROUP BY ALL)"
        )
        mid_ctes.append(
            f"fv{k} AS (SELECT {ctx}, count(*) AS c FROM nv{k} GROUP BY ALL)"
        )
    top_fuv = (
        "fuv AS (SELECT "
        + ", ".join(f"v{i}" for i in range(1, K))
        + f", count(*) AS c FROM g{K} GROUP BY ALL)"
    )
    # per-position joins
    joins = ["LEFT JOIN cont ON cont.w = p.w"]
    for k in range(2, K):
        on_full = " AND ".join(
            [f"nv{k}.v{i} = p.c{k - i}" for i in range(1, k)]
            + [f"nv{k}.w = p.w"]
        )
        joins.append(f"LEFT JOIN nv{k} ON {on_full}")
        joins.append(
            f"LEFT JOIN nvd{k} ON "
            + " AND ".join(f"nvd{k}.v{i} = p.c{k - i}" for i in range(1, k))
        )
        joins.append(
            f"LEFT JOIN fv{k} ON "
            + " AND ".join(f"fv{k}.v{i} = p.c{k - i}" for i in range(1, k))
        )
    joins.append(
        f"LEFT JOIN g{K} tt ON "
        + " AND ".join(
            [f"tt.v{i} = p.c{K - i}" for i in range(1, K)] + ["tt.w = p.w"]
        )
    )
    if K == 2:
        joins.append("LEFT JOIN uni dd ON dd.t = p.c1")
    else:
        joins.append(
            f"LEFT JOIN g{K - 1} dd ON "
            + " AND ".join(
                [f"dd.v{i} = p.c{K - i}" for i in range(1, K - 1)]
                + ["dd.w = p.c1"]
            )
        )
    joins.append(
        "LEFT JOIN fuv ON "
        + " AND ".join(f"fuv.v{i} = p.c{K - i}" for i in range(1, K))
    )
    # nested probability chain
    p_expr = [
        f"(coalesce(cont.n1w, 0) + {al!r}) / (tot.ncc + {al!r} * tot.v)"
    ]
    for k in range(2, K):
        prev = p_expr[-1]
        p_expr.append(
            f"CASE WHEN nvd{k}.c IS NOT NULL THEN"
            f" coalesce(greatest(nv{k}.c - {dd!r}, 0.0) / nvd{k}.c, 0.0)"
            f" + {dd!r} * fv{k}.c / nvd{k}.c * ({prev})"
            f" ELSE ({prev}) END"
        )
    p_expr.append(
        f"coalesce(greatest(tt.c - {dd!r}, 0.0) / dd.c, 0.0)"
        f" + {dd!r} * fuv.c / dd.c * ({p_expr[-1]})"
    )
    branches = "".join(
        f"\n             WHEN p.c{j} IS NULL THEN ({p_expr[j - 1]})"
        for j in range(1, K)
    )
    prob = f"CASE{branches}\n             ELSE ({p_expr[K - 1]}) END"
    all_ctes = ",\n  ".join(g_ctes + mid_ctes + [top_fuv])
    join_sql = "\n    ".join(joins)
    return f"""
SELECT d.{id_sql} AS doc_id,
       coalesce(s.kn_tokens, 0) AS kn_tokens,
       coalesce(s.kn_nll, 0.0) AS kn_nll
FROM {src} d
LEFT JOIN (
  WITH tok AS (
    SELECT {id_sql} AS doc_id, {toks} AS tk FROM {src}
  ), pr AS (
    SELECT doc_id, i, tk[i + 1] AS w{ctx_cols}
    FROM tok, UNNEST(CASE WHEN len(tk) = 0 THEN []
                     ELSE generate_series(0, len(tk) - 1) END) AS u(i)
  ), uni AS (
    SELECT t, count(*) AS c
    FROM (SELECT unnest(tk) AS t FROM tok) GROUP BY t
  ), {all_ctes},
  cont AS (SELECT w, count(*) AS n1w FROM g2 GROUP BY w),
  tot AS (
    SELECT (SELECT sum(n1w)::DOUBLE FROM cont) AS ncc,
           (SELECT count(*)::DOUBLE FROM uni) AS v
  ), terms AS (
    SELECT p.doc_id,
           {prob} AS prob
    FROM pr p
    CROSS JOIN tot
    {join_sql}
  )
  SELECT doc_id, count(*) AS kn_tokens,
         -sum(ln(prob)) / count(*) AS kn_nll
  FROM terms GROUP BY doc_id
) s ON s.doc_id = d.{id_sql}
"""


def perplexity_partition(
    scored: DataFrame,
    nll_col: str = "lm_nll",
    buckets: int = 3,
    by: str | None = None,
    out_col: str = "ppl_bucket",
    round_dp: int = 6,
    cuts_method: str = "exact",
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style perplexity partitioning (Wenzek et al. 2020): split
    documents into ``buckets`` tiers by LM score — bucket 1 = lowest
    NLL (most in-distribution, the "head"), rising from there —
    optionally per group (``by``; CCNet partitions per language, which
    is also what keeps the quantiles comparable across differently-
    distributed groups).

    Scale shape: exact quantile CUT POINTS via one aggregate
    (``percentile``) broadcast-joined back, then a pure-Column bucket
    comparison — NOT a global ``ntile`` window, whose single-task sort
    is exactly the shape that dies at 100 TB. Value-based semantics
    fall out: equal scores land in the same bucket regardless of
    partitioning (ntile would split ties arbitrarily), at the price of
    only-approximately-equal bucket sizes on tied data.

    Both sides of the comparison are rounded to ``round_dp`` so the
    DuckDB replay (``quantile_cont`` — the same linear interpolation
    as Spark's ``percentile``) buckets boundary documents
    identically.

    ``cuts_method`` — the dual-path convention (encode_ids,
    _with_domain_key): ``'exact'`` (default, what the oracle replays)
    derives cut points with ``percentile``, whose aggregation buffer
    is a value→count map — bounded here by the ``round_dp`` rounding
    (≤ range/10^-round_dp distinct entries), but RANGE-dependent: a
    100 TB corpus with heavy-tailed NLL makes that a per-group memory
    liability. ``'approx'`` uses ``approx_percentile`` (Greenwald-
    Khanna, buffer bounded by ``approx_accuracy`` regardless of value
    range; rank error ≤ n/accuracy). Same downstream bucket rule; the
    two paths disagree only on documents whose score falls between an
    exact and an approx cut point (parity-tested with that bound)."""
    if buckets < 2:
        raise ValueError("perplexity_partition: need >= 2 buckets")
    if cuts_method not in ("exact", "approx"):
        raise ValueError(
            f"perplexity_partition: unknown cuts_method {cuts_method!r}"
        )
    fr = [i / buckets for i in range(1, buckets)]
    v = F.round(F.col(nll_col), round_dp)
    if cuts_method == "approx":
        cuts = F.approx_percentile(
            v,
            F.array(*[F.lit(c) for c in fr]),
            F.lit(int(approx_accuracy)),
        ).alias("_cuts")
    else:
        cuts = F.percentile(v, F.array(*[F.lit(c) for c in fr])).alias("_cuts")
    if by is None:
        joined = scored.crossJoin(F.broadcast(scored.agg(cuts)))
    else:
        # null-safe key: the null group's cuts row exists (groupBy
        # emits it), but a plain equi-join would silently DROP every
        # null-group document — the exact skew hazard domain_stats
        # documents (r12 review)
        cut_rows = (
            scored.groupBy(by)
            .agg(cuts)
            .withColumnRenamed(by, "_ppl_grp")
        )
        joined = scored.join(
            F.broadcast(cut_rows),
            F.col(by).eqNullSafe(F.col("_ppl_grp")),
        ).drop("_ppl_grp")
    bucket = F.lit(1) + F.aggregate(
        F.transform(
            F.col("_cuts"),
            lambda c: (v > F.round(c, round_dp)).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return joined.withColumn(out_col, bucket).drop("_cuts")


def perplexity_partition_oracle_sql(
    lm_src: str,
    group_src: str,
    by: str = "lang",
    buckets: int = 3,
    round_dp: int = 6,
) -> str:
    """DuckDB replay of :func:`perplexity_partition` over a scored
    relation ``lm_src`` (doc_id, lm_nll), grouped by ``by`` from
    ``group_src`` — same rounding, same cut-point quantiles, same
    strict-greater bucket rule."""
    fr = [i / buckets for i in range(1, buckets)]
    cut_cols = ", ".join(
        f"round(quantile_cont(v, {c!r}), {round_dp}) AS c{i}"
        for i, c in enumerate(fr)
    )
    add = " + ".join(f"(lmr.v > cuts.c{i})::INT" for i in range(len(fr)))
    return f"""
WITH lmr AS (
  SELECT lm.doc_id, g.{by} AS grp, round(lm.lm_nll, {round_dp}) AS v
  FROM ({lm_src}) lm JOIN {group_src} g ON g.doc_id = lm.doc_id
), cuts AS (
  SELECT grp, {cut_cols} FROM lmr GROUP BY grp
)
SELECT lmr.doc_id, 1 + {add} AS ppl_bucket
FROM lmr JOIN cuts ON lmr.grp IS NOT DISTINCT FROM cuts.grp
"""


class ArpaModel:
    """A backoff LM imported from the published ARPA text format (the
    artifact KenLM/SRILM/IRSTLM ship — Stolcke 2002; the format every
    published CCNet-style reference LM is distributed as): per-order
    relation tables (w1..wk, log10p, backoff), plus the declared
    header counts. The tokenizer_io discipline applied to the LM
    family: users score against a REAL published model's numbers
    verbatim instead of a subsample refit.

    ``grams[k]`` is a DataFrame with columns w1..wk (strings), log10p
    (double), backoff (double, NULL where the file omits it — ARPA
    semantics: absent backoff weight = 0.0, applied at score time).
    Bounded driver state: the declared counts only; the tables stay
    distributed relations end to end.

    ``local_rows`` (optional): the SAME rows as plain Python tuples
    ``(w1..wk, log10p[, backoff])`` per order, for models whose rows
    already live on the driver (hand-built fixtures, tests). Purely
    an execution shortcut: the literal-map scoring path and the
    ``<unk>`` probe read them instead of paying per-call collect job
    constants (~1.4 s measured on a 31-row model — r16); semantics
    are identical, and None (the load_arpa default) keeps every
    consumer on the relation path."""

    def __init__(self, grams: dict, counts: dict, local_rows: dict | None = None):
        self.grams = dict(grams)
        self.counts = dict(counts)
        self.local_rows = dict(local_rows) if local_rows is not None else None

    @property
    def order(self) -> int:
        return max(self.counts)

    def truncate(self, k: int) -> "ArpaModel":
        """Orders 1..k of this model — the standard way to score a
        higher-order artifact with a lower-order backoff recursion:
        drop the tables above k and recurse as usual (the new top
        order's ``backoff`` column is simply never consulted; lower
        orders' backoff weights still apply on their hops). The
        relation DataFrames are SHARED with the parent, not copied —
        they are immutable lazy plans. Raises if no populated order
        survives the cut."""
        k = int(k)
        if k < 1:
            raise ValueError("ArpaModel.truncate: k must be >= 1")
        grams = {o: df for o, df in self.grams.items() if o <= k}
        counts = {o: n for o, n in self.counts.items() if o <= k}
        if not grams:
            raise ValueError(
                f"ArpaModel.truncate({k}): no populated order survives "
                f"(model carries orders {sorted(self.grams)})"
            )
        lr = (
            {o: rows for o, rows in self.local_rows.items() if o <= k}
            if self.local_rows is not None
            else None
        )
        return ArpaModel(grams, counts, lr)


def load_arpa(spark, path: str, lowercase: bool = False) -> ArpaModel:
    """Parse an ARPA file into relation tables — fully distributed
    (``spark.read.text`` + projections; no driver-side line loop, so
    a multi-GB published model loads like any other table).

    The parse keys on the format's line grammar rather than section
    tracking: every n-gram line is ``log10p<TAB>w1 .. wk[<TAB>backoff]``
    and its ORDER is the word count of the middle field — so section
    markers, the ``\\data\\`` header, and blank lines are filtered
    out structurally and the declared ``ngram k=N`` counts then
    VALIDATE the parse (a count mismatch, an undeclared order, or an
    unparseable probability or backoff field raises — a silently
    short table, or a corrupted backoff column scoring as 0.0, would
    misscore every document). An EMPTY third field (a bare trailing
    tab) still reads as an omitted backoff.

    ``lowercase``: fold vocabulary case at load (match it to the
    scorer's tokenization; published models are usually already
    lowercased). A fold that MERGES case-distinct n-grams into one
    key raises — the scorer's model joins would fan out on the
    duplicate keys and silently inflate every token count (r14
    review); load such a model with ``lowercase=False`` and lowercase
    the corpus side instead, or pick one casing upstream.

    Declared-but-empty orders (``ngram k=0`` — legal in heavily
    pruned SRILM output) validate fine and get no relation;
    :attr:`ArpaModel.order` counts populated orders only."""
    lines = spark.read.text(path)
    declared = {
        int(r["k"]): int(r["n"])
        for r in lines.select(
            F.regexp_extract("value", r"^ngram (\d+)=(\d+)\s*$", 1).alias("k"),
            F.regexp_extract("value", r"^ngram (\d+)=(\d+)\s*$", 2).alias("n"),
        )
        .filter(F.col("k") != "")
        .collect()
    }
    if not declared:
        raise ValueError(
            f"load_arpa: {path!r} has no 'ngram k=N' header — not an "
            "ARPA file (or a truncated one)"
        )
    parts = F.split(F.col("value"), "\t")
    cand = lines.filter(F.size(parts) >= 2).select(
        F.element_at(parts, 1).cast("double").alias("log10p"),
        F.split(F.trim(F.element_at(parts, 2)), " ").alias("ws"),
        F.when(F.size(parts) >= 3, F.element_at(parts, 3).cast("double"))
        .alias("backoff"),
        F.element_at(parts, 1).alias("_raw_p"),
        F.when(F.size(parts) >= 3, F.element_at(parts, 3)).alias("_raw_b"),
    )
    from pyspark.storagelevel import StorageLevel

    # persisted BEFORE the first validation action, so the bad-line
    # probe is the cache-populating pass instead of an extra full
    # parse of a potentially multi-GB file (r14 review)
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        bad = cand.filter(F.col("log10p").isNull()).limit(1).collect()
        if bad:
            raise ValueError(
                f"load_arpa: unparseable probability field"
                f" {bad[0]['_raw_p']!r}"
            )
        # same loud posture for the backoff field (r14 advice): a
        # present, non-empty third field that fails the double cast
        # would otherwise silently become NULL and score as backoff
        # 0.0 — a corrupted column misweighting every backoff hop
        badb = cand.filter(
            F.col("backoff").isNull()
            & F.col("_raw_b").isNotNull()
            & (F.trim(F.col("_raw_b")) != "")
        ).limit(1).collect()
        if badb:
            raise ValueError(
                f"load_arpa: unparseable backoff field"
                f" {badb[0]['_raw_b']!r}"
            )
        found = {
            int(r["k"]): int(r["n"])
            for r in cand.groupBy(F.size("ws").alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        nonzero_declared = {k: n for k, n in declared.items() if n > 0}
        if not nonzero_declared:
            # every declared order empty: a later model.order would
            # die with a bare max()-of-empty instead of a load-time
            # diagnostic (r14 second review)
            raise ValueError(
                f"load_arpa: header {declared} declares no populated "
                "order — an empty model cannot score anything"
            )
        if found != nonzero_declared:
            raise ValueError(
                f"load_arpa: header declares {declared} but the file "
                f"carries {found} n-gram lines"
            )
        grams = {}
        for k in sorted(nonzero_declared):
            w = F.col("ws")
            word = (lambda c: F.lower(c)) if lowercase else (lambda c: c)
            grams[k] = (
                cand.filter(F.size("ws") == k)
                .select(
                    *[
                        word(F.element_at(w, i + 1)).alias(f"w{i + 1}")
                        for i in range(k)
                    ],
                    F.col("log10p"),
                    F.col("backoff"),
                )
                # materialized: the parse scans the text file once per
                # order otherwise, and validation already paid the pass
                .localCheckpoint(eager=True)
            )
            # duplicate relation keys fan out EVERY scorer join and
            # silently inflate token counts — probe on every load, not
            # just under case folding (r15 review: a count-consistent
            # file with literal duplicate lines passed before)
            keys = [f"w{i + 1}" for i in range(k)]
            dup = (
                grams[k].groupBy(*keys).count()
                .filter(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                merged = tuple(dup[0][c] for c in keys)
                if lowercase:
                    raise ValueError(
                        "load_arpa: lowercase=True folded case-distinct "
                        f"{k}-grams into one key {merged!r} — the model "
                        "joins would fan out; load with lowercase=False"
                    )
                raise ValueError(
                    f"load_arpa: the file lists the {k}-gram "
                    f"{merged!r} more than once — the model joins "
                    "would fan out and inflate every score"
                )
    finally:
        cand.unpersist()
    return ArpaModel(grams, nonzero_declared)


_LN10 = math.log(10.0)


_ARPA_MAX_ORDER = 5


def _arpa_unk_row(model: ArpaModel):
    """(has_unk, log10p, backoff-or-0.0) of the model's ``<unk>``
    unigram — one bounded collect shared by scorer and validation.
    Tolerates a backoff-less order-1 table (legal for a pure unigram
    model, where the validator exempts the top order)."""
    g1 = model.grams[1]
    if model.local_rows is not None and 1 in model.local_rows:
        # driver-side rows: same answer, no job (the local_rows
        # contract — rows identical to grams[1])
        for r in model.local_rows[1]:
            if r[0] == "<unk>":
                b = r[2] if len(r) > 2 else None
                return True, float(r[1]), (0.0 if b is None else float(b))
        return False, None, 0.0
    bo = (
        F.col("backoff")
        if "backoff" in g1.columns
        else F.lit(None).cast("double").alias("backoff")
    )
    unk = (
        g1.filter(F.col("w1") == "<unk>")
        .select(F.col("log10p"), bo)
        .collect()
    )
    if not unk:
        return False, None, 0.0
    b = unk[0]["backoff"]
    return True, float(unk[0]["log10p"]), (0.0 if b is None else float(b))


def _validate_arpa_scoring_model(model: ArpaModel) -> int:
    """Loud entry-time checks shared by the scorer: order cap,
    contiguous populated orders 1..K (the backoff recursion consults
    every lower table), and each relation carrying its w1..wk key
    columns — plus ``backoff`` on orders 1..K−1, whose weights the
    recursion unconditionally selects (r15 advice: a hand-assembled
    model lacking the column failed with a raw AnalysisException
    instead of this diagnostic; the TOP order's backoff is never
    consulted, so it stays exempt). Returns K."""
    K = model.order
    if K > _ARPA_MAX_ORDER:
        raise ValueError(
            f"arpa_lm_score: order-{K} model exceeds the supported "
            f"order {_ARPA_MAX_ORDER} — score model.truncate("
            f"{_ARPA_MAX_ORDER}) (lower tables and their backoff "
            "weights are unchanged by truncation)"
        )
    missing = [k for k in range(1, K + 1) if k not in model.grams]
    if missing:
        raise ValueError(
            f"arpa_lm_score: model declares order {K} but orders "
            f"{missing} carry no table — the backoff recursion needs "
            f"every lower order; score model.truncate({min(missing) - 1})"
        )
    for k in range(1, K + 1):
        want = {f"w{i}" for i in range(1, k + 1)} | {"log10p"}
        if k < K:
            want |= {"backoff"}
        have = set(model.grams[k].columns)
        if not want <= have:
            raise ValueError(
                f"arpa_lm_score: order-{k} table is missing columns "
                f"{sorted(want - have)} (has {sorted(have)})"
            )
    return K


#: row budget for the literal-map scoring path: a model at most this
#: many TOTAL rows (all orders) ships as create_map literals inside
#: one codegen projection — zero joins, zero broadcast stages. The
#: r16 profile measured ~0.3 s of per-join stage overhead × 12 joins
#: on a 31-row gate model (the joins' probe work is trivial; the
#: broadcast-stage machinery is not). Sized like the quality
#: classifier's _EXPR_DIM_LIMIT: well under codegen method limits.
_ARPA_EXPR_ROW_CAP = 2048


def _arpa_expr_maps(model: ArpaModel, K: int):
    """Collect a small model's tables into Python dicts for the
    literal-map scoring path: (m1, mb1, mp, mbo) where m1/mb1 key on
    the unigram word and mp[k]/mbo[k] key on the space-joined n-gram
    (tokens come from a whitespace split, so ' ' cannot occur inside
    a token — the key is collision-free). Backoffs are coalesced to
    0.0 at build time (the format's absent-weight semantics, exactly
    what the join path's coalesce applies). Returns None when the
    ACTUAL rows exceed :data:`_ARPA_EXPR_ROW_CAP` (callers fall back
    to the join path); raises on duplicate n-gram keys (an invalid
    model — load_arpa rejects them at load, so only hand-assembled
    models can get here, and the join path would silently duplicate
    scored positions for them)."""
    # tables[k]: list of (words_tuple, log10p, backoff_or_None)
    tables: dict[int, list] = {k: [] for k in range(1, K + 1)}
    if model.local_rows is not None and all(
        k in model.local_rows for k in range(1, K + 1)
    ):
        # driver-side rows (the local_rows contract): no job at all
        total = sum(len(model.local_rows[k]) for k in range(1, K + 1))
        if total > _ARPA_EXPR_ROW_CAP:
            return None
        for k in range(1, K + 1):
            for r in model.local_rows[k]:
                words = tuple(r[:k])
                bo = r[k + 1] if len(r) > k + 1 else None
                tables[k].append((words, float(r[k]), bo))
    else:
        # ONE padded union + limit + collect for every order:
        # per-table collects each pay a fixed local-execution
        # constant (~0.3-1 s measured), which at K=5 would eat most
        # of the path's win
        from functools import reduce

        parts = []
        for k in range(1, K + 1):
            g = model.grams[k]
            sel = [F.lit(k).alias("_k")]
            for i in range(1, K + 1):
                sel.append(
                    (
                        F.col(f"w{i}")
                        if i <= k
                        else F.lit(None).cast("string")
                    ).alias(f"w{i}")
                )
            sel.append(F.col("log10p").cast("double").alias("log10p"))
            sel.append(
                (
                    F.col("backoff")
                    if "backoff" in g.columns
                    else F.lit(None)
                )
                .cast("double")
                .alias("backoff")
            )
            parts.append(g.select(*sel))
        combined = reduce(lambda a, b: a.unionByName(b), parts)
        rows = combined.limit(_ARPA_EXPR_ROW_CAP + 1).collect()
        if len(rows) > _ARPA_EXPR_ROW_CAP:
            return None
        for r in rows:
            k = int(r["_k"])
            tables[k].append(
                (
                    tuple(r[f"w{i}"] for i in range(1, k + 1)),
                    float(r["log10p"]),
                    r["backoff"],
                )
            )
    m1: dict[str, float] = {}
    mb1: dict[str, float] = {}
    for words, lp, b in tables[1]:
        w = words[0]
        if w in m1:
            raise ValueError(
                f"arpa_lm_score: duplicate unigram {w!r} in the model"
            )
        m1[w] = lp
        mb1[w] = 0.0 if b is None else float(b)
    mp: dict[int, dict[str, float]] = {}
    mbo: dict[int, dict[str, float]] = {}
    for k in range(2, K + 1):
        mpk: dict[str, float] = {}
        mbok: dict[str, float] = {}
        for words, lp, b in tables[k]:
            key = " ".join(words)
            if key in mpk:
                raise ValueError(
                    f"arpa_lm_score: duplicate {k}-gram {key!r} in the "
                    "model"
                )
            mpk[key] = lp
            if k < K:
                mbok[key] = 0.0 if b is None else float(b)
        mp[k] = mpk
        mbo[k] = mbok
    return m1, mb1, mp, mbo


def _lit_map(d: dict[str, float]):
    """A map<string,double> literal Column (null literal when empty,
    so element_at stays well-typed and returns null for every key)."""
    if not d:
        return F.lit(None).cast("map<string,double>")
    args = []
    for k, v in d.items():
        args.append(F.lit(k))
        args.append(F.lit(float(v)))
    return F.create_map(*args)


def arpa_lm_score(
    docs: DataFrame,
    model: ArpaModel,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    oov_log10p: float | None = None,
    lowercase: bool = True,
    broadcast_model: bool = True,
    as_expression: bool | None = None,
) -> DataFrame:
    """Per-document mean NLL (nats) under an imported ARPA backoff
    model — (id..., arpa_tokens, arpa_nll): the standard recursive
    backoff P(w|ctx_k) = p(ctx_k·w) if listed, else
    10^b(ctx_k)·P(w|ctx_{k-1}), with absent backoff weights meaning
    b=0 (multiplier 1) per the format spec; all arithmetic stays in
    log10 and converts once at the end (· ln 10), so no underflow at
    any order. Supports orders 1–5 (published KenLM/CCNet artifacts
    are 5-gram); a deeper file scores its ``model.truncate(5)``.
    Position i uses order min(model order, i+1) — early positions
    score the lower orders directly (the kn_lm_score no-padding
    convention: a published model's <s> entries are simply never
    looked up; documented deviation from KenLM's sentence-marker
    scoring).

    OOV handling (r14 advice): when the model ships ``<unk>`` (real
    published LMs do), every OOV token — in TARGET and CONTEXT
    positions alike — is mapped to the literal ``<unk>`` before the
    model joins, exactly as KenLM substitutes: ``<unk>``-containing
    n-grams and the file's b(<unk>) are consulted wherever listed.
    Without ``<unk>``, ``oov_log10p`` floors the target word and OOV
    context words simply never match (backoff 0 hops); neither
    available raises at entry — a silent OOV floor convention would
    make scores non-comparable across models.

    Plan: pos explode + ≤(3K−2) slim model-relation left joins
    (target logp, per-context-position vocabulary membership, and
    logp/backoff per order), broadcast by default;
    ``broadcast_model=False`` leaves them shuffled for models past
    broadcast size (the kn_lm_score posture)."""
    if model.grams.get(1) is None:
        raise ValueError("arpa_lm_score: model has no unigrams")
    K = _validate_arpa_scoring_model(model)
    id_cols = id_cols or ["doc_id"]
    hint = F.broadcast if broadcast_model else (lambda df: df)
    uni = model.grams[1]
    has_unk, unk_p, b_unk = _arpa_unk_row(model)
    floor10 = unk_p if has_unk else oov_log10p
    if floor10 is None:
        raise ValueError(
            "arpa_lm_score: model ships no <unk> and no oov_log10p "
            "given — OOV tokens would have no probability"
        )
    floor10 = float(floor10)

    # position frame: the target word w plus raw context columns
    # _c1.._c{K-1} (_cj = j tokens back; null before position j)
    tk = _tokens(text_col, lowercase)
    fields = ["w as w"] + [
        f"if(i > {j - 1}, element_at(_tk, i - {j - 1}), null) as c{j}"
        for j in range(1, K)
    ]
    ent = F.expr("transform(_tk, (w, i) -> struct(" + ", ".join(fields) + "))")
    joined = (
        docs.select(*id_cols, tk.alias("_tk"))
        .select(*id_cols, F.explode(ent).alias("_e"))
        .select(
            *id_cols,
            F.col("_e.w").alias("_w"),
            *[F.col(f"_e.c{j}").alias(f"_c{j}") for j in range(1, K)],
        )
    )
    # small models score through ONE codegen projection over literal
    # lookup maps — zero joins, zero broadcast stages (r16
    # optimization: the profile measured ~0.3 s of per-broadcast-stage
    # overhead × 12 joins on the 31-row gate model; guide §1.2 —
    # per-task work after the job shape. as_expression=None picks the
    # path from the declared header counts, verified against the
    # ACTUAL rows at collect time with a join-path fallback; the
    # probability chain below is the SAME arithmetic either way, so
    # the scores are bit-identical (parity-pinned in tests).
    maps = None
    if as_expression is None:
        declared = sum(int(model.counts.get(k, 0)) for k in range(1, K + 1))
        if declared <= _ARPA_EXPR_ROW_CAP:
            maps = _arpa_expr_maps(model, K)
    elif as_expression:
        maps = _arpa_expr_maps(model, K)
        if maps is None:
            raise ValueError(
                f"arpa_lm_score: model exceeds {_ARPA_EXPR_ROW_CAP:,} "
                "rows — the literal-map path would inline it into the "
                "plan; pass as_expression=False (join path, identical "
                "scores) for models this size"
            )

    if maps is not None:
        m1, mb1, mp, mbo = maps
        m1c = _lit_map(m1)
        joined = joined.withColumn("_up", F.element_at(m1c, F.col("_w")))
        # effective words: OOV → '<unk>' when the model ships it
        # (KenLM's substitution), else the raw word (matches nothing)
        if has_unk:
            joined = joined.withColumn(
                "_we",
                F.when(F.col("_up").isNotNull(), F.col("_w")).otherwise(
                    F.lit("<unk>")
                ),
            )
            for j in range(1, K):
                joined = joined.withColumn(
                    f"_e{j}",
                    F.when(
                        F.col(f"_c{j}").isNull(),
                        F.lit(None).cast("string"),
                    )
                    .when(
                        F.element_at(m1c, F.col(f"_c{j}")).isNotNull(),
                        F.col(f"_c{j}"),
                    )
                    .otherwise(F.lit("<unk>")),
                )
        else:
            joined = joined.withColumn("_we", F.col("_w"))
            for j in range(1, K):
                joined = joined.withColumn(f"_e{j}", F.col(f"_c{j}"))
        ps = [F.coalesce(F.col("_up"), F.lit(floor10))]
        if K >= 2:
            b1 = F.when(
                F.element_at(m1c, F.col("_c1")).isNotNull(),
                F.coalesce(
                    F.element_at(_lit_map(mb1), F.col("_c1")), F.lit(0.0)
                ),
            ).otherwise(F.lit(b_unk if has_unk else 0.0))

        def _gram_key(parts):
            # tokens come from a whitespace split, so ' ' cannot occur
            # inside one — the joined key is collision-free; F.concat
            # (NOT concat_ws) propagates nulls, so a missing context
            # word nulls the key and the lookup, exactly the join
            # path's no-match
            args = []
            for c in parts[:-1]:
                args.extend([c, F.lit(" ")])
            args.append(parts[-1])
            return F.concat(*args)

        for k in range(2, K + 1):
            ctx = [F.col(f"_e{k - i}") for i in range(1, k)]
            pk = F.element_at(_lit_map(mp[k]), _gram_key(ctx + [F.col("_we")]))
            if k == 2:
                bk = b1
            else:
                bk = F.coalesce(
                    F.element_at(_lit_map(mbo[k - 1]), _gram_key(ctx)),
                    F.lit(0.0),
                )
            ps.append(F.coalesce(pk, bk + ps[-1]))
    else:
        # target word's unigram row, then one slim vocabulary probe per
        # context position the plan actually consumes: position 1's
        # probe doubles as b(v); positions ≥2 are only needed for the
        # <unk> mapping, so a <unk>-less model skips them (r15 review —
        # the has_unk=False branch never reads their columns, but Spark
        # can't prune a left join whose right side isn't provably
        # unique)
        joined = joined.join(
            hint(
                uni.select(
                    F.col("w1").alias("_uw"), F.col("log10p").alias("_up")
                )
            ),
            joined["_w"] == F.col("_uw"),
            "left",
        ).drop("_uw")
        probe_js = range(1, K) if has_unk else range(1, min(K, 2))
        for j in probe_js:
            # only position 1's probe carries the backoff column (it
            # doubles as b(v)); j >= 2 exists solely for the <unk>
            # membership mapping, so shipping backoff there would
            # inflate each broadcast relation by a dead double per
            # vocab row
            cols = [
                F.col("w1").alias(f"_v{j}w"),
                F.lit(True).alias(f"_v{j}m"),
            ]
            if j == 1:
                cols.append(F.col("backoff").alias("_v1b"))
            joined = joined.join(
                hint(uni.select(*cols)),
                joined[f"_c{j}"] == F.col(f"_v{j}w"),
                "left",
            ).drop(f"_v{j}w")
        # effective words: OOV → '<unk>' when the model ships it
        # (KenLM's substitution), else the raw word (matches nothing;
        # backoff-0 hops)
        if has_unk:
            joined = joined.withColumn(
                "_we",
                F.when(F.col("_up").isNotNull(), F.col("_w")).otherwise(
                    F.lit("<unk>")
                ),
            )
            for j in range(1, K):
                joined = joined.withColumn(
                    f"_e{j}",
                    F.when(
                        F.col(f"_c{j}").isNull(),
                        F.lit(None).cast("string"),
                    )
                    .when(F.col(f"_v{j}m"), F.col(f"_c{j}"))
                    .otherwise(F.lit("<unk>")),
                )
        else:
            joined = joined.withColumn("_we", F.col("_w"))
            for j in range(1, K):
                joined = joined.withColumn(f"_e{j}", F.col(f"_c{j}"))

        # p_k chain: p1 = unigram (OOV floor = p(<unk>) when shipped);
        # p_k = p(ctx·w) if listed else b(ctx) + p_{k-1}
        ps = [F.coalesce(F.col("_up"), F.lit(floor10))]
        if K >= 2:
            # unigram backoff of the effective context word: the
            # file's b(<unk>) when the raw word is OOV and the model
            # ships <unk>
            b1 = F.when(
                F.col("_v1m"), F.coalesce(F.col("_v1b"), F.lit(0.0))
            ).otherwise(F.lit(b_unk if has_unk else 0.0))
        for k in range(2, K + 1):
            gk = model.grams[k]
            relk = hint(
                gk.select(
                    *[
                        F.col(f"w{i}").alias(f"_g{k}w{i}")
                        for i in range(1, k + 1)
                    ],
                    F.col("log10p").alias(f"_p{k}"),
                )
            )
            # context words furthest-first: w1 = c_{k-1}, …, w_{k-1} = c1
            cond = F.col(f"_e{k - 1}") == F.col(f"_g{k}w1")
            for i in range(2, k):
                cond = cond & (F.col(f"_e{k - i}") == F.col(f"_g{k}w{i}"))
            cond = cond & (F.col("_we") == F.col(f"_g{k}w{k}"))
            joined = joined.join(relk, cond, "left").drop(
                *[f"_g{k}w{i}" for i in range(1, k + 1)]
            )
            if k == 2:
                bk = b1
            else:
                bg = model.grams[k - 1]
                relb = hint(
                    bg.select(
                        *[
                            F.col(f"w{i}").alias(f"_b{k}w{i}")
                            for i in range(1, k)
                        ],
                        F.col("backoff").alias(f"_bo{k}"),
                    )
                )
                bcond = F.col(f"_e{k - 1}") == F.col(f"_b{k}w1")
                for i in range(2, k):
                    bcond = bcond & (
                        F.col(f"_e{k - i}") == F.col(f"_b{k}w{i}")
                    )
                joined = joined.join(relb, bcond, "left").drop(
                    *[f"_b{k}w{i}" for i in range(1, k)]
                )
                bk = F.coalesce(F.col(f"_bo{k}"), F.lit(0.0))
            ps.append(F.coalesce(F.col(f"_p{k}"), bk + ps[-1]))

    # position i uses order min(K, i+1): pick p_j where _cj is the
    # first missing context
    if K == 1:
        lp10 = ps[0]
    else:
        sel = F.when(F.col("_c1").isNull(), ps[0])
        for j in range(2, K):
            sel = sel.when(F.col(f"_c{j}").isNull(), ps[j - 1])
        lp10 = sel.otherwise(ps[K - 1])
    per_doc = joined.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("arpa_tokens"),
        (-F.sum(lp10 * F.lit(_LN10)) / F.count(F.lit(1))).alias("arpa_nll"),
    )
    return (
        docs.select(*id_cols)
        .join(per_doc, id_cols, "left")
        .select(
            *id_cols,
            F.coalesce(F.col("arpa_tokens"), F.lit(0)).alias("arpa_tokens"),
            F.coalesce(F.col("arpa_nll"), F.lit(0.0)).alias("arpa_nll"),
        )
    )


#: write_arpa's driver-stream guard: an export collects the model
#: tables order by order (the broadcast-scoring size class), so a
#: model past this row count refuses loudly instead of silently
#: materializing GBs on the driver — export such models per-order
#: with DataFrame writers instead.
_ARPA_EXPORT_ROW_CAP = 10_000_000


def write_arpa(model: ArpaModel, path: str) -> None:
    """Export an :class:`ArpaModel` back to the published ARPA text
    format (the KenLM/SRILM artifact — the inverse of
    :func:`load_arpa`), so a model fit or repaired here can feed any
    external toolchain. Values round-trip EXACTLY: doubles render via
    ``repr`` (shortest string that re-parses to the same double — the
    same parse ``load_arpa``'s cast applies), omitted backoffs (NULL)
    render as the absent third field, and rows sort by their words so
    the file is deterministic. ``path`` ending in ``.gz`` writes
    gzip-compressed (published models usually ship as ``.arpa.gz``;
    ``load_arpa`` reads those natively — ``spark.read.text``
    decompresses by extension).

    Driver-bounded by design: the export streams each order's rows
    through the driver (the broadcast-scoring size class), guarded by
    ``_ARPA_EXPORT_ROW_CAP`` with a loud remedy — a model too large to
    export this way is also too large to broadcast-score, and its
    per-order tables are better shipped as parquet relations."""
    import gzip

    orders = sorted(model.grams)
    # counts are VALIDATED against the live tables before anything is
    # collected (r15 review: a hand-assembled model whose counts
    # understate its tables would otherwise sail past the cap and
    # materialize the real rows on the driver — the exact OOM the cap
    # exists to prevent; overstated counts would write a header
    # load_arpa then rejects, with no error here)
    actual = {k: int(model.grams[k].count()) for k in orders}
    declared = {k: int(model.counts.get(k, 0)) for k in orders}
    if actual != declared:
        raise ValueError(
            f"write_arpa: model.counts {declared} disagree with the "
            f"tables' actual row counts {actual} — the header would "
            "not validate on reload"
        )
    total = sum(actual.values())
    if total > _ARPA_EXPORT_ROW_CAP:
        raise ValueError(
            f"write_arpa: model carries {total} n-gram rows, past the "
            f"driver-stream cap {_ARPA_EXPORT_ROW_CAP} — export the "
            "per-order tables as parquet relations instead "
            "(save_arpa_relations(model, dir); load_arpa_relations "
            "reads them back, scores identical)"
        )
    # collect + validate EVERY order before any file I/O (r15 advice:
    # a per-order validation failure mid-write left a truncated
    # .arpa(.gz) on disk that an external KenLM/SRILM consumer could
    # pick up; the export targets exactly those toolchains)
    all_rows: dict[int, list] = {}
    for k in orders:
        keys = [f"w{i}" for i in range(1, k + 1)]
        # a backoff-less table (legal on the TOP order — the scoring
        # validator's own exemption, and save_arpa_relations already
        # tolerates it) exports as all-omitted backoffs rather than
        # crashing with a raw unresolved-column error (r16 review)
        bo = (
            F.col("backoff")
            if "backoff" in model.grams[k].columns
            else F.lit(None).cast("double").alias("backoff")
        )
        rows = [
            (tuple(r[c] for c in keys), r["log10p"], r["backoff"])
            for r in model.grams[k].select(*keys, "log10p", bo).collect()
        ]
        # validate BEFORE sorting: a NULL word would crash the
        # sort comparator with a bare TypeError instead of this
        # diagnostic (r15 second review)
        for ws, _p, _b in rows:
            if any(
                w is None or w == "" or any(c.isspace() for c in w)
                for w in ws
            ):
                raise ValueError(
                    f"write_arpa: {k}-gram {ws!r} carries a NULL, "
                    "empty, or whitespace-bearing word — "
                    "unrepresentable in the space/tab-delimited "
                    "ARPA line grammar (an empty word would change "
                    "the n-gram's order on reload)"
                )
        # None-safe key: a duplicate (words, logp) pair with one
        # absent backoff must not TypeError mid-write
        rows.sort(
            key=lambda r: (r[0], r[1], r[2] is not None, r[2] or 0.0)
        )
        all_rows[k] = rows
    # write to a sibling temp path and rename on success, so the
    # final path only ever holds a COMPLETE artifact — even an OS
    # error mid-write cannot leave a truncated file under the real
    # name (os.replace is atomic within a directory)
    import os

    opener = gzip.open if str(path).endswith(".gz") else open
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with opener(tmp, "wt", encoding="utf-8") as f:
            f.write("\\data\\\n")
            for k in orders:
                f.write(f"ngram {k}={actual[k]}\n")
            for k in orders:
                f.write(f"\n\\{k}-grams:\n")
                for ws, p, b in all_rows[k]:
                    line = f"{float(p)!r}\t{' '.join(ws)}"
                    if b is not None:
                        line += f"\t{float(b)!r}"
                    f.write(line + "\n")
            f.write("\n\\end\\\n")
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_arpa_relations(model: ArpaModel, path: str) -> None:
    """Persist an :class:`ArpaModel` as parquet RELATIONS — the
    GB-scale sibling of :func:`write_arpa` (which streams the text
    artifact through the driver under a 10⁷-row cap): each order's
    table writes distributed to ``{path}/grams_k={k}/`` and the
    declared counts land LAST as a one-row-per-order sidecar at
    ``{path}/counts/``, making the sidecar the commit record —
    :func:`load_arpa_relations` refuses a directory without it, so a
    write that died mid-flight is detectably incomplete rather than a
    silently short model. Everything goes through Spark writers, so
    the path can be any Hadoop filesystem (the 100 TB posture: a
    5-gram model over a web corpus is parquet-sized, not text-sized).

    The same pre-write validation as ``write_arpa``: ``model.counts``
    must agree with the live tables' actual row counts (the
    hand-assembled-model guard; the counts are what the loader
    validates against). Orders must be contiguous 1..K with the
    scorer's column contract (``backoff`` required below the top
    order) so the reload is scoreable by construction."""
    grams = dict(model.grams)
    K = max(grams)
    if sorted(grams) != list(range(1, K + 1)):
        raise ValueError(
            f"save_arpa_relations: orders must be contiguous 1..{K}, "
            f"got {sorted(grams)}"
        )
    for k in range(1, K + 1):
        want = {f"w{i}" for i in range(1, k + 1)} | {"log10p"}
        if k < K:
            want |= {"backoff"}
        have = set(grams[k].columns)
        if not want <= have:
            raise ValueError(
                f"save_arpa_relations: order-{k} table is missing "
                f"columns {sorted(want - have)} (has {sorted(have)})"
            )
    actual = {k: int(grams[k].count()) for k in sorted(grams)}
    declared = {k: int(model.counts.get(k, 0)) for k in sorted(grams)}
    if actual != declared:
        raise ValueError(
            f"save_arpa_relations: model.counts {declared} disagree "
            f"with the tables' actual row counts {actual} — the "
            "sidecar would not validate on reload"
        )
    spark = grams[1].sparkSession
    # invalidate any EXISTING commit record before touching the gram
    # tables (r16 review: an in-place re-save of a same-support refit
    # that died mid-flight would otherwise leave the OLD sidecar
    # validating a mixed-generation model — identical supports mean
    # identical per-order counts, so every load-time check would
    # pass); with the sidecar deleted first, a torn rewrite is
    # detectably incomplete exactly like a torn first write
    jpath = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/counts")
    jpath.getFileSystem(spark._jsc.hadoopConfiguration()).delete(
        jpath, True
    )
    for k in sorted(grams):
        cols = [f"w{i}" for i in range(1, k + 1)] + ["log10p"]
        bo = (
            F.col("backoff")
            if "backoff" in grams[k].columns
            else F.lit(None).cast("double").alias("backoff")
        )
        grams[k].select(*cols, bo).write.mode("overwrite").parquet(
            f"{path}/grams_k={k}"
        )
    # the commit record, written last
    spark.createDataFrame(
        [(k, actual[k]) for k in sorted(grams)], "k int, n long"
    ).coalesce(1).write.mode("overwrite").json(f"{path}/counts")


def load_arpa_relations(spark, path: str) -> ArpaModel:
    """Read a :func:`save_arpa_relations` directory back into an
    :class:`ArpaModel` — the loader half of the parquet round trip,
    with ``load_arpa``'s loud posture: the counts sidecar is REQUIRED
    (its absence means an incomplete or foreign directory), each
    declared order's table must exist with the scorer's columns, the
    actual row counts must match the declared ones (one bounded
    column-free count per order — cheap on parquet), and duplicate
    n-gram keys are probed on every load (fanned-out scorer joins
    would silently inflate every token count otherwise). Scores are
    IDENTICAL to the in-memory model — parquet doubles round-trip
    bit-exactly, no text rendering involved."""
    try:
        counts_df = spark.read.json(f"{path}/counts")
        crows = counts_df.select("k", "n").collect()
    except Exception as exc:  # noqa: BLE001 — loud remedy either way
        raise ValueError(
            f"load_arpa_relations: {path!r} has no readable counts "
            "sidecar — not a save_arpa_relations directory, or a "
            "write that died before its commit record"
        ) from exc
    declared = {int(r["k"]): int(r["n"]) for r in crows}
    if not declared:
        raise ValueError(
            f"load_arpa_relations: {path!r} declares no orders"
        )
    K = max(declared)
    if sorted(declared) != list(range(1, K + 1)):
        raise ValueError(
            f"load_arpa_relations: sidecar declares orders "
            f"{sorted(declared)} — must be contiguous 1..{K}"
        )
    grams = {}
    for k in sorted(declared):
        try:
            df = spark.read.parquet(f"{path}/grams_k={k}")
        except Exception as exc:  # noqa: BLE001 — loud remedy either way
            raise ValueError(
                f"load_arpa_relations: the sidecar declares order {k} "
                f"but {path}/grams_k={k} is missing or unreadable — a "
                "lost or partially copied table"
            ) from exc
        want = {f"w{i}" for i in range(1, k + 1)} | {"log10p", "backoff"}
        have = set(df.columns)
        if not want <= have:
            raise ValueError(
                f"load_arpa_relations: order-{k} table is missing "
                f"columns {sorted(want - have)} (has {sorted(have)})"
            )
        n = df.count()
        if n != declared[k]:
            raise ValueError(
                f"load_arpa_relations: sidecar declares "
                f"{declared[k]} {k}-grams but the table carries {n}"
            )
        keys = [f"w{i}" for i in range(1, k + 1)]
        dup = (
            df.groupBy(*keys).count()
            .filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            merged = tuple(dup[0][c] for c in keys)
            raise ValueError(
                f"load_arpa_relations: the order-{k} table lists the "
                f"{k}-gram {merged!r} more than once — the model "
                "joins would fan out and inflate every score"
            )
        grams[k] = df.select(*keys, "log10p", "backoff")
    return ArpaModel(grams, declared)


def _sql_double(v) -> str:
    """A double literal rendered as a VARCHAR→DOUBLE cast: DuckDB
    parses bare float literals through a DECIMAL intermediate that can
    truncate ulps (the r14 VALUES trap), while the string cast parses
    straight to the nearest double — the same rounding Python and
    Spark apply to the source text."""
    return "NULL::DOUBLE" if v is None else f"CAST('{float(v)!r}' AS DOUBLE)"


def arpa_lm_oracle_sql(
    grams: dict,
    src: str = "documents",
    text_sql: str = "text",
    id_sql: str = "doc_id",
    oov_log10p: float | None = None,
) -> str:
    """DuckDB replica of :func:`arpa_lm_score` over model rows given
    VERBATIM as plain Python data — ``grams[k]`` is a list of
    ``(w1, …, wk, log10p, backoff_or_None)`` tuples (the mini-ARPA
    fixture's lines) — yielding (doc_id, arpa_tokens, arpa_nll)
    unrounded; the gate applies its own rounding. Replays the whole
    recursion: effective-word ``<unk>`` substitution (target and
    context), logp lookup per order, every backoff hop's weight
    (present, omitted → 0, and b(<unk>)), the position-order
    selection, and the mean-NLL arithmetic. Same token expression as
    the other LM oracles; model doubles enter via VARCHAR→DOUBLE
    casts so both engines hold bit-identical values."""
    from cod_stats_spark.operators.line_dedup import _sql_str as _q

    K = max(grams)
    if K > _ARPA_MAX_ORDER:
        raise ValueError(f"arpa_lm_oracle_sql: order {K} > {_ARPA_MAX_ORDER}")
    if sorted(grams) != list(range(1, K + 1)):
        raise ValueError(
            f"arpa_lm_oracle_sql: orders must be contiguous 1..{K}, "
            f"got {sorted(grams)}"
        )
    empty = [k for k in grams if not grams[k]]
    if empty:
        # a zero-row order would render 'VALUES ()' — malformed SQL
        # with a parser error instead of a diagnostic (r15 review)
        raise ValueError(
            f"arpa_lm_oracle_sql: orders {empty} carry no rows — drop "
            "them from the fixture (the Spark scorer needs contiguity "
            "too; truncate the model instead)"
        )

    unk = [r for r in grams[1] if r[0] == "<unk>"]
    has_unk = bool(unk)
    floor10 = float(unk[0][1]) if has_unk else oov_log10p
    if floor10 is None:
        raise ValueError(
            "arpa_lm_oracle_sql: no <unk> row and no oov_log10p"
        )
    b_unk = (
        0.0 if not has_unk or unk[0][2] is None else float(unk[0][2])
    )
    rels = []
    for k in range(1, K + 1):
        cols = ", ".join([f"w{i}" for i in range(1, k + 1)] + ["p", "b"])
        vals = ",\n    ".join(
            "("
            + ", ".join(
                [_q(w) for w in r[:k]]
                + [_sql_double(r[k]), _sql_double(r[k + 1])]
            )
            + ")"
            for r in grams[k]
        )
        rels.append(f"arpa_g{k}({cols}) AS (VALUES\n    {vals})")
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_sql})), '\\s+'),"
        " t -> t <> '')"
    )
    # position frame: target w + raw contexts c1..c{K-1}
    ctx_cols = "".join(
        f",\n         CASE WHEN i >= {j} THEN tk[i + 1 - {j}] END AS c{j}"
        for j in range(1, K)
    )
    # effective words + the unigram-layer backoff of c1
    if has_unk:
        we = "CASE WHEN uw.w1 IS NOT NULL THEN pos.w ELSE '<unk>' END"
        ej = {
            j: (
                f"CASE WHEN pos.c{j} IS NULL THEN NULL"
                f" WHEN v{j}.w1 IS NOT NULL THEN pos.c{j}"
                " ELSE '<unk>' END"
            )
            for j in range(1, K)
        }
        b1 = (
            "CASE WHEN v1.w1 IS NOT NULL THEN coalesce(v1.b, 0.0)"
            f" ELSE {_sql_double(b_unk)} END"
        )
    else:
        we = "pos.w"
        ej = {j: f"pos.c{j}" for j in range(1, K)}
        b1 = (
            "CASE WHEN v1.w1 IS NOT NULL THEN coalesce(v1.b, 0.0)"
            " ELSE 0.0 END"
        )
    vjoins = "".join(
        f"\n  LEFT JOIN arpa_g1 v{j} ON v{j}.w1 = pos.c{j}"
        for j in range(1, K)
    )
    eff_cols = "".join(
        f",\n         {ej[j]} AS e{j}" for j in range(1, K)
    )
    raw_cols = "".join(f", pos.c{j}" for j in range(1, K))
    # per-order logp + context-backoff joins over the effective words
    sjoins, sel_cols = [], []
    for k in range(2, K + 1):
        on = [f"g{k}.w1 = eff.e{k - 1}"] + [
            f"g{k}.w{i} = eff.e{k - i}" for i in range(2, k)
        ] + [f"g{k}.w{k} = eff.we"]
        sjoins.append(
            f"\n  LEFT JOIN arpa_g{k} g{k} ON " + " AND ".join(on)
        )
        sel_cols.append(f"g{k}.p AS p{k}l")
        if k >= 3:
            bon = [f"bb{k}.w1 = eff.e{k - 1}"] + [
                f"bb{k}.w{i} = eff.e{k - i}" for i in range(2, k)
            ]
            sjoins.append(
                f"\n  LEFT JOIN arpa_g{k - 1} bb{k} ON "
                + " AND ".join(bon)
            )
            sel_cols.append(f"bb{k}.b AS bo{k}")
    # the p-chain as nested expressions, then the position selection
    p_expr = [f"coalesce(up, {_sql_double(floor10)})"]
    for k in range(2, K + 1):
        bk = "b1" if k == 2 else f"coalesce(bo{k}, 0.0)"
        p_expr.append(f"coalesce(p{k}l, ({bk}) + ({p_expr[-1]}))")
    if K == 1:
        lp10 = p_expr[0]
    else:
        branches = "".join(
            f" WHEN c{j} IS NULL THEN ({p_expr[j - 1]})"
            for j in range(1, K)
        )
        lp10 = f"CASE{branches} ELSE ({p_expr[K - 1]}) END"
    rel_sql = ",\n".join(rels)
    sel_sql = "".join(f",\n         {c}" for c in sel_cols)
    return f"""
SELECT d.{id_sql} AS doc_id,
       coalesce(s.arpa_tokens, 0) AS arpa_tokens,
       coalesce(s.arpa_nll, 0.0) AS arpa_nll
FROM {src} d
LEFT JOIN (
  WITH
{rel_sql},
tok AS (
  SELECT {id_sql} AS doc_id, {toks} AS tk FROM {src}
),
pos AS (
  SELECT doc_id, i, tk[i + 1] AS w{ctx_cols}
  FROM tok, UNNEST(generate_series(0, len(tk) - 1)) u(i)
  WHERE len(tk) > 0
),
eff AS (
  SELECT pos.doc_id{raw_cols},
         uw.p AS up,
         {we} AS we{",%s AS b1" % b1 if K >= 2 else ""}{eff_cols}
  FROM pos
  LEFT JOIN arpa_g1 uw ON uw.w1 = pos.w{vjoins}
),
sc AS (
  SELECT eff.*{sel_sql}
  FROM eff{"".join(sjoins)}
)
SELECT doc_id, count(*) AS arpa_tokens,
       -sum(({lp10}) * ln(10)) / count(*) AS arpa_nll
FROM sc GROUP BY doc_id
) s ON s.doc_id = d.{id_sql}
"""
