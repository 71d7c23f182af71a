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
    ships a literal (token, logp) relation to the scoring join.
    ``broadcast_model=False`` persists the model instead (the N/V
    totals action materializes the cache the scoring join then reads);
    the cache lives as long as the returned frame — callers doing a
    one-shot score may ``model.unpersist()`` after their action.
    Pre-fix, the N/V ``.first()`` and the unpersisted join each ran
    the full fit (explode + token shuffle) — twice per call."""
    id_cols = id_cols or ["doc_id"]
    spark = docs.sparkSession
    if broadcast_model:
        import pandas as pd

        mrows = model.select("token", "cnt").toPandas()
        n_total = float(mrows["cnt"].sum()) if len(mrows) else 0.0
        vocab = float(len(mrows))
        denom = n_total + alpha * vocab
        if denom <= 0:
            raise ValueError("unigram_lm_score: empty model")
        scored_model = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "token": mrows["token"],
                        "_logp": [
                            math.log((c + alpha) / denom)
                            for c in mrows["cnt"]
                        ],
                    }
                )
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
    per_doc = (
        tk.join(scored_model, "token", "left")
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
