"""Tokenizer fertility / compression-rate evaluation.

The standard eval every tokenizer effort runs before committing a
vocabulary (fertility = tokens per word; compression = chars or bytes
per token — the numbers multilingual tokenizer papers report per
language, e.g. the XLM-R and NLLB analyses): a vocabulary that is a
poor fit for a language inflates its token count, which directly
inflates training cost and effectively shrinks that language's
context window. Run per language over a corpus sample, it is the
acceptance gate for a trained vocabulary and the diagnostic for
mixture decisions (a language with fertility 3× English needs its
token budget, not its document count, rebalanced).

One codegen aggregation: counters are per-doc token-count COLUMNS
(pure expressions for the regex family; precomputed columns for
trained tokenizers — wordpiece_encode's ``wp_n_tokens``,
bpe_encode's ``bpe_n_tokens``, unigram_encode's ``n_tokens`` all
slot in), so the whole eval is one groupBy with map-side partial
aggregation — no shuffle beyond the ≤|groups| result. Ratios are
of SUMS (corpus-level fertility, the published convention), not
means of per-doc ratios, and round to 6 dp so any engine replaying
the same counters agrees (the 'fert:' arm of the stat_aggregates
gate replays the ws + sub-word-regex counters in SQL).

Reference: the reference repo has no tokenizer surface; this is
LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions import text as T

__all__ = ["fertility_stats"]


def fertility_stats(
    df: DataFrame,
    text_col: str = "text",
    by: str = "lang",
    counters: "dict[str, Column] | None" = None,
) -> DataFrame:
    """Per-``by``-group fertility table. ``counters`` maps a name to a
    per-doc token-count Column (defaults: ``ws`` whitespace words,
    ``sub`` the sub-word-ish regex family — both SQL-replayable; pass
    e.g. ``{"wp": F.col("wp_n_tokens"), ...}`` to evaluate a trained
    tokenizer's output). Output per group:

    - ``n_docs``, ``n_chars``, ``n_bytes`` (UTF-8 octets)
    - ``toks_<name>`` — total tokens under that counter
    - ``chars_per_<name>`` — compression rate, 6 dp
    - ``bytes_per_<name>`` — UTF-8 bytes per token, 6 dp — the OTHER
      published compression convention (what byte-level tokenizers
      are graded on; equals chars_per for pure-ASCII corpora and
      diverges on any multibyte text)
    - ``fert_<name>`` — tokens per whitespace word, 6 dp (only when a
      ``ws`` counter is present; ``fert_ws`` ≡ 1 by construction and
      is omitted)

    Zero-token groups yield NULL ratios (never a division error)."""
    if not by:
        raise ValueError("fertility_stats: 'by' group column required")
    if counters is None:
        counters = {
            "ws": T.token_count_ws(F.col(text_col)),
            "sub": T.token_count_bpe_ish(F.col(text_col)),
        }
    if not counters:
        raise ValueError("fertility_stats: at least one counter required")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(F.col(text_col)).cast("bigint")).alias("n_chars"),
        F.sum(F.octet_length(F.col(text_col)).cast("bigint")).alias(
            "n_bytes"
        ),
    ]
    for name, col in counters.items():
        aggs.append(F.sum(col.cast("bigint")).alias(f"toks_{name}"))
    out = df.groupBy(F.col(by)).agg(*aggs)
    for name in counters:
        toks = F.col(f"toks_{name}")
        out = out.withColumn(
            f"chars_per_{name}",
            F.round(
                F.when(toks > 0, F.col("n_chars") / toks), 6
            ),
        ).withColumn(
            f"bytes_per_{name}",
            F.round(
                F.when(toks > 0, F.col("n_bytes") / toks), 6
            ),
        )
    if "ws" in counters:
        ws = F.col("toks_ws")
        for name in counters:
            if name == "ws":
                continue
            out = out.withColumn(
                f"fert_{name}",
                F.round(
                    F.when(ws > 0, F.col(f"toks_{name}") / ws), 6
                ),
            )
    return out
