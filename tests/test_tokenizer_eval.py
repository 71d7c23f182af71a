"""Tokenizer fertility eval (operators/tokenizer_eval.py):
hand-computed compression/fertility ratios, trained-tokenizer counter
columns, NULL ratios for zero-token groups, validation. SQL value
verification on the real tables lives in the stat_aggregates gate's
'fert:' arm (with deterministic punctuation decoration so the two
counters genuinely diverge)."""

from __future__ import annotations

import pytest


def test_hand_computed_ratios(spark):
    from cod_stats_spark.operators.tokenizer_eval import fertility_stats

    docs = spark.createDataFrame(
        [
            (1, "hello, world 123", "en"),   # ws=3; sub: hello , world 123 =4
            (2, "foo-bar baz", "en"),        # ws=2; sub: foo - bar baz = 4
            (3, "uno dos", "es"),            # ws=2; sub=2
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r["lang"]: r.asDict()
        for r in fertility_stats(docs).collect()
    }
    en, es = got["en"], got["es"]
    assert (en["n_docs"], en["toks_ws"], en["toks_sub"]) == (2, 5, 8)
    assert en["n_chars"] == len("hello, world 123") + len("foo-bar baz")
    assert en["chars_per_ws"] == round(en["n_chars"] / 5, 6)
    assert en["chars_per_sub"] == round(en["n_chars"] / 8, 6)
    assert en["fert_sub"] == 1.6
    assert (es["toks_ws"], es["toks_sub"], es["fert_sub"]) == (2, 2, 1.0)


def test_trained_tokenizer_counter_column(spark):
    """A trained tokenizer's per-doc count column slots in as a
    counter — the fertility of REAL subword output, per language."""
    from pyspark.sql import functions as F

    from cod_stats_spark.operators.bpe import word_counts
    from cod_stats_spark.operators.tokenizer_eval import fertility_stats
    from cod_stats_spark.operators.wordpiece import (
        learn_wordpiece,
        wordpiece_encode,
    )

    docs = spark.createDataFrame(
        [
            (1, "running runner runs", "en"),
            (2, "the runner keeps running", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    vocab = learn_wordpiece(word_counts(docs), vocab_size=48)
    encoded = docs.join(
        wordpiece_encode(docs, vocab).select("doc_id", "wp_n_tokens"),
        "doc_id",
    )
    from cod_stats_spark.functions import text as T

    out = fertility_stats(
        encoded, "text", "lang",
        counters={
            "ws": T.token_count_ws(F.col("text")),
            "wp": F.col("wp_n_tokens"),
        },
    ).collect()
    row = out[0].asDict()
    assert row["toks_wp"] >= row["toks_ws"]  # subwords never fewer
    assert row["fert_wp"] == round(row["toks_wp"] / row["toks_ws"], 6)
    assert "fert_ws" not in row              # identity ratio omitted


def test_zero_token_group_yields_null_ratios(spark):
    from cod_stats_spark.operators.tokenizer_eval import fertility_stats

    docs = spark.createDataFrame(
        [(1, "   ", "xx"), (2, "real words here", "en")],
        "doc_id long, text string, lang string",
    )
    got = {r["lang"]: r.asDict() for r in fertility_stats(docs).collect()}
    assert got["xx"]["toks_ws"] == 0
    assert got["xx"]["chars_per_ws"] is None
    assert got["xx"]["fert_sub"] is None
    assert got["en"]["chars_per_ws"] is not None


def test_validation(spark):
    from cod_stats_spark.operators.tokenizer_eval import fertility_stats

    docs = spark.createDataFrame(
        [(1, "a", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="group column"):
        fertility_stats(docs, by="")
    with pytest.raises(ValueError, match="counter"):
        fertility_stats(docs, counters={})


def test_bytes_per_token_diverges_on_multibyte_text(spark):
    """'héllo wörld ™' (r14): 13 chars but 17 UTF-8 octets (é/ö = 2
    each, ™ = 3), 3 ws tokens — bytes_per_ws must report octets (the
    byte-level-tokenizer grading convention), not codepoints."""
    from cod_stats_spark.operators.tokenizer_eval import fertility_stats

    docs = spark.createDataFrame(
        [(1, "héllo wörld ™", "de"), (2, "plain ascii", "en")],
        "doc_id long, text string, lang string",
    )
    got = {r["lang"]: r.asDict() for r in fertility_stats(docs).collect()}
    de = got["de"]
    assert de["n_chars"] == 13 and de["n_bytes"] == 17
    assert de["toks_ws"] == 3
    assert de["chars_per_ws"] == round(13 / 3, 6)
    assert de["bytes_per_ws"] == round(17 / 3, 6)
    assert de["bytes_per_ws"] != de["chars_per_ws"]
    # pure ASCII: the two conventions coincide exactly
    en = got["en"]
    assert en["n_chars"] == en["n_bytes"]
    assert en["bytes_per_ws"] == en["chars_per_ws"]
