"""Byte-level BPE — the GPT-2 / tiktoken tokenizer family.

The dominant published-artifact posture (Radford et al., "Language
Models are Unsupervised Multitask Learners", 2019 — the GPT-2 BPE):

- a BYTE-LEVEL pretokenizer: text splits on the GPT-2 regex (leading-
  space word convention — ``" world"`` is one pretoken, so the space
  rides inside the token and no end-of-word marker is needed), then
  every pretoken's UTF-8 BYTES map through the bytes→unicode table to
  printable stand-in characters;
- a byte alphabet: all 256 byte symbols are in the vocab, so ANY text
  encodes — no UNK token, no unknown-symbol path at all;
- merges learned over the byte-symbol sequences exactly as in plain
  BPE (operators/bpe.learn_bpe with ``eow=None`` — the same driver
  loop, same bounded word-count state, same determinism contract).

This complements the subword-nmt whitespace/EOW family in
operators/bpe.py (tokenizer_io.py:14-22 documents that posture
plainly); a published GPT-2-shaped ``tokenizer.json`` can now
round-trip through operators/tokenizer_io.byte_bpe_* instead of
hitting the EOW mismatch.

Fidelity notes, stated plainly:

- The pretoken regex is GPT-2's pattern re-expressed in std-``re``
  terms: ``[^\\W\\d_]`` for ``\\p{L}`` and ``\\d`` for ``\\p{N}``.
  Neither substitution is exact for letterlike numerals
  (roman-numeral codepoints, category Nl/No): GPT-2's ``\\p{N}``
  branch takes them, while here they match the LETTER branch —
  Python's ``\\w`` includes Nl/No, so ``[^\\W\\d_]`` admits them and
  that alternative runs first (verified: 'Ⅻ' tokenizes with the
  letters). Underscore is moved from the word class to the
  punctuation class to match ``\\p{L}``'s behavior. Documented,
  deterministic, and preserved byte-for-byte through the artifact
  (``pre_tokenizer.type: "ByteLevel"`` + this module on both ends).
- ``bytes_to_unicode`` is the published GPT-2 table: the three
  printable ranges map to themselves, every other byte to 256+n in
  first-seen order — a bijection, asserted at import.

Scale shape: training's corpus-sized step is one Arrow-batched
pretoken count (mapInPandas partial counts + one groupBy shuffle);
encoding is the bpe_encode shape — broadcast ranks, per-task bounded
memo cache, zero shuffles.

Reference: no tokenizer exists in the reference (bash/SQLite
telemetry); LLM-pipeline extension surface from the published method.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cod_stats_spark.operators.bpe import encode_word, learn_bpe

__all__ = [
    "bytes_to_unicode",
    "unicode_to_bytes",
    "byte_pretokenize",
    "ByteBPETokenizer",
    "byte_word_counts",
    "train_byte_bpe",
    "byte_bpe_encode",
    "BYTE_PRETOKEN_PATTERN",
]

#: GPT-2's pretokenizer, std-`re` spelling (see module doc for the
#: \p{L}/\p{N} mapping). Order matters: contractions, then
#: space?-letters, space?-digits, space?-punctuation, then the
#: trailing-whitespace lookahead split.
BYTE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+"
    r"|\s+(?!\S)|\s+"
)
_PRETOKEN_RE = re.compile(BYTE_PRETOKEN_PATTERN)


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode-symbol table: printable latin-1 ranges
    map to their own codepoints, the rest to 256+n in ascending byte
    order — every byte gets a PRINTABLE stand-in so merge rules and
    vocab files stay human-readable and whitespace-free."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    table = dict(zip(bs, (chr(c) for c in cs)))
    assert len(table) == 256 and len(set(table.values())) == 256
    return table


@lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def byte_pretokenize(text: str) -> list[str]:
    """GPT-2 pretokens as byte-symbol strings: regex split, then each
    pretoken's UTF-8 bytes through the table. Lossless — decoding is
    the exact inverse (symbols → bytes → UTF-8)."""
    b2u = bytes_to_unicode()
    return [
        "".join(b2u[b] for b in tok.encode("utf-8"))
        for tok in _PRETOKEN_RE.findall(text or "")
    ]


def decode_symbols(symbols: str) -> str:
    """Inverse of the byte mapping: symbol string → original text."""
    u2b = unicode_to_bytes()
    return bytes(u2b[c] for c in symbols).decode("utf-8", errors="replace")


@dataclass
class ByteBPETokenizer:
    """merges (rank order) + the symbol→id vocab. The vocab may come
    from a published file with its own id assignment — ids are NEVER
    re-derived on import (re-numbering would silently re-map every
    token id downstream)."""

    merges: list[tuple[str, str]]
    vocab: dict[str, int]
    special_tokens: dict[str, int] = field(default_factory=dict)

    def __post_init__(self) -> None:
        ids = list(self.vocab.values()) + list(self.special_tokens.values())
        if len(set(ids)) != len(ids):
            raise ValueError(
                "ByteBPETokenizer: duplicate ids across vocab/specials"
            )
        alphabet = set(bytes_to_unicode().values())
        missing = sorted(alphabet - set(self.vocab))
        if missing:
            # no UNK in this family: an uncovered byte symbol would
            # make some input UNENCODABLE — refuse the malformed
            # artifact instead of crashing mid-corpus
            raise ValueError(
                f"ByteBPETokenizer: vocab misses {len(missing)} byte "
                f"alphabet symbols (first: {missing[:5]!r}) — a "
                "byte-level vocab must cover all 256"
            )
        produced = {a + b for a, b in self.merges}
        gaps = sorted(
            {s for pair in self.merges for s in pair if s not in self.vocab}
            | {p for p in produced if p not in self.vocab}
        )
        if gaps:
            raise ValueError(
                f"ByteBPETokenizer: merge symbols missing from vocab: "
                f"{gaps[:5]!r}"
            )

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {p: i for i, p in enumerate(self.merges)}

    def encode_symbols(self, text: str) -> list[str]:
        """Token SYMBOL strings (pretokenize → greedy merges)."""
        ranks = self.ranks
        out: list[str] = []
        for pre in byte_pretokenize(text):
            out.extend(encode_word(pre, ranks, eow=None))
        return out

    def encode(self, text: str) -> list[int]:
        """Token ids. Total: the byte alphabet covers every symbol."""
        return [self.vocab[s] for s in self.encode_symbols(text)]

    def decode(self, ids: list[int]) -> str:
        inv = {i: s for s, i in self.vocab.items()}
        inv.update({i: s for s, i in self.special_tokens.items()})
        return decode_symbols("".join(inv[i] for i in ids))

    def id_list(self) -> list[str]:
        """``vocab_list[id] = piece`` for operators/packing.encode_ids
        (id = position). Requires contiguous ids 0..N-1 — true of
        every published GPT-2-family artifact; raises otherwise rather
        than silently re-mapping."""
        n = len(self.vocab)
        if sorted(self.vocab.values()) != list(range(n)):
            raise ValueError(
                "id_list: vocab ids are not contiguous 0..N-1 — map ids "
                "through the vocab dict directly"
            )
        out = [""] * n
        for s, i in self.vocab.items():
            out[i] = s
        return out


def byte_word_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, int]]:
    """(pretoken-symbol-string, count) for the ``max_words`` most
    frequent GPT-2 pretokens — the corpus-sized training step.
    Arrow-batched per-task partial counts (the regex + byte mapping
    are Python by nature — the documented tokenizer seam), then ONE
    shuffle on the partial (token, count) rows; driver receives
    ``max_words`` rows. Deterministic order (count desc, token asc)."""
    src = docs.select(F.col(text_col).alias("_t"))

    def count_batches(batches: Iterator) -> Iterator:
        import pandas as pd
        from collections import Counter

        for pdf in batches:
            c: Counter = Counter()
            for text in pdf["_t"]:
                c.update(byte_pretokenize(text or ""))
            if c:
                yield pd.DataFrame(
                    {"w": list(c.keys()), "pc": list(c.values())}
                )

    partial = src.mapInPandas(count_batches, "w string, pc long")
    rows = (
        partial.groupBy("w")
        .agg(F.sum("pc").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["cnt"]) for r in rows]


def train_byte_bpe(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_words: int = 100_000,
) -> ByteBPETokenizer:
    """Train: pretoken counts → ``learn_bpe(eow=None)`` → vocab = the
    256 byte symbols in BYTE order (ids 0–255, the GPT-2 layout) then
    merge products in rank order. ``vocab_size`` counts MERGES (final
    vocab = 256 + merges), matching learn_bpe's contract."""
    counts = byte_word_counts(docs, text_col, max_words)
    merges = learn_bpe(counts, vocab_size=vocab_size, eow=None)
    b2u = bytes_to_unicode()
    symbols = [b2u[b] for b in range(256)]
    for a, b in merges:
        symbols.append(a + b)
    if len(set(symbols)) != len(symbols):
        # distinct pairs can yield one product string — ('a','bc') and
        # ('ab','c') both make 'abc' (the tokenizer_io bijectivity
        # hazard). Position-derived ids would collapse; refuse loudly
        # (retrain with a different vocab_size) rather than silently
        # re-number
        dups = sorted(
            {s for s in symbols if symbols.count(s) > 1}
        )
        raise ValueError(
            f"train_byte_bpe: duplicate merge products {dups[:5]!r} — "
            "two merge rules yield the same symbol; position-derived "
            "ids cannot be bijective"
        )
    return ByteBPETokenizer(
        merges=merges, vocab={s: i for i, s in enumerate(symbols)}
    )


def byte_bpe_encode(
    docs: DataFrame,
    tok: ByteBPETokenizer,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    out_tokens: str = "bpe_tokens",
    out_count: str = "bpe_n_tokens",
    out_ids: str | None = None,
) -> DataFrame:
    """(id..., bpe_tokens array<string>, bpe_n_tokens [, out_ids
    array<int>]) — the bpe_encode shape: Arrow-batched, ranks in the
    task closure, bounded per-task pretoken→tokens memo (reset at cap;
    only short pretokens cached — the Zipf head is what repeats)."""
    import pandas as pd

    id_cols = id_cols or ["doc_id"]
    ranks = tok.ranks
    vocab = dict(tok.vocab) if out_ids else None
    fields = [docs.schema[c] for c in id_cols] + [
        T.StructField(out_tokens, T.ArrayType(T.StringType())),
        T.StructField(out_count, T.IntegerType()),
    ]
    if out_ids:
        fields.append(T.StructField(out_ids, T.ArrayType(T.IntegerType())))
    schema = T.StructType(fields)
    src = docs.select(*id_cols, F.col(text_col).alias("_t"))

    def encode_batches(batches: Iterator) -> Iterator:
        _CACHE_CAP = 1 << 18
        cache: dict[str, list[str]] = {}

        def enc(pre: str) -> list[str]:
            got = cache.get(pre)
            if got is None:
                got = encode_word(pre, ranks, eow=None)
                if len(pre) <= 32:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    cache[pre] = got
            return got

        for pdf in batches:
            toks_col, n_col, ids_col = [], [], []
            for text in pdf["_t"]:
                toks: list[str] = []
                for pre in byte_pretokenize(text or ""):
                    toks.extend(enc(pre))
                toks_col.append(toks)
                n_col.append(len(toks))
                if vocab is not None:
                    ids_col.append([vocab[s] for s in toks])
            out = pdf[id_cols].copy()
            out[out_tokens] = toks_col
            out[out_count] = n_col
            if vocab is not None:
                out[out_ids] = ids_col
            yield out

    return src.mapInPandas(encode_batches, schema)
