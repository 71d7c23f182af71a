"""Trained WordPiece tokenization — the BERT artifact family.

WordPiece (Schuster & Nakajima, "Japanese and Korean Voice Search",
ICASSP 2012; the BERT tokenizer of Devlin et al. 2019) completes the
repo's tokenizer families: BPE merges by raw pair frequency
(operators/bpe.py), byte-level BPE carries the GPT-2/tiktoken posture
(operators/byte_bpe.py), unigram-LM segments by likelihood
(operators/unigram_lm.py) — WordPiece trains by the LIKELIHOOD-GAIN
pair score count(ab) / (count(a)·count(b)) (the published Hugging
Face WordPiece trainer semantics) and encodes by greedy
longest-match-first with a continuation prefix (``##``) and a hard
[UNK] fallback, BERT's exact inference rule.

Factoring (the BPE discipline — one corpus-sized count, bounded
driver training, Arrow-batched memoized encode):

- **training**: over the bpe.word_counts dictionary (the ONLY
  corpus-sized step: one explode + one shuffle, ≤max_words driver
  rows). Words become symbol sequences (first char bare, the rest
  ##-prefixed); each round merges the best-scoring adjacent pair.
  Scores compare by EXACT integer cross-multiplication —
  c_ab·(c_a'·c_b') vs c_ab'·(c_a·c_b) — never by float division, so
  training is byte-deterministic on any partitioning; ties break
  lexicographically. Pair/symbol statistics update incrementally
  (the learn_bpe scheme), never recounted from scratch.
- **encoding**: per word, repeatedly take the LONGEST vocab prefix
  (continuation steps search ##-prefixed pieces); any unmatched
  remainder — or a word longer than ``max_input_chars`` — makes the
  WHOLE word [UNK] (the BERT rule, not a partial emit). Distributed
  as Arrow-batched ``mapInPandas`` with the bpe_encode bounded memo
  (Zipf text hits the cache almost always).

Artifacts: parquet save/load with the torn-save fingerprint
discipline, and ``tokenizer_io``-style ``tokenizer.json`` interop
(model.type "WordPiece" — unk_token, continuing_subword_prefix,
max_input_chars_per_word, vocab) with a published file's ids
preserved VERBATIM on import (the byte-BPE discipline: the id
assignment IS the model).

Not SQL-expressible (iterative trainer, greedy longest-match loop) —
the BPE/unigram precedent: no oracle slot; correctness is pinned by
unit tests against hand-derived merges, the published BERT
segmentation examples, and round-trip invariants.

Reference: the reference repo tokenizes nothing; this is LLM-pipeline
extension surface built from the published method.

At 100 TB: training reads one bounded word-count table; encoding is
embarrassingly parallel with per-task bounded memos; the vocab
broadcast is ≤vocab_size short strings.
"""

from __future__ import annotations

import struct
import zlib
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "WordPieceVocab",
    "learn_wordpiece",
    "wordpiece_encode_word",
    "wordpiece_encode",
    "save_wordpiece",
    "load_wordpiece",
]

_DEFAULT_SPECIALS = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")


@dataclass
class WordPieceVocab:
    """token → id. Ids are arbitrary (imports preserve a file's ids
    verbatim); encoding only needs membership + the longest-piece
    bound, both derived here."""

    vocab: dict[str, int]
    unk_token: str = "[UNK]"
    continuing_prefix: str = "##"
    max_input_chars: int = 100
    lowercase: bool = True
    max_piece_len: int = field(init=False)

    def __post_init__(self) -> None:
        if not self.vocab:
            raise ValueError("empty WordPiece vocab")
        if self.unk_token not in self.vocab:
            raise ValueError(
                f"unk_token {self.unk_token!r} missing from vocab — "
                "every unmatched word must map to a real id"
            )
        ids = sorted(self.vocab.values())
        if len(set(ids)) != len(ids):
            raise ValueError("WordPiece vocab has duplicate ids")
        if self.max_input_chars < 1:
            raise ValueError("max_input_chars must be >= 1")
        self.max_piece_len = max(len(p) for p in self.vocab)

    def pieces(self) -> list[str]:
        """``pieces()[id] = token`` — the position-ordered list
        operators/packing.encode_ids consumes. Requires contiguous
        ids 0..N-1 (true of learn_wordpiece output and standard BERT
        files); raises otherwise rather than silently re-mapping an
        imported artifact's gapped ids (the byte_bpe.id_list rule)."""
        n = len(self.vocab)
        if sorted(self.vocab.values()) != list(range(n)):
            raise ValueError(
                "pieces: vocab ids are not contiguous 0..N-1 — map ids "
                "through the vocab dict directly"
            )
        return [p for p, _ in sorted(self.vocab.items(), key=lambda kv: kv[1])]


def _word_symbols(word: str, prefix: str) -> list[str]:
    return [word[0]] + [prefix + ch for ch in word[1:]]


def _merge_product(a: str, b: str, prefix: str) -> str:
    """Merged token keeps the LEFT symbol's prefix status; the right
    symbol is always a continuation inside a word."""
    return a + (b[len(prefix):] if b.startswith(prefix) else b)


def learn_wordpiece(
    counts: list[tuple[str, int]],
    vocab_size: int = 512,
    specials: tuple[str, ...] = _DEFAULT_SPECIALS,
    unk_token: str = "[UNK]",
    continuing_prefix: str = "##",
    max_input_chars: int = 100,
    lowercase: bool = True,
) -> WordPieceVocab:
    """Driver-side WordPiece training over a (word, count) dictionary
    (bpe.word_counts output). Vocab = ``specials`` in the given order,
    then the sorted corpus alphabet (bare first-chars and ##-continued
    chars are DISTINCT symbols, the published convention), then merge
    products in creation order, stopping at ``vocab_size`` total
    entries or when no pair repeats.

    Pair selection maximizes count(ab)/(count(a)·count(b)) via exact
    integer cross-multiplication (no float scores — two candidates
    compare by c1·ca2·cb2 vs c2·ca1·cb1), ties lexicographic."""
    if unk_token not in specials:
        raise ValueError("unk_token must be one of specials")
    words: list[list[str]] = [
        _word_symbols(w, continuing_prefix) for w, _ in counts if w
    ]
    freqs = [c for (w, c) in counts if w]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    sym_counts: dict[str, int] = defaultdict(int)
    for i, syms in enumerate(words):
        f = freqs[i]
        for s in syms:
            sym_counts[s] += f
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words[p].add(i)

    vocab_list: list[str] = list(specials)
    seen = set(vocab_list)
    for s in sorted(sym_counts):
        if s not in seen:
            vocab_list.append(s)
            seen.add(s)

    def better(cand: tuple[str, str], best: tuple[str, str] | None) -> bool:
        if best is None:
            return True
        c1 = pair_counts[cand]
        c2 = pair_counts[best]
        # score(p) = c_p / (c_a * c_b); compare cross-multiplied ints
        lhs = c1 * sym_counts[best[0]] * sym_counts[best[1]]
        rhs = c2 * sym_counts[cand[0]] * sym_counts[cand[1]]
        if lhs != rhs:
            return lhs > rhs
        return cand < best

    while len(vocab_list) < vocab_size and pair_counts:
        best = None
        for p in pair_counts:
            if better(p, best):
                best = p
        if pair_counts[best] < 2:
            break
        a, b = best
        merged = _merge_product(a, b, continuing_prefix)
        for i in list(pair_words[best]):
            syms = words[i]
            f = freqs[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            for s in syms:
                sym_counts[s] -= f
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for s in out:
                sym_counts[s] += f
            for p in zip(out, out[1:]):
                pair_counts[p] += f
                pair_words[p].add(i)
        if merged not in seen:
            vocab_list.append(merged)
            seen.add(merged)

    return WordPieceVocab(
        vocab={p: i for i, p in enumerate(vocab_list)},
        unk_token=unk_token,
        continuing_prefix=continuing_prefix,
        max_input_chars=max_input_chars,
        lowercase=lowercase,
    )


def wordpiece_encode_word(word: str, vocab: WordPieceVocab) -> list[str]:
    """Greedy longest-match-first segmentation of one word (reference
    encoder — also the per-word kernel the distributed encode
    memoizes). Any unmatched remainder, or a word longer than
    ``max_input_chars``, yields ``[unk_token]`` for the WHOLE word
    (the BERT rule)."""
    if not word:
        return []
    if len(word) > vocab.max_input_chars:
        return [vocab.unk_token]
    v = vocab.vocab
    prefix = vocab.continuing_prefix
    out: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = min(n, start + vocab.max_piece_len)
        piece = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = prefix + sub
            if sub in v:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [vocab.unk_token]
        out.append(piece)
        start = end
    return out


def wordpiece_encode(
    docs: DataFrame,
    vocab: WordPieceVocab,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    out_tokens: str = "wp_tokens",
    out_count: str = "wp_n_tokens",
) -> DataFrame:
    """(id..., wp_tokens array<string>, wp_n_tokens) — Arrow-batched
    encode with the vocab broadcast in the task closure and the
    bpe_encode bounded per-task memo (≤32-char words only, reset at
    cap — high-cardinality text cannot grow a task's footprint)."""
    import pandas as pd

    id_cols = id_cols or ["doc_id"]
    schema = T.StructType(
        [docs.schema[c] for c in id_cols]
        + [
            T.StructField(out_tokens, T.ArrayType(T.StringType())),
            T.StructField(out_count, T.IntegerType()),
        ]
    )
    src = docs.select(*id_cols, F.col(text_col).alias("_t"))
    lower = vocab.lowercase

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _CACHE_CAP = 1 << 18
        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = wordpiece_encode_word(word, vocab)
                if len(word) <= 32:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    cache[word] = got
            return got

        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf["_t"]:
                s = text or ""
                if lower:
                    s = s.lower()
                toks: list[str] = []
                for w in s.split():
                    toks.extend(enc(w))
                toks_col.append(toks)
                n_col.append(len(toks))
            out = pdf[id_cols].copy()
            out[out_tokens] = toks_col
            out[out_count] = n_col
            yield out

    return src.mapInPandas(encode_batches, schema)


def _wp_fingerprint(pairs) -> int:
    """Order-independent exact fingerprint of (piece, id) rows (the
    unigram _vocab_fingerprint discipline, integer ids)."""
    acc = 0
    for piece, pid in pairs:
        acc = (
            acc
            + zlib.crc32(piece.encode("utf-8") + struct.pack("<q", int(pid)))
        ) % (2**63)
    return acc


def save_wordpiece(spark, vocab: WordPieceVocab, path: str) -> None:
    """Persist as (piece, id) parquet + one-row meta written LAST with
    a value fingerprint (the torn-save discipline)."""
    rows = sorted(vocab.vocab.items())
    spark.createDataFrame(
        rows, "piece string, id int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pieces")
    spark.createDataFrame(
        [
            (
                vocab.unk_token,
                vocab.continuing_prefix,
                int(vocab.max_input_chars),
                bool(vocab.lowercase),
                len(rows),
                _wp_fingerprint(rows),
            )
        ],
        "unk_token string, continuing_prefix string, max_input_chars int, "
        "lowercase boolean, n_pieces int, vfp long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_wordpiece(spark, path: str) -> WordPieceVocab:
    m = spark.read.parquet(f"{path}/meta").first()
    rows = spark.read.parquet(f"{path}/pieces").collect()
    pairs = [(r["piece"], int(r["id"])) for r in rows]
    if len(rows) != int(m["n_pieces"]) or _wp_fingerprint(pairs) != int(
        m["vfp"]
    ):
        raise ValueError(
            f"load_wordpiece: {path} is torn — pieces don't match meta "
            "(crashed mid re-save?); re-save the model"
        )
    return WordPieceVocab(
        vocab=dict(pairs),
        unk_token=m["unk_token"],
        continuing_prefix=m["continuing_prefix"],
        max_input_chars=int(m["max_input_chars"]),
        lowercase=bool(m["lowercase"]),
    )
