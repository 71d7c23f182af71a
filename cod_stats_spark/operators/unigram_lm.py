"""Trained unigram-LM subword tokenization — the SentencePiece model
family (Kudo, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates", ACL 2018),
built with the same big-data factoring as the BPE trainer next door
(operators/bpe.py): the ONLY corpus-sized step is the word-frequency
count (one explode + one shuffle, map-side combine absorbs the Zipf
head); EM training runs driver-side over that bounded word→count
dictionary; encoding broadcasts the learned (piece → log-probability)
table back over the corpus as an Arrow-batched ``mapInPandas`` with
per-word Viterbi memoization.

Model: a unigram language model over subword pieces. A word's
likelihood is the sum over all segmentations of the product of piece
probabilities; training maximizes corpus likelihood with EM
(forward-backward over each word's segmentation lattice gives each
piece's expected count; the M-step renormalizes), interleaved with
pruning rounds that shrink an over-complete seed vocabulary down to
``vocab_size``. Pruning keeps the pieces carrying the most expected
probability mass (single-character pieces are never pruned, so every
string stays encodable) — the practical simplification of the paper's
loss-difference criterion (§3.2: the exact rule re-scores each word
with the piece removed; the mass criterion agrees with it except for
pieces whose mass flows through near-equal alternatives, and is what
several production ports ship). Encoding is Viterbi (the single best
segmentation, the paper's α→∞ limit) — deterministic, and the form a
data pipeline wants; sampling segmentations is a training-time
regularizer for NMT, out of scope here.

Driver state: the top ``max_words`` word-count pairs plus a seed
vocabulary capped at ``seed_size`` pieces — both bounded by
parameter, the BPE/PQ/k-means training contract. Determinism: word
counts order by (count desc, word asc); seed selection and every
pruning round break ties by (mass desc, piece asc); EM sums iterate
words and lattice edges in fixed order — byte-identical models for
the same corpus on any partitioning.

Not SQL-expressible (iterative EM), the documented BPE precedent: no
oracle slot; correctness is pinned by unit tests against hand-derived
lattices, the pure-Python reference Viterbi, the round-trip invariant
(concatenating a word's pieces reproduces the word), and save/load
bit-identity.
"""

from __future__ import annotations

import math
import struct
import zlib
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cod_stats_spark.operators.bpe import word_counts

#: score assigned to a character absent from the vocabulary at encode
#: time (unseen script, emoji …): worse than any trained piece, so it
#: is only used when nothing else covers the position, but finite, so
#: encoding never fails — the piece emitted is the raw character.
_UNK_LOGP = -100.0

_NEG_INF = float("-inf")


@dataclass
class UnigramVocab:
    """The trained model: piece → natural-log probability. ``pieces``
    is sorted (piece asc) — order carries no information (unlike BPE
    merges, where rank IS the model), but a canonical order makes
    equality, fingerprints, and artifacts reproducible."""

    logp: dict[str, float] = field(default_factory=dict)
    max_piece_len: int = 8

    def __post_init__(self):
        for p, lp in self.logp.items():
            if not p:
                raise ValueError("empty piece in vocabulary")
            if lp > 0:
                raise ValueError(f"piece {p!r} has positive log-prob {lp}")

    @property
    def pieces(self) -> list[str]:
        return sorted(self.logp)


def _lattice_edges(word: str, logp: dict[str, float], max_len: int):
    """(start, end, logp) for every vocabulary piece occurring in
    ``word`` — the segmentation lattice. Single characters absent
    from the vocab get the UNK floor so the lattice always reaches
    the end."""
    n = len(word)
    for i in range(n):
        hi = min(n, i + max_len)
        for j in range(i + 1, hi + 1):
            lp = logp.get(word[i:j])
            if lp is not None:
                yield i, j, lp
            elif j == i + 1:
                yield i, j, _UNK_LOGP


def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, list[tuple[str, float]]]:
    """(log Z, [(piece, posterior)]) — each in-vocab edge's marginal
    probability of appearing in a segmentation of ``word``."""
    n = len(word)
    edges = list(_lattice_edges(word, logp, max_len))
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for i, j, lp in edges:  # edges iterate i ascending — DP order holds
        if alpha[i] != _NEG_INF:
            alpha[j] = _logsumexp2(alpha[j], alpha[i] + lp)
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i, j, lp in reversed(edges):  # j descending within each i is fine:
        # beta[j] only depends on edges starting at >= j, all later in
        # the reversed order
        if beta[j] != _NEG_INF:
            beta[i] = _logsumexp2(beta[i], lp + beta[j])
    z = alpha[n]
    post: list[tuple[str, float]] = []
    if z == _NEG_INF:
        return z, post
    for i, j, lp in edges:
        piece = word[i:j]
        if piece in logp and alpha[i] != _NEG_INF and beta[j] != _NEG_INF:
            post.append((piece, math.exp(alpha[i] + lp + beta[j] - z)))
    return z, post


def seed_vocab(
    counts: list[tuple[str, int]],
    seed_size: int,
    max_piece_len: int = 8,
) -> dict[str, float]:
    """The over-complete starting vocabulary: every substring of the
    count words up to ``max_piece_len`` chars, scored by occurrence
    mass (count × occurrences), the top ``seed_size`` kept — plus ALL
    single characters unconditionally (coverage guarantee). Initial
    probabilities ∝ mass, in log space."""
    mass: dict[str, float] = defaultdict(float)
    chars: set[str] = set()
    for w, c in counts:
        chars.update(w)
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                mass[w[i:j]] += c
    multi = sorted(
        ((p, m) for p, m in mass.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(seed_size - len(chars), 0)]
    kept = {p: m for p, m in multi}
    kept.update((ch, mass[ch]) for ch in chars)
    total = sum(kept.values())
    return {p: math.log(m / total) for p, m in kept.items()}


def learn_unigram(
    counts: list[tuple[str, int]],
    vocab_size: int = 512,
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    shrink_factor: float = 0.75,
) -> UnigramVocab:
    """Driver-side unigram-LM training: seed → (EM ×``em_iters``,
    prune to ``shrink_factor`` of the removable pieces) until the
    vocabulary fits ``vocab_size``, then a final EM round. Returns
    the trained :class:`UnigramVocab`."""
    if not counts:
        raise ValueError("learn_unigram: empty word counts")
    if seed_size is None:
        seed_size = 8 * vocab_size
    logp = seed_vocab(counts, seed_size, max_piece_len)
    chars = {p for p in logp if len(p) == 1}

    def em_round() -> tuple[dict[str, float], dict[str, float]]:
        expected: dict[str, float] = defaultdict(float)
        for w, c in counts:
            z, post = _forward_backward(w, logp, max_piece_len)
            if z == _NEG_INF:
                continue
            for piece, p in post:
                expected[piece] += c * p
        total = sum(expected.values())
        if total <= 0:
            raise ArithmeticError("learn_unigram: EM collapsed to zero mass")
        floor = math.log(1e-12)
        return {
            p: max(math.log(expected[p] / total), floor)
            if expected.get(p, 0.0) > 0
            else floor
            for p in logp
        }, expected

    expected: dict[str, float] = {}
    while True:
        for _ in range(max(em_iters, 1)):
            logp, expected = em_round()
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = max(vocab_size - len(chars), 0)
        if n_multi <= target_multi:
            break
        # prune: keep the highest-expected-mass multi-char pieces
        # (chars are never pruned); ties break lexicographically
        keep_n = max(int(n_multi * shrink_factor), target_multi)
        if keep_n == n_multi:  # shrink_factor rounding stalled
            keep_n = target_multi
        ranked = sorted(
            ((p, expected.get(p, 0.0)) for p in logp if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        kept = {p for p, _ in ranked[:keep_n]} | chars
        logp = {p: lp for p, lp in logp.items() if p in kept}
    logp, _ = em_round()
    return UnigramVocab(logp=dict(logp), max_piece_len=max_piece_len)


def unigram_fit(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_piece_len: int = 8,
    lowercase: bool = True,
    max_words: int = 100_000,
    **kw,
) -> UnigramVocab:
    """The whole training job: distributed word counts (the one
    corpus-sized step, shared with the BPE trainer) + driver-side EM."""
    return learn_unigram(
        word_counts(docs, text_col, lowercase, max_words),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        **kw,
    )


def viterbi_encode_word(word: str, vocab: UnigramVocab) -> list[str]:
    """The single best segmentation of ``word`` (reference encoder —
    also the per-word kernel the distributed encode memoizes). Ties
    prefer FEWER pieces, then the lexicographically smaller last
    piece at each DP state — fully deterministic."""
    n = len(word)
    if n == 0:
        return []
    # best[j] = (score, n_pieces, start_of_last_piece)
    best: list[tuple[float, int, int] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, -1)
    for i in range(n):
        if best[i] is None:
            continue
        s_i, k_i, _ = best[i]
        hi = min(n, i + vocab.max_piece_len)
        for j in range(i + 1, hi + 1):
            lp = vocab.logp.get(word[i:j])
            if lp is None:
                if j != i + 1:
                    continue
                lp = _UNK_LOGP
            cand = (s_i + lp, k_i + 1, i)
            cur = best[j]
            if (
                cur is None
                or cand[0] > cur[0] + 1e-12
                or (
                    abs(cand[0] - cur[0]) <= 1e-12
                    and (
                        cand[1] < cur[1]
                        or (cand[1] == cur[1] and word[i:j] < word[cur[2]:j])
                    )
                )
            ):
                best[j] = cand
    out: list[str] = []
    j = n
    while j > 0:
        i = best[j][2]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def _vocab_fingerprint(pairs) -> int:
    """Order-independent exact fingerprint of (piece, logp) rows:
    sum (mod 2**63) of a CRC over each pair's (utf-8 piece, IEEE-754
    bits of logp). A piece COUNT alone cannot detect the common torn
    re-save — same vocab_size, different pieces/probabilities — which
    would otherwise load new pieces under stale meta silently."""
    acc = 0
    for piece, lp in pairs:
        acc = (
            acc
            + zlib.crc32(piece.encode("utf-8") + struct.pack("<d", float(lp)))
        ) % (2**63)
    return acc


def save_unigram_vocab(spark, vocab: UnigramVocab, path: str) -> None:
    """Persist the model as a (piece, logp) parquet table plus a
    one-row meta table (max_piece_len + a value fingerprint of the
    pieces) — meta written LAST, the torn-save discipline shared with
    the quality classifier artifact."""
    rows = sorted(vocab.logp.items())
    spark.createDataFrame(
        rows, "piece string, logp double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pieces")
    spark.createDataFrame(
        [(int(vocab.max_piece_len), len(rows), _vocab_fingerprint(rows))],
        "max_piece_len int, n_pieces int, vfp long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_unigram_vocab(spark, path: str) -> UnigramVocab:
    m = spark.read.parquet(f"{path}/meta").first()
    rows = spark.read.parquet(f"{path}/pieces").collect()
    pairs = [(r["piece"], float(r["logp"])) for r in rows]
    torn = len(rows) != int(m["n_pieces"])
    if not torn and "vfp" in set(m.asDict().keys()):
        torn = _vocab_fingerprint(pairs) != int(m["vfp"])
    if torn:
        raise ValueError(
            f"load_unigram_vocab: {path} is torn — pieces don't match "
            "meta (crashed mid re-save?); re-save the model"
        )
    return UnigramVocab(
        logp=dict(pairs),
        max_piece_len=int(m["max_piece_len"]),
    )


def unigram_encode(
    docs: DataFrame,
    vocab: UnigramVocab,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    lowercase: bool = True,
    out_tokens: str = "ulm_tokens",
    out_count: str = "ulm_n_tokens",
) -> DataFrame:
    """(id..., ulm_tokens array<string>, ulm_n_tokens) — Arrow-batched
    Viterbi encode with the vocabulary shipped in the task closure and
    the SAME bounded per-task word→pieces cache as bpe_encode (words
    ≤32 chars, reset at the cap — Zipf text hits the cache almost
    always; high-cardinality text cannot grow a task past a fixed
    ceiling)."""
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
    lower = lowercase

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _CACHE_CAP = 1 << 18
        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = viterbi_encode_word(word, vocab)
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
