"""Tokenizer artifact interop: the Hugging Face ``tokenizer.json``
shape for the repo's trained BPE merges and unigram-LM vocabularies.

The parquet artifacts (operators/bpe.save_merges,
operators/unigram_lm.save_unigram_vocab) are the pipeline-internal
form — torn-save-guarded, Spark-readable. This module serializes the
SAME bit-stable models into the single-file JSON layout the
``tokenizers`` library ships (`model.type: "BPE"` with vocab+merges /
`model.type: "Unigram"` with [piece, logprob] rows), so a trained
tokenizer can move between this engine and the public ecosystem
without re-training.

Fidelity notes, stated plainly:

- ``bpe_to_tokenizer_json`` is the subword-nmt posture: the
  end-of-word marker (``bpe.EOW``) rides as an ORDINARY symbol at the
  end of each word's symbol sequence, not as HF's fused
  ``end_of_word_suffix``. The emitted file records
  ``end_of_word_suffix: null`` and includes the marker in the vocab;
  round-tripping through THIS module reproduces the exact merge list
  (and therefore identical encodes). A foreign HF tokenizer consuming
  the file sees a well-formed BPE model whose marker is an explicit
  token.
- ``byte_bpe_to_tokenizer_json`` / ``tokenizer_json_to_byte_bpe``
  (r13) carry the byte-level GPT-2/tiktoken family
  (operators/byte_bpe.py): ``ByteLevel`` pre_tokenizer + decoder, no
  UNK, no EOW, the artifact's vocab ids preserved VERBATIM on import
  (a published file's id assignment is the model — re-deriving ids
  from position would silently re-map every token).
- Unigram log-probabilities serialize through Python ``json`` float
  repr, which round-trips IEEE-754 doubles exactly — the reloaded
  model is bit-identical (asserted via the artifact fingerprint).
- ``wordpiece_to_tokenizer_json`` / ``tokenizer_json_to_wordpiece``
  (r13) carry the BERT family (operators/wordpiece.py): model.type
  "WordPiece" with unk_token / continuing_subword_prefix /
  max_input_chars_per_word, ids verbatim both ways; BERT's bracket
  specials live inside the model vocab, so ``added_tokens`` is only
  for extras. The lowercase flag is encode-time (a normalizer
  concern in HF files), not model schema — stated at the import
  signature.
- ``max_piece_len`` (a runtime lattice cap, not part of the HF
  schema) is recomputed on load as the longest piece — exact, since
  the cap only has to dominate every real piece.

Serialization is deterministic (sorted keys, fixed separators,
trailing newline) so artifact bytes are reproducible and diffable.
"""

from __future__ import annotations

import json

from cod_stats_spark.operators.bpe import EOW
from cod_stats_spark.operators.unigram_lm import UnigramVocab

__all__ = [
    "bpe_to_tokenizer_json",
    "tokenizer_json_to_bpe",
    "byte_bpe_to_tokenizer_json",
    "tokenizer_json_to_byte_bpe",
    "unigram_to_tokenizer_json",
    "tokenizer_json_to_unigram",
    "wordpiece_to_tokenizer_json",
    "tokenizer_json_to_wordpiece",
    "special_tokens_from_json",
    "write_tokenizer_json",
    "read_tokenizer_json",
]

def _shell() -> dict:
    """A FRESH document shell per export — a module-level constant's
    ``added_tokens`` list would be shared by reference into every
    returned document, so a caller appending a special token to one
    export would silently mutate all later ones."""
    return {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [],
        "normalizer": None,
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "post_processor": None,
        "decoder": None,
    }


def _added_tokens(
    special_tokens: "list[str] | None",
    next_id: int,
    model_vocab: "set[str] | None" = None,
) -> list[dict]:
    """The ``added_tokens`` section: one entry per special token with
    ids continuing past the model vocab (the HF convention —
    ``<pad>``/``<bos>``/``<eos>`` live OUTSIDE the trained model, so
    a retrained model with a different vocab size renumbers them but
    never collides with them). A special token duplicated in the list
    or colliding with a model piece would give one content string two
    ids — rejected loudly, the module's malformed-shape posture."""
    toks = special_tokens or []
    if len(set(toks)) != len(toks):
        raise ValueError(
            "tokenizer_io: duplicate special tokens"
        )
    clash = sorted(set(toks) & (model_vocab or set()))
    if clash:
        raise ValueError(
            f"tokenizer_io: special tokens collide with model vocab "
            f"pieces: {clash}"
        )
    out = []
    for i, tok in enumerate(toks):
        out.append(
            {
                "id": next_id + i,
                "content": tok,
                "single_word": False,
                "lstrip": False,
                "rstrip": False,
                "normalized": False,
                "special": True,
            }
        )
    return out


def special_tokens_from_json(doc: dict) -> dict[str, int]:
    """content → id for the document's special tokens — what a loader
    needs to reserve rows in an embedding table and what
    ``encode_ids`` callers append to their vocab (the packer treats
    them as ordinary pieces once ids are assigned)."""
    return {
        t["content"]: int(t["id"])
        for t in doc.get("added_tokens", [])
        if t.get("special")
    }


def bpe_to_tokenizer_json(
    merges: list[tuple[str, str]],
    unk_token: str | None = None,
    alphabet: "set[str] | None" = None,
    special_tokens: "list[str] | None" = None,
) -> dict:
    """Rank-ordered merges → the HF BPE model document. The vocab is
    derived deterministically: base symbols sorted, then merge
    products in rank order — id = position.

    ``alphabet``: the training corpus's character set (e.g.
    ``{c for w, _ in counts for c in w}``). Merges alone cannot see a
    character that never participated in a merge — yet
    ``encode_word`` emits such characters as standalone symbols, so
    WITHOUT the alphabet the exported vocab cannot cover every
    producible token and a consumer encoding rare words hits unknown
    symbols. Pass it whenever the counts are available; the
    merge-derived base remains for artifacts where they are not."""
    for a, b in merges:
        if " " in a or " " in b:
            # the classic merges serialization is the space-joined
            # "a b" line; a space inside a symbol would be unparseable
            raise ValueError(
                f"bpe_to_tokenizer_json: symbol contains a space: "
                f"{(a, b)!r}"
            )
    products = [a + b for a, b in merges]
    if len(set(products)) != len(products):
        # distinct merges can yield the same product string — ('a','bc')
        # and ('ab','c') both make 'abc'; real BPE training can emit
        # this. Position-derived ids would then leave a GAP in the
        # vocab (max id == len(vocab)), so a special/unk token appended
        # at next_id silently shares an id with the last model piece —
        # exactly the two-strings-one-id malformation this module
        # promises to reject loudly.
        seen: set[str] = set()
        dups = sorted({p for p in products if p in seen or seen.add(p)})
        raise ValueError(
            f"bpe_to_tokenizer_json: duplicate merge products {dups} — "
            "two merge rules yield the same symbol string, so "
            "position-derived ids cannot be bijective"
        )
    produced = set(products)
    base = {EOW}
    for a, b in merges:
        if a not in produced:
            base.add(a)
        if b not in produced:
            base.add(b)
    if alphabet:
        for ch in alphabet:
            if " " in ch:
                raise ValueError(
                    f"bpe_to_tokenizer_json: alphabet symbol contains a "
                    f"space: {ch!r}"
                )
            if ch not in produced:
                base.add(ch)
    symbols = sorted(base) + products
    if len(set(symbols)) != len(symbols):
        # base excludes merge products by construction, so the only
        # way here is a product colliding with the unconditional EOW
        # base symbol (e.g. merges ('</', 'w>')) — same bijectivity
        # hazard as duplicate products
        raise ValueError(
            "bpe_to_tokenizer_json: a merge product collides with a "
            "base symbol — the position-derived vocab would give one "
            "string two ids"
        )
    vocab = {s: i for i, s in enumerate(symbols)}
    if unk_token is not None and unk_token not in vocab:
        vocab[unk_token] = len(vocab)
    shell = _shell()
    shell["added_tokens"] = _added_tokens(
        special_tokens, len(vocab), set(vocab)
    )
    return {
        **shell,
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": unk_token,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "vocab": vocab,
            "merges": [f"{a} {b}" for a, b in merges],
        },
    }


def tokenizer_json_to_bpe(doc: dict) -> list[tuple[str, str]]:
    """The inverse: rank-ordered merge pairs from a BPE tokenizer
    document. Accepts both public merge spellings — ``"a b"`` strings
    and ``["a", "b"]`` pairs."""
    model = doc.get("model") or {}
    if model.get("type") != "BPE":
        raise ValueError(
            f"tokenizer_json_to_bpe: model.type is {model.get('type')!r},"
            " expected 'BPE'"
        )
    return [_parse_merge(m) for m in model.get("merges", [])]


def _parse_merge(m) -> tuple[str, str]:
    """One merge entry in either public spelling — the space-joined
    ``"a b"`` string or the ``["a", "b"]`` pair."""
    if isinstance(m, str):
        a, sep, b = m.partition(" ")
        if not sep or not a or not b or " " in b:
            raise ValueError(f"tokenizer_io: unparseable merge {m!r}")
        return a, b
    a, b = m
    return str(a), str(b)


def byte_bpe_to_tokenizer_json(
    tok, special_tokens: "list[str] | None" = None
) -> dict:
    """A :class:`operators.byte_bpe.ByteBPETokenizer` → the HF
    document the GPT-2/tiktoken family publishes: ``pre_tokenizer``
    and ``decoder`` of type ``ByteLevel``, no UNK (the byte alphabet
    is total), no EOW, the tokenizer's OWN vocab ids verbatim (never
    re-derived — the file's id assignment is the model). The
    tokenizer's ``special_tokens`` ride ``added_tokens`` WITH THEIR
    STORED IDS (same verbatim rule — dropping or renumbering them
    would break an import→export round trip; r13 review);
    ``special_tokens`` here appends EXTRA tokens beyond those."""
    shell = _shell()
    shell["pre_tokenizer"] = {
        "type": "ByteLevel",
        "add_prefix_space": False,
        "trim_offsets": True,
        "use_regex": True,
    }
    shell["decoder"] = {"type": "ByteLevel"}
    carried = [
        {
            "id": int(i),
            "content": s,
            "single_word": False,
            "lstrip": False,
            "rstrip": False,
            "normalized": False,
            "special": True,
        }
        for s, i in sorted(
            getattr(tok, "special_tokens", {}).items(), key=lambda kv: kv[1]
        )
    ]
    all_ids = list(tok.vocab.values()) + [t["id"] for t in carried]
    extra = _added_tokens(
        [t for t in (special_tokens or [])
         if t not in {c["content"] for c in carried}],
        (max(all_ids) + 1) if all_ids else 0,
        set(tok.vocab) | {c["content"] for c in carried},
    )
    shell["added_tokens"] = carried + extra
    return {
        **shell,
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": None,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "vocab": dict(tok.vocab),
            "merges": [f"{a} {b}" for a, b in tok.merges],
        },
    }


def _has_byte_level(pre) -> bool:
    if not isinstance(pre, dict):
        return False
    if pre.get("type") == "ByteLevel":
        return True
    if pre.get("type") == "Sequence":
        return any(
            _has_byte_level(p) for p in pre.get("pretokenizers", [])
        )
    return False


def tokenizer_json_to_byte_bpe(doc: dict):
    """The inverse: a GPT-2-shaped document →
    :class:`operators.byte_bpe.ByteBPETokenizer`, preserving the
    file's vocab ids. Requires a ``ByteLevel`` pre_tokenizer (direct
    or inside a Sequence) — importing a whitespace-family file here
    would silently change tokenization semantics; that family goes
    through :func:`tokenizer_json_to_bpe`. The constructor validates
    byte-alphabet coverage and merge-symbol closure (no-UNK total
    encodability)."""
    from cod_stats_spark.operators.byte_bpe import ByteBPETokenizer

    model = doc.get("model") or {}
    if model.get("type") != "BPE":
        raise ValueError(
            f"tokenizer_json_to_byte_bpe: model.type is "
            f"{model.get('type')!r}, expected 'BPE'"
        )
    if not _has_byte_level(doc.get("pre_tokenizer")):
        raise ValueError(
            "tokenizer_json_to_byte_bpe: document has no ByteLevel "
            "pre_tokenizer — use tokenizer_json_to_bpe for the "
            "whitespace/EOW family"
        )
    merges = [_parse_merge(m) for m in model.get("merges", [])]
    vocab = {str(s): int(i) for s, i in (model.get("vocab") or {}).items()}
    return ByteBPETokenizer(
        merges=merges,
        vocab=vocab,
        special_tokens=special_tokens_from_json(doc),
    )


def unigram_to_tokenizer_json(
    vocab: UnigramVocab,
    unk_id: int | None = None,
    special_tokens: "list[str] | None" = None,
) -> dict:
    """Piece → log-prob map → the HF Unigram model document
    (``vocab: [[piece, logprob], …]``, canonical piece order)."""
    shell = _shell()
    shell["added_tokens"] = _added_tokens(
        special_tokens, len(vocab.logp), set(vocab.logp)
    )
    return {
        **shell,
        "model": {
            "type": "Unigram",
            "unk_id": unk_id,
            "byte_fallback": False,
            "vocab": [
                [p, float(vocab.logp[p])] for p in vocab.pieces
            ],
        },
    }


def tokenizer_json_to_unigram(doc: dict) -> UnigramVocab:
    model = doc.get("model") or {}
    if model.get("type") != "Unigram":
        raise ValueError(
            f"tokenizer_json_to_unigram: model.type is "
            f"{model.get('type')!r}, expected 'Unigram'"
        )
    pairs = [(str(p), float(lp)) for p, lp in model.get("vocab", [])]
    if not pairs:
        raise ValueError("tokenizer_json_to_unigram: empty vocab")
    if len({p for p, _ in pairs}) != len(pairs):
        raise ValueError("tokenizer_json_to_unigram: duplicate pieces")
    return UnigramVocab(
        logp=dict(pairs),
        max_piece_len=max(len(p) for p, _ in pairs),
    )


def wordpiece_to_tokenizer_json(
    vocab, special_tokens: "list[str] | None" = None
) -> dict:
    """A :class:`operators.wordpiece.WordPieceVocab` → the HF
    WordPiece model document (the BERT family: ``unk_token``,
    ``continuing_subword_prefix``, ``max_input_chars_per_word``,
    ``vocab`` token→id). The vocab's OWN ids ride verbatim (the
    byte-BPE discipline); BERT's [PAD]/[UNK]/[CLS]/[SEP]/[MASK] live
    INSIDE the model vocab, so ``special_tokens`` here is only for
    EXTRA added tokens beyond it (collision-checked). The lowercase
    flag rides the HF ``normalizer`` field (a Lowercase normalizer —
    how BERT-uncased files actually carry it), so a round trip
    cannot silently flip a cased model to lowercasing (r13
    review)."""
    shell = _shell()
    if vocab.lowercase:
        shell["normalizer"] = {"type": "Lowercase"}
    next_id = max(vocab.vocab.values()) + 1
    shell["added_tokens"] = _added_tokens(
        special_tokens, next_id, set(vocab.vocab)
    )
    return {
        **shell,
        "model": {
            "type": "WordPiece",
            "unk_token": vocab.unk_token,
            "continuing_subword_prefix": vocab.continuing_prefix,
            "max_input_chars_per_word": int(vocab.max_input_chars),
            "vocab": dict(vocab.vocab),
        },
    }


def _normalizer_lowercases(norm) -> bool:
    """True when the document's normalizer lowercases: a bare
    Lowercase, a BertNormalizer with lowercase on (its HF default),
    or either inside a Sequence."""
    if not isinstance(norm, dict):
        return False
    t = norm.get("type")
    if t == "Lowercase":
        return True
    if t == "BertNormalizer":
        return bool(norm.get("lowercase", True))
    if t == "Sequence":
        return any(
            _normalizer_lowercases(n) for n in norm.get("normalizers", [])
        )
    return False


def tokenizer_json_to_wordpiece(doc: dict, lowercase: bool | None = None):
    """The inverse: a published WordPiece file's vocab with its ids
    PRESERVED VERBATIM (re-deriving ids from position would silently
    re-map every token). ``lowercase`` defaults to what the
    document's NORMALIZER says (Lowercase / BertNormalizer — how
    BERT-uncased files carry it; cased files have none and get
    False), so a round trip through the export above preserves the
    flag; pass an explicit bool to override. Malformed shapes (wrong
    type, empty vocab, duplicate ids, an unk_token missing from the
    vocab) are rejected loudly."""
    from cod_stats_spark.operators.wordpiece import WordPieceVocab

    model = doc.get("model") or {}
    if model.get("type") != "WordPiece":
        raise ValueError(
            f"tokenizer_json_to_wordpiece: model.type is "
            f"{model.get('type')!r}, expected 'WordPiece'"
        )
    v = {str(p): int(i) for p, i in (model.get("vocab") or {}).items()}
    if not v:
        raise ValueError("tokenizer_json_to_wordpiece: empty vocab")
    if lowercase is None:
        lowercase = _normalizer_lowercases(doc.get("normalizer"))
    return WordPieceVocab(
        vocab=v,
        unk_token=str(model.get("unk_token") or "[UNK]"),
        continuing_prefix=str(
            model.get("continuing_subword_prefix") or "##"
        ),
        max_input_chars=int(model.get("max_input_chars_per_word") or 100),
        lowercase=lowercase,
    )


def write_tokenizer_json(path: str, doc: dict) -> None:
    """Deterministic bytes: sorted keys, fixed separators, trailing
    newline — rewriting an unchanged model is a byte no-op."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, sort_keys=True,
                  separators=(",", ":"))
        f.write("\n")


def read_tokenizer_json(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)
