"""PII redaction column expressions for document pipelines.

A 100 TB pre-training corpus is scrubbed of personally identifiable
information before anything downstream sees it. The hot path must be
pure Column expressions (JVM regex inside whole-stage codegen — no
Python per row), and the patterns must be portable across engines
(Java regex AND RE2) so the DuckDB oracle can replay them: no
lookaround, no backreferences, only non-capturing groups.

Patterns are applied IN ORDER — email first (its local part may
contain dots/digits that the later numeric patterns would chew on),
then IPv4, then SSN-shaped ids, then international-format phones.
Counts are taken against the ORIGINAL text with the same patterns;
the shipped pattern set is mutually non-overlapping on any one span
(an email match can't also be an IPv4 match, etc.), so count-then-
redact equals redact-incrementally.

This is the regex tier of PII removal: deterministic, cheap, and the
shape real pipelines run at scale (an NER-model tier would slot in as
an Arrow-batched mapInPandas AFTER this pass, exactly like the codec
seam in operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters; see module docstring.
# Every pattern is valid and equivalent under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b, (?:...).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+[0-9]{1,3}(?:-[0-9]{2,4}){2,3}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace every PII span with its typed placeholder.

    One nested regexp_replace tree — a single codegen'd projection,
    zero shuffles, no Python. Scale cost is O(bytes scanned) on the
    map side, which is the floor for any scrubber.
    """
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type PII match counts on the raw text (audit columns)."""
    return {
        name: F.regexp_count(text, F.lit(pattern))
        for name, pattern, _ in PII_PATTERNS
    }


def has_pii(text: Column) -> Column:
    """True if any PII pattern matches — the cheap pre-filter: at scale,
    route only matching docs through the (future) model-tier scrubber."""
    flags = [F.regexp_like(text, F.lit(p)) for _, p, _ in PII_PATTERNS]
    out = flags[0]
    for f in flags[1:]:
        out = out | f
    return out


def redact_sql(x: str) -> str:
    """The DuckDB-equivalent redaction expression (oracle side).

    DuckDB regexp_replace is first-match-only by default — the 'g'
    flag makes it global like Spark's.
    """
    out = x
    for _, pattern, repl in PII_PATTERNS:
        sql_pat = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}', 'g')"
    return out


def counts_sql(x: str) -> dict[str, str]:
    """DuckDB per-type count expressions matching pii_counts."""
    return {
        name: f"len(regexp_extract_all({x}, '{pattern}'))"
        for name, pattern, _ in PII_PATTERNS
    }
