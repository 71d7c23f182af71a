"""HTML → text extraction for web-crawl curation funnels.

Every public pre-training pipeline this extension surface mirrors
(C4 — Raffel et al. 2020 JMLR; RefinedWeb; CCNet) STARTS from markup:
the crawl's payload is HTML, and the text stack downstream (quality,
dedup, decontamination) assumes extracted plain text. This module is
that stage zero, in the repo's portable-regex discipline
(functions/redact.py): pure Column expressions — JVM regex inside
whole-stage codegen, no Python per row — with every pattern valid and
equivalent under Java regex (Spark) AND RE2 (DuckDB): inline
``(?is)`` flags, non-greedy repetition, character classes; no
lookaround, no backreferences. The SQL builders regenerate the DuckDB
replay from the SAME constants, so pattern drift fails the oracle
gate loudly instead of desynchronizing silently.

Extraction order (each step creates the preconditions for the next):

0. collapse source whitespace (including newlines) to single spaces —
   in markup, a source line break is insignificant whitespace; ONLY
   block-structure tags create lines (this deliberately flattens
   ``<pre>`` content too — a known approximation);
1. remove non-content blocks whole — ``<script>``/``<style>`` with
   their bodies, HTML comments (their content is code, not text);
2. turn block-structure boundaries (``<br>``, ``</p>``, ``</div>``,
   ``</li>``, headings, table rows …) into newlines, so the
   line-level heuristics below see the document's visual lines;
3. strip every remaining tag (inline markup) to a space;
4. decode the common named/numeric entities — ``&amp;`` LAST, so
   ``&amp;lt;`` decodes to the literal ``&lt;`` and not to ``<``
   (tags are already gone by now, so a decoded ``<`` can never be
   re-eaten as markup);
5. normalize whitespace per line and drop empty lines.

Line-level cleaning then applies the C4 rules (Raffel et al. 2020,
§2.2): keep a line only if it ends in a terminal punctuation mark,
has at least ``min_words`` words, and contains no boilerplate phrase
(the published list starts from "javascript"; the default here adds
the footer phrases every crawl accumulates). Documents whose every
line dies are dropped by the funnel stage (plans/curation.py).

Scale shape: one codegen'd projection over the payload bytes — the
same O(bytes) map-side floor as redact_pii; no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: non-content blocks removed WITH their bodies, before anything else
STRIP_PATTERNS: list[tuple[str, str]] = [
    ("script", r"(?is)<script[^>]*>.*?</script>"),
    ("style", r"(?is)<style[^>]*>.*?</style>"),
    ("comment", r"(?s)<!--.*?-->"),
]

#: block-structure boundaries that become line breaks
BLOCK_BREAK_PATTERN = (
    r"(?i)<(?:br|hr)\s*/?>"
    r"|</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|pre"
    r"|section|article|header|footer)\s*>"
)

#: any remaining tag (inline markup) — stripped to a space
TAG_PATTERN = r"(?s)<[^>]+>"

#: entity decode table, applied IN ORDER — ``&amp;`` must be last
#: (module docstring, step 4). A bounded literal subset on purpose:
#: numeric code points beyond these would need chr() arithmetic that
#: a regexp_replace chain cannot express; the common-crawl long tail
#: is overwhelmingly these eight.
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

#: a kept line must end in terminal punctuation (optionally closed by
#: a quote/bracket) — the C4 sentence heuristic
TERMINAL_PATTERN = r"[.!?][\"')\]]?$"

#: lines containing any of these (case-insensitive) are boilerplate
DEFAULT_BOILERPLATE: list[str] = [
    "javascript",
    "lorem ipsum",
    "all rights reserved",
    "terms of service",
    "privacy policy",
    "cookie policy",
]

DEFAULT_MIN_WORDS = 5

_WS = r"\s+"


def html_to_text(col: Column | str) -> Column:
    """Markup → newline-delimited plain text (extraction steps 1–4).

    One nested regexp_replace tree — a single codegen'd projection.
    Line-level cleanup is :func:`kept_lines` / :func:`extract_text`.
    """
    out = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(out, _WS, " ")
    for _, pattern in STRIP_PATTERNS:
        out = F.regexp_replace(out, pattern, " ")
    out = F.regexp_replace(out, BLOCK_BREAK_PATTERN, "\n")
    out = F.regexp_replace(out, TAG_PATTERN, " ")
    for entity, ch in ENTITIES:
        out = F.regexp_replace(out, entity, ch)
    return out


def normalized_lines(text: Column | str) -> Column:
    """Non-empty, whitespace-normalized lines (array<string>).

    The denominator for line-survival metrics: ``size()`` of this
    minus ``size()`` of :func:`kept_lines` = boilerplate lines
    dropped."""
    t = F.col(text) if isinstance(text, str) else text
    norm = F.transform(
        F.split(t, "\n"),
        lambda ln: F.trim(F.regexp_replace(ln, _WS, " ")),
    )
    return F.filter(norm, lambda ln: ln != F.lit(""))


def _keep_condition(
    ln: Column,
    min_words: int,
    require_terminal: bool,
    blocklist: list[str],
) -> Column:
    cond = F.size(F.split(ln, " ")) >= F.lit(int(min_words))
    if require_terminal:
        cond = cond & ln.rlike(TERMINAL_PATTERN)
    low = F.lower(ln)
    for phrase in blocklist:
        cond = cond & ~low.contains(phrase.lower())
    return cond


def kept_lines(
    text: Column | str,
    min_words: int = DEFAULT_MIN_WORDS,
    require_terminal: bool = True,
    blocklist: list[str] | None = None,
) -> Column:
    """The C4 line filter over :func:`normalized_lines` (step 5 +
    cleaning rules; array<string>)."""
    bl = DEFAULT_BOILERPLATE if blocklist is None else blocklist
    return F.filter(
        normalized_lines(text),
        lambda ln: _keep_condition(ln, min_words, require_terminal, bl),
    )


def extract_text(
    html: Column | str,
    min_words: int = DEFAULT_MIN_WORDS,
    require_terminal: bool = True,
    blocklist: list[str] | None = None,
) -> Column:
    """The whole stage: markup in, cleaned newline-joined text out.
    Documents with no surviving line come back as ``''`` — the funnel
    drops those (a length-0 gate, same convention as the ExactSubstr
    scrub)."""
    return F.array_join(
        kept_lines(
            html_to_text(html), min_words, require_terminal, blocklist
        ),
        "\n",
    )


# --- DuckDB replay builders (same constants, oracle side) ---------


def _sq(s: str) -> str:
    return s.replace("'", "''")


def html_to_text_sql(expr: str) -> str:
    """DuckDB expression equivalent to :func:`html_to_text` — the
    same patterns in the same order ('g' flag: DuckDB regexp_replace
    is first-match-only by default)."""
    out = f"regexp_replace({expr}, '{_sq(_WS)}', ' ', 'g')"
    for _, pattern in STRIP_PATTERNS:
        out = f"regexp_replace({out}, '{_sq(pattern)}', ' ', 'g')"
    out = (
        f"regexp_replace({out}, '{_sq(BLOCK_BREAK_PATTERN)}', chr(10), 'g')"
    )
    out = f"regexp_replace({out}, '{_sq(TAG_PATTERN)}', ' ', 'g')"
    for entity, ch in ENTITIES:
        out = f"regexp_replace({out}, '{_sq(entity)}', '{_sq(ch)}', 'g')"
    return out


def normalized_lines_sql(expr: str) -> str:
    return (
        "list_filter(list_transform(string_split("
        f"{expr}, chr(10)), ln -> trim(regexp_replace(ln, '{_sq(_WS)}', ' ', 'g'))), "
        "ln -> ln <> '')"
    )


def _keep_condition_sql(
    min_words: int, require_terminal: bool, blocklist: list[str]
) -> str:
    parts = [f"len(string_split(ln, ' ')) >= {int(min_words)}"]
    if require_terminal:
        parts.append(f"regexp_matches(ln, '{_sq(TERMINAL_PATTERN)}')")
    for phrase in blocklist:
        parts.append(f"NOT contains(lower(ln), '{_sq(phrase.lower())}')")
    return " AND ".join(parts)


def kept_lines_sql(
    expr: str,
    min_words: int = DEFAULT_MIN_WORDS,
    require_terminal: bool = True,
    blocklist: list[str] | None = None,
) -> str:
    bl = DEFAULT_BOILERPLATE if blocklist is None else blocklist
    cond = _keep_condition_sql(min_words, require_terminal, bl)
    return f"list_filter({normalized_lines_sql(expr)}, ln -> {cond})"


def extract_text_sql(
    expr: str,
    min_words: int = DEFAULT_MIN_WORDS,
    require_terminal: bool = True,
    blocklist: list[str] | None = None,
) -> str:
    # DuckDB's array_to_string([]) is NULL where Spark's array_join
    # is '' — coalesce behind an explicit null-in-null-out guard so
    # both engines agree on ALL of (null, '', no-survivor) inputs
    joined = (
        "array_to_string("
        + kept_lines_sql(
            html_to_text_sql(expr), min_words, require_terminal, blocklist
        )
        + ", chr(10))"
    )
    return (
        f"(CASE WHEN {expr} IS NULL THEN NULL "
        f"ELSE coalesce({joined}, '') END)"
    )
