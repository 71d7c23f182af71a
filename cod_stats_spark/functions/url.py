"""URL / domain curation operators — the public-pipeline staple for
provenance-aware corpus work (C4/RefinedWeb-style pipelines gate and
mix by source domain before any content filter runs).

Everything here is PURE Column arithmetic (string functions — zero
shuffles for the projections, one groupBy for the per-domain rollup),
and every operator has a same-logic DuckDB SQL builder generated from
the SAME embedded constants (the functions/redact.py single-source
discipline), so the whole family is value-verifiable by the oracle
gates.

- :func:`url_host` — canonical host from an absolute http(s) URL:
  ``parse_url(HOST)``, lowercased, leading ``www.`` and trailing dot
  stripped. Null for null/relative/schemeless input.
- :func:`registered_domain` — eTLD+1 approximation: last two labels,
  or last three when the two-label tail is a known multi-part suffix
  (an EMBEDDED subset of the Public Suffix List — the common
  country-code second-level and platform suffixes; a deployment that
  needs the full PSL swaps :data:`MULTI_SUFFIXES` for the published
  list, the logic is unchanged. Approximation documented, not hidden).
- :func:`domain_matches` — blocklist/allowlist membership with
  subdomain semantics (``host == d`` or ``host`` ends with ``.d``) as
  a literal predicate for bounded lists; :func:`domain_gate` adds the
  broadcast-join path for lists too large to inline (the
  quality-classifier relation-path convention).
- :func:`domain_stats` — per-registered-domain corpus rollup (doc
  count, char mass, mean quality) — the table a mixture/sampling
  stage keys on (operators/sampling.mixture_sample).

Reference: the reference tracks per-source provenance only as the
config-seeded platform tag (frontend/generate_lookup_data.sh's player
platform field); content-domain curation is part of the LLM-pipeline
extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Embedded multi-part public-suffix subset: the two-label tails that
#: do NOT own registrations themselves, so the registered domain is
#: one label deeper. Sorted for deterministic generated SQL.
MULTI_SUFFIXES = sorted(
    [
        "ac.uk", "co.uk", "gov.uk", "org.uk",
        "co.jp", "ne.jp", "or.jp",
        "com.au", "net.au", "org.au",
        "co.nz", "co.in", "co.za", "co.kr",
        "com.br", "com.cn", "com.mx", "com.sg", "com.tr", "com.ar",
        # platform ("private section") suffixes: every subdomain is an
        # independent publisher
        "blogspot.com", "github.io", "wordpress.com",
    ]
)

def _suffix_alt(s: str) -> str:
    """One alternation branch per suffix rule: dots become ``[.]``;
    a leading ``*.`` (PSL wildcard — every label at that position is
    its own suffix) becomes a label matcher."""
    if s.startswith("*."):
        return "[^.]+[.]" + s[2:].replace(".", "[.]")
    return s.replace(".", "[.]")


def multi_suffix_pattern(suffixes: list[str]) -> str:
    """The registered-domain capture for multi-part suffix tails,
    built from any suffix rule list (embedded subset or a loaded
    PSL). Longer rules first so a 3-label rule wins over a 2-label
    prefix of it (regex alternation is first-match)."""
    ordered = sorted(
        set(suffixes), key=lambda s: (-s.count("."), s)
    )
    alt = "|".join(_suffix_alt(s) for s in ordered)
    return f"([^.]+[.](?:{alt}))$"


def exception_pattern(exceptions: list[str]) -> str:
    """PSL exception rules (``!www.ck``): the rule itself IS the
    registered domain for any host at or under it."""
    alt = "|".join(s.replace(".", "[.]") for s in sorted(set(exceptions)))
    return f"(?:^|[.])((?:{alt}))$"


#: rule-set size past which DataFrame-level operators derive the
#: registered domain via the broadcast-join lookup instead of the
#: generated alternation (Java regex scans branches linearly —
#: SCALING.md r12; the encode_ids dual-path convention)
_REGEX_RULE_LIMIT = 64

#: capture the registered domain when the tail is a multi-part suffix
PAT_MULTI = multi_suffix_pattern(MULTI_SUFFIXES)
#: plain two-label tail
PAT_TWO = "([^.]+[.][^.]+)$"
#: host = authority of an absolute http(s) URL, minus userinfo/port.
#: Scheme is case-insensitive ((?i) — Java and RE2 both honor the
#: inline flag); any other scheme yields null. BOTH engines run this
#: exact pattern (Spark regexp_extract, not parse_url, precisely so
#: the oracle replay is the same extraction by construction —
#: parse_url accepts non-http schemes and is case-sensitive, which
#: made Spark and DuckDB disagree on 'HTTPS://…' and 'ftp://…').
_HOST_PAT = "(?i)^https?://(?:[^/@]*@)?([^/:?#]+)"


def url_host(url: Column | str, strip_www: bool = True) -> Column:
    """Canonical host: lowercase, no leading ``www.``, no trailing
    dot. Null when the URL has no parseable http(s) host.

    ``strip_www=False`` keeps the ``www.`` label — required when the
    host feeds :func:`registered_domain` with a loaded PSL whose
    exception rules are www-anchored (the real list's ``!www.ck``):
    the default canonicalization erases the label the exception
    matches on, so ``https://www.ck/x`` would key to the bare public
    suffix instead of the registrable ``www.ck``."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, _HOST_PAT, 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r"\.$", "")
    return F.when(host != "", host)


def url_host_sql(expr: str, strip_www: bool = True) -> str:
    """DuckDB replay of :func:`url_host` — the identical regex (the
    module's single-source discipline)."""
    h = f"lower(regexp_extract({expr}, '{_HOST_PAT}', 1))"
    if strip_www:
        h = f"regexp_replace({h}, '^www\\.', '')"
    h = f"regexp_replace({h}, '\\.$', '')"
    return f"nullif({h}, '')"


def load_public_suffixes(
    src: str, include_private: bool = True
) -> tuple[list[str], list[str]]:
    """Parse the published Public Suffix List (the
    ``public_suffix_list.dat`` format: ``//`` comment lines, blank
    lines, one rule per line, ``*.`` wildcards, ``!`` exceptions,
    ICANN and PRIVATE sections) into the constants
    :func:`registered_domain` consumes: ``(multi_suffixes,
    exceptions)``.

    ``src`` is a file path or the list text itself. Single-label
    rules (``com``) are dropped — the two-label fallback already
    implements them, and the PSL's implicit ``*`` default rule is the
    same fallback. ``include_private=False`` stops at the PRIVATE
    section marker (ICANN-only semantics — platform suffixes like
    blogspot.com no longer split).

    Scale note, MEASURED (r12): a full-PSL alternation is a
    ~10⁴-branch regex. RE2 (the DuckDB oracle side) compiles it to a
    DFA, but Java regex scans branches linearly — ~1.7 ms/host at
    9,500 rules on this box — so the Column path
    (:func:`registered_domain`) is for the embedded subset and
    SQL-replayable oracles; feed a full loaded rule set to
    :func:`with_registered_domain`, whose broadcast-join lookup costs
    a few hash probes per row instead. The embedded
    :data:`MULTI_SUFFIXES` subset stays the default; this loader is
    the documented swap seam, now a function instead of a hand
    edit."""
    import os

    text = src
    if "\n" not in src and os.path.exists(src):
        with open(src, encoding="utf-8") as f:
            text = f.read()
    suffixes: list[str] = []
    exceptions: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("//"):
            if not include_private and "===BEGIN PRIVATE DOMAINS===" in line:
                break
            continue
        rule = line.split()[0].lower()
        is_exc = rule.startswith("!")
        core = rule[1:] if is_exc else rule
        if is_exc and "*" in core:
            # a wildcard EXCEPTION has no published semantics (the PSL
            # spec's exceptions are literal) and its '*' would splice a
            # dangling metacharacter into exception_pattern — skip
            continue
        if core.startswith("*."):
            core = core[2:]
        # defensive: a malformed rule with regex metacharacters would
        # corrupt the generated alternation — skip, never splice
        # (exception rules splice into exception_pattern the same way)
        if not all(c.isalnum() or c in ".-" for c in core.replace(".", "")):
            continue
        if is_exc:
            exceptions.append(rule[1:])
        elif "." in rule:
            suffixes.append(rule)
    return suffixes, exceptions


def registered_domain(
    host: Column | str,
    suffixes: list[str] | None = None,
    exceptions: list[str] | None = None,
) -> Column:
    """eTLD+1 under the embedded suffix subset (see module doc), or
    under a full rule set from :func:`load_public_suffixes`. PSL
    exception rules are checked first (the rule itself is the
    registered domain), then multi-part suffixes (longest rule wins),
    then the two-label fallback. A dotless host (``localhost``) maps
    to itself; null stays null."""
    h = F.col(host) if isinstance(host, str) else host
    pat_multi = (
        PAT_MULTI if suffixes is None else multi_suffix_pattern(suffixes)
    )
    multi = F.regexp_extract(h, pat_multi, 1)
    two = F.regexp_extract(h, PAT_TWO, 1)
    out = F.when(h.isNull(), F.lit(None).cast("string"))
    if exceptions:
        exc = F.regexp_extract(h, exception_pattern(exceptions), 1)
        out = out.when(exc != "", exc)
    return (
        out.when(multi != "", multi)
        .when(two != "", two)
        .otherwise(h)
    )


def registered_domain_sql(
    expr: str,
    suffixes: list[str] | None = None,
    exceptions: list[str] | None = None,
) -> str:
    """DuckDB replay of :func:`registered_domain` — generated from the
    same suffix constants (single source of truth)."""
    pat_multi = (
        PAT_MULTI if suffixes is None else multi_suffix_pattern(suffixes)
    )
    multi = f"regexp_extract({expr}, '{pat_multi}', 1)"
    two = f"regexp_extract({expr}, '{PAT_TWO}', 1)"
    branches = ""
    if exceptions:
        exc = (
            f"regexp_extract({expr}, "
            f"'{exception_pattern(exceptions)}', 1)"
        )
        branches = f"WHEN {exc} <> '' THEN {exc} "
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"{branches}"
        f"WHEN {multi} <> '' THEN {multi} "
        f"WHEN {two} <> '' THEN {two} "
        f"ELSE {expr} END"
    )


def domain_matches(host: Column | str, domains: list[str]) -> Column:
    """True when ``host`` equals any of ``domains`` or is a subdomain
    of one (ends with ``.d``) — the blocklist semantics every public
    pipeline uses. Literal predicate: right for bounded lists (config
    blocklists); codegen keeps it JVM-side. For 10⁵+-entry lists use
    :func:`domain_gate`'s relation path."""
    h = F.col(host) if isinstance(host, str) else host
    if not domains:
        return F.lit(False)
    cond = F.lit(False)
    for d in sorted(set(d.lower() for d in domains)):
        cond = cond | (h == d) | h.endswith("." + d)
    return F.when(h.isNull(), F.lit(False)).otherwise(cond)


def domain_matches_sql(expr: str, domains: list[str]) -> str:
    if not domains:
        return "FALSE"
    # right()-equality instead of LIKE: a domain entry containing a
    # LIKE metacharacter (_ or %) must match LITERALLY, exactly as
    # the Column side's endswith does; single quotes are doubled so
    # an entry can never break out of the generated literal
    parts = []
    for d in sorted(set(d.lower() for d in domains)):
        lit = d.replace("'", "''")
        parts.append(
            f"({expr} = '{lit}' OR right({expr}, {len(d) + 1}) = '.{lit}')"
        )
    return f"(CASE WHEN {expr} IS NULL THEN FALSE ELSE ({' OR '.join(parts)}) END)"


def domain_gate(
    docs: DataFrame,
    url_col: str = "url",
    blocklist: list[str] | None = None,
    allowlist: list[str] | None = None,
    broadcast_list: DataFrame | None = None,
    keep_null_host: bool = True,
    suffixes: list[str] | None = None,
    exceptions: list[str] | None = None,
    strip_www: bool | None = None,
) -> DataFrame:
    """The curation gate stage: drop documents whose host matches the
    blocklist; when an allowlist is given, ALSO require a match there
    (allow ∧ ¬block — the C4 posture). ``broadcast_list`` is the
    big-list path: a (domain string) DataFrame anti-joined broadcast
    on the registered domain (exact-domain semantics; subdomains of a
    listed domain match because the join key is the registered
    domain). Stateless — a funnel using it keeps append == rebuild.

    ``keep_null_host``: documents with no parseable URL pass by
    default (content filters downstream judge them); False drops them
    — a provenance-required pipeline.

    ``suffixes``/``exceptions``: a loaded rule set
    (:func:`load_public_suffixes`) for the broadcast path's
    registered-domain key; the embedded subset otherwise. Rule sets
    past :data:`_REGEX_RULE_LIMIT` switch the key derivation to the
    :func:`with_registered_domain` broadcast-join lookup — Java regex
    scans a big alternation linearly, ~1.7 ms/host at full-PSL size
    (SCALING.md r12) — same semantics either way (parity-tested).

    ``strip_www``: forwarded to :func:`url_host`. Default (None)
    resolves to False whenever ``exceptions`` are supplied — the real
    PSL's exception rules are www-anchored (``!www.ck``), and the
    default canonicalization would erase exactly the label they match
    on — and to True otherwise (the historical behavior)."""
    if strip_www is None:
        strip_www = not exceptions
    host = url_host(F.col(url_col), strip_www=strip_www)
    out = docs
    if not keep_null_host:
        out = out.where(host.isNotNull())
    if blocklist:
        out = out.where(~domain_matches(host, blocklist))
    if allowlist:
        out = out.where(host.isNull() | domain_matches(host, allowlist))
    if broadcast_list is not None:
        block = F.broadcast(
            broadcast_list.select(
                F.lower(F.col(broadcast_list.columns[0])).alias("_rd")
            ).distinct()
        )
        out = (
            _with_domain_key(out, host, suffixes, exceptions, "_rd")
            .join(block, "_rd", "left_anti")
            .drop("_rd")
        )
    return out


def _with_domain_key(
    df: DataFrame,
    host: Column,
    suffixes: list[str] | None,
    exceptions: list[str] | None,
    out_col: str,
) -> DataFrame:
    """ONE dispatch site for registered-domain key derivation (r12
    review: the gate and the rollup each carried a copy): small rule
    sets take the codegen regex, anything past
    :data:`_REGEX_RULE_LIMIT` takes the broadcast-join lookup —
    identical answers either way (parity-tested)."""
    if suffixes is not None and len(suffixes) > _REGEX_RULE_LIMIT:
        return with_registered_domain(
            df.withColumn("_wh", host), "_wh", suffixes, exceptions,
            out_col=out_col,
        ).drop("_wh")
    return df.withColumn(
        out_col, registered_domain(host, suffixes, exceptions)
    )


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    suffixes: list[str] | None = None,
    exceptions: list[str] | None = None,
    strip_www: bool | None = None,
) -> DataFrame:
    """(domain, n_docs, n_chars, n_hosts) per registered domain — one
    groupBy shuffle over pure projections; the mixture/sampling key
    table. Documents without a parseable host roll up under domain
    NULL (kept visible — silent drops would skew mixture weights).
    ``suffixes``/``exceptions``: a loaded PSL rule set; embedded
    subset otherwise (past :data:`_REGEX_RULE_LIMIT` rules the key
    derives via the broadcast-join lookup, as in
    :func:`domain_gate`). ``strip_www``: as in :func:`domain_gate` —
    None resolves to False when ``exceptions`` are supplied (www-
    anchored exception rules need the label kept), True otherwise."""
    if strip_www is None:
        strip_www = not exceptions
    host = url_host(F.col(url_col), strip_www=strip_www)
    keyed = _with_domain_key(
        docs.select(
            host.alias("_h"), F.length(F.col(text_col)).alias("_len")
        ),
        F.col("_h"), suffixes, exceptions, "domain",
    )
    return (
        keyed.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_len").alias("n_chars"),
            F.countDistinct("_h").alias("n_hosts"),
        )
    )


def with_registered_domain(
    df: DataFrame,
    host_col: str,
    suffixes: list[str],
    exceptions: list[str] | None = None,
    out_col: str = "domain",
) -> DataFrame:
    """eTLD+1 via broadcast-join rule lookup — the AT-SCALE form of
    :func:`registered_domain` for full-PSL rule sets.

    Motivation, measured (r12): Java regex scans alternation branches
    linearly (no DFA), so the Column path's generated pattern costs
    ~1.7 ms/host at 9,500 rules — fine for the embedded subset and
    the SQL-replayable oracles, unusable against a crawl. This
    operator replaces the alternation with per-depth broadcast hash
    joins: each host's last-d-label tails (d = the distinct rule
    depths, ≤4 in the real PSL) join a (tail → suffix length)
    relation, the longest match wins, and the registered domain is
    sliced out by label count. Exceptions stay a literal regex branch
    (the real list has single digits of them). Cost: a few broadcast
    hash joins + codegen string ops per row — no giant pattern, no
    shuffle.

    Semantics match :func:`registered_domain` exactly (parity-tested):
    exceptions first, then the longest suffix rule with one extra
    label present, then the two-label fallback, then the host itself;
    null hosts stay null."""
    spark = df.sparkSession
    h = F.col(host_col)
    # per (depth, tail): does an EXPLICIT rule exist, does a WILDCARD
    # rule exist — both can (PSL allows 'X' alongside '*.X'), and
    # collapsing them to one length would lose the explicit rule
    # (r12 review: host at exactly wildcard depth fell through to the
    # two-label fallback)
    rules: dict[int, dict[str, list[bool]]] = {}
    for s in set(x.lower() for x in suffixes):
        wild = s.startswith("*.")
        key = s[2:] if wild else s
        if not key:
            continue
        d = key.count(".") + 1
        flags = rules.setdefault(d, {}).setdefault(key, [False, False])
        flags[1 if wild else 0] = True
    arr = F.split(h, "[.]")
    nl = F.size(arr)

    def _clean_tail(k: int):
        # the regex path's [^.]+ labels: the chosen tail must contain
        # no EMPTY label (hosts with consecutive dots fall through,
        # exactly as the alternation does)
        return ~F.exists(
            F.slice(arr, -k, k), lambda x: x == F.lit("")
        )

    out = df.withColumn("_nl", nl)
    slen_cols = []
    for d, keyed in sorted(rules.items()):
        rd = spark.createDataFrame(
            sorted(
                (k, flags[0], flags[1]) for k, flags in keyed.items()
            ),
            f"_k{d} string, _we{d} boolean, _ww{d} boolean",
        )
        out = out.join(
            F.broadcast(rd),
            F.substring_index(h, ".", -d) == F.col(f"_k{d}"),
            "left",
        ).drop(f"_k{d}")
        # wildcard (suffix = d+1 labels) outranks explicit (d) at the
        # same tail — the alternation's longer-rules-first order; each
        # needs one extra NON-EMPTY label beyond its suffix
        slen_cols.append(
            F.when(
                F.col(f"_ww{d}")
                & (F.col("_nl") >= d + 2)
                & _clean_tail(d + 2),
                F.lit(d + 1),
            ).when(
                F.col(f"_we{d}")
                & (F.col("_nl") >= d + 1)
                & _clean_tail(d + 1),
                F.lit(d),
            )
        )
    if slen_cols:
        best_len = F.greatest(*slen_cols) if len(slen_cols) > 1 else slen_cols[0]
    else:
        best_len = F.lit(None).cast("int")
    out = out.withColumn("_slen", best_len)
    dom = F.when(h.isNull(), F.lit(None).cast("string"))
    if exceptions:
        exc = F.regexp_extract(h, exception_pattern(exceptions), 1)
        dom = dom.when(exc != "", exc)
    two = F.regexp_extract(h, PAT_TWO, 1)
    dom = (
        dom.when(
            F.col("_slen").isNotNull(),
            F.array_join(
                F.slice(
                    F.split(h, "[.]"),
                    -(F.col("_slen") + 1),
                    F.col("_slen") + 1,
                ),
                ".",
            ),
        )
        # the SAME two-label regex as the Column path — a split-based
        # fallback would accept empty labels ('a..b' -> '.b') where
        # the alternation's [^.]+ does not
        .when(two != "", two)
        .otherwise(h)
    )
    return (
        out.withColumn(out_col, dom)
        .drop(
            "_nl", "_slen",
            *[c for d in sorted(rules) for c in (f"_we{d}", f"_ww{d}")],
        )
    )
