"""URL/domain curation operators (functions/url.py): host extraction
and canonicalization, eTLD+1 registered domain (multi-part + platform
suffixes), blocklist/allowlist matching, per-domain rollup, and the
funnel gate stage in both postures."""

from __future__ import annotations

from pyspark.sql import functions as F


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


CASES = [
    (1, "https://www.Example.COM/path?q=1", "alpha"),
    (2, "http://sub.news.example.co.uk/a", "bravo"),
    (3, "https://blog.someone.blogspot.com/", "charlie"),
    (4, "https://api.service.io:8443/v2", "delta"),
    (5, "not a url", "echo"),
    (6, None, "foxtrot"),
    (7, "https://localhost/x", "golf"),
    (8, "https://user:pw@secret.example.com/private", "hotel"),
]

#: engine-parity traps (r11 review): uppercase scheme must parse,
#: non-http schemes must NOT, and a space in the authority behaves
#: identically in both engines (same regex by construction — the
#: parse_url-based extraction disagreed with the SQL replay on all 3)
PARITY_CASES = [
    (9, "HTTPS://WWW.Example.CO.UK/p/1", "india"),
    (10, "ftp://files.example.com/x", "juliet"),
    (11, "https://exa mple.com/x", "kilo"),
]


class TestHostAndDomain:
    def test_host_extraction_and_canonicalization(self, spark):
        from cod_stats_spark.functions.url import url_host

        got = {
            r["doc_id"]: r["h"]
            for r in _urls(spark, CASES + PARITY_CASES)
            .select("doc_id", url_host("url").alias("h"))
            .collect()
        }
        assert got[1] == "example.com"          # lowered, www-stripped
        assert got[2] == "sub.news.example.co.uk"
        assert got[3] == "blog.someone.blogspot.com"
        assert got[4] == "api.service.io"       # port excluded
        assert got[5] is None                   # schemeless
        assert got[6] is None
        assert got[7] == "localhost"
        assert got[8] == "secret.example.com"   # userinfo excluded
        assert got[9] == "example.co.uk"        # scheme case-blind
        assert got[10] is None                  # non-http scheme
        assert got[11] == "exa mple.com"        # regex-defined, both engines

    def test_registered_domain_rules(self, spark):
        from cod_stats_spark.functions.url import registered_domain, url_host

        got = {
            r["doc_id"]: r["d"]
            for r in _urls(spark, CASES)
            .select(
                "doc_id", registered_domain(url_host("url")).alias("d")
            )
            .collect()
        }
        assert got[1] == "example.com"
        assert got[2] == "example.co.uk"          # multi-part ccTLD
        assert got[3] == "someone.blogspot.com"   # platform suffix
        assert got[4] == "service.io"
        assert got[7] == "localhost"              # dotless -> itself
        assert got[6] is None

    def test_domain_matches_subdomain_semantics(self, spark):
        from cod_stats_spark.functions.url import domain_matches, url_host

        block = ["example.co.uk", "blogspot.com"]
        got = {
            r["doc_id"]: r["b"]
            for r in _urls(spark, CASES)
            .select(
                "doc_id",
                domain_matches(url_host("url"), block).alias("b"),
            )
            .collect()
        }
        assert got[2] is True    # subdomain of example.co.uk
        assert got[3] is True    # subdomain of blogspot.com
        assert got[1] is False
        assert got[6] is False   # null host never matches
        # empty list matches nothing
        empty = _urls(spark, CASES).select(
            domain_matches(url_host("url"), []).alias("b")
        )
        assert all(r["b"] is False for r in empty.collect())

    def test_sql_builders_replay_in_duckdb(self, spark):
        """The generated DuckDB SQL must agree with the Spark columns
        row for row — the single-source contract the stat_aggregates
        'dom:' arm relies on."""
        import duckdb
        import pandas as pd

        from cod_stats_spark.functions.url import (
            domain_matches,
            domain_matches_sql,
            registered_domain,
            registered_domain_sql,
            url_host,
            url_host_sql,
        )

        block = ["example.co.uk", "blogspot.com"]
        spark_rows = (
            _urls(spark, CASES + PARITY_CASES)
            .select(
                "doc_id",
                url_host("url").alias("host"),
                registered_domain(url_host("url")).alias("dom"),
                domain_matches(url_host("url"), block).alias("blk"),
            )
            .orderBy("doc_id")
            .collect()
        )
        pdf = pd.DataFrame(
            [(i, u) for i, u, _ in CASES + PARITY_CASES],
            columns=["doc_id", "url"],
        )
        con = duckdb.connect()
        con.register("t", pdf)
        h = url_host_sql("url")
        duck = con.sql(
            f"SELECT doc_id, {h} AS host, "
            f"{registered_domain_sql(h)} AS dom, "
            f"{domain_matches_sql(h, block)} AS blk "
            "FROM t ORDER BY doc_id"
        ).fetchall()
        got_spark = [(r["doc_id"], r["host"], r["dom"], r["blk"]) for r in spark_rows]
        assert got_spark == [tuple(r) for r in duck]

    def test_sql_builder_escapes_like_metachars_and_quotes(self, spark):
        """A blocklist entry containing LIKE metacharacters must match
        LITERALLY in the generated SQL (the Column side's endswith is
        literal), and a quote must not break the statement (ADVICE
        r11)."""
        import duckdb
        import pandas as pd

        from cod_stats_spark.functions.url import (
            domain_matches,
            domain_matches_sql,
        )

        # a_b.com would be a wildcard under LIKE; o'x.com tests quoting
        block = ["a_b.com", "o'x.com"]
        rows = [
            (0, "axb.com"),   # matches a_b.com under LIKE, not literal
            (1, "a_b.com"),   # literal match
            (2, "x.a_b.com"),  # literal subdomain match
            (3, "o'x.com"),   # quoted entry, literal match
            (4, "oxx.com"),   # no match
        ]
        sdf = spark.createDataFrame(rows, "doc_id long, host string")
        got_spark = [
            (r["doc_id"], r["blk"])
            for r in sdf.select(
                "doc_id",
                domain_matches(F.col("host"), block).alias("blk"),
            )
            .orderBy("doc_id")
            .collect()
        ]
        assert got_spark == [
            (0, False), (1, True), (2, True), (3, True), (4, False)
        ]
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame(rows, columns=["doc_id", "host"])
        )
        duck = con.sql(
            f"SELECT doc_id, {domain_matches_sql('host', block)} AS blk "
            "FROM t ORDER BY doc_id"
        ).fetchall()
        assert got_spark == [tuple(r) for r in duck]


class TestDomainStatsAndGate:
    def test_domain_stats_rollup(self, spark):
        from cod_stats_spark.functions.url import domain_stats

        got = {
            r["domain"]: (r["n_docs"], r["n_hosts"])
            for r in domain_stats(_urls(spark, CASES)).collect()
        }
        assert got["example.com"] == (2, 2)  # example.com + secret.
        assert got["example.co.uk"] == (1, 1)
        assert got[None][0] == 2             # unparseable rolls up visible

    def test_domain_gate_block_and_allow(self, spark):
        from cod_stats_spark.functions.url import domain_gate

        docs = _urls(spark, CASES)
        blocked = domain_gate(docs, "url", blocklist=["example.co.uk"])
        assert {r["doc_id"] for r in blocked.collect()} == {1, 3, 4, 5, 6, 7, 8}
        allowed = domain_gate(docs, "url", allowlist=["example.com"])
        # null-host docs pass by default; only listed domains otherwise
        assert {r["doc_id"] for r in allowed.collect()} == {1, 5, 6, 8}
        strict = domain_gate(
            docs, "url", allowlist=["example.com"], keep_null_host=False
        )
        assert {r["doc_id"] for r in strict.collect()} == {1, 8}

    def test_domain_gate_broadcast_relation_path(self, spark):
        from cod_stats_spark.functions.url import domain_gate

        docs = _urls(spark, CASES)
        big = spark.createDataFrame(
            [("example.co.uk",), ("BLOGSPOT.COM",)], "domain string"
        )
        # registered-domain key: someone.blogspot.com's registered
        # domain IS someone.blogspot.com (platform suffix), so the
        # literal 'blogspot.com' entry does NOT match it — exact-domain
        # semantics, as documented
        out = domain_gate(docs, "url", broadcast_list=big)
        assert {r["doc_id"] for r in out.collect()} == {1, 3, 4, 5, 6, 7, 8}

    def test_funnel_domain_stage_both_postures(self, spark, tmp_path):
        """curate_corpus and curate_corpus_append drop the same
        blocked docs in their first stage; stateless, so append ==
        rebuild is unaffected."""
        from cod_stats_spark.plans.curation import (
            curate_corpus,
            curate_corpus_append,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog in the park "
            "and then sleeps for a while near the big warm rock",
            "a completely different story about spark plans and the "
            "catalyst optimizer working through a long adaptive query",
        ]
        rows = [
            (i, f"https://w{i}.example.co.uk/a" if i % 2 == 0
             else f"https://ok{i}.example.com/a", texts[i % 2] + f" v{i}")
            for i in range(6)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, url string, text string"
        )
        _, stats = curate_corpus(
            docs, None, str(tmp_path / "out"),
            url_col="url", domain_blocklist=["example.co.uk"],
        )
        assert stats["after_domain_gate"] == 3
        _, stats2 = curate_corpus_append(
            spark, docs, None, str(tmp_path / "state"), batch_id=0,
            url_col="url", domain_blocklist=["example.co.uk"],
        )
        assert stats2["after_domain_gate"] == 3


class TestPublicSuffixLoader:
    PSL = """\
// ===BEGIN ICANN DOMAINS===
// il : https://example
co.il
ac.il
// ck : wildcard — every label under ck is its own suffix…
*.ck
// …except www.ck, which is a registrable domain
!www.ck
// uk
co.uk
// three-label explicit rule
k12.ak.us
com
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
blogspot.com
// ===END PRIVATE DOMAINS===
"""

    def test_parse_shapes(self):
        from cod_stats_spark.functions.url import load_public_suffixes

        suf, exc = load_public_suffixes(self.PSL)
        assert "co.il" in suf and "*.ck" in suf and "k12.ak.us" in suf
        assert "blogspot.com" in suf
        assert "com" not in suf          # single-label = fallback
        assert exc == ["www.ck"]
        suf_icann, _ = load_public_suffixes(
            self.PSL, include_private=False
        )
        assert "blogspot.com" not in suf_icann and "co.il" in suf_icann

    def test_non_embedded_suffix_through_both_engines(self, spark):
        """co.il is NOT in the embedded subset — with the loaded PSL
        both engines must split it one label deeper, and agree on
        wildcard, exception, and 3-label rules (ADVICE/verdict r11:
        Missing #4)."""
        import duckdb
        import pandas as pd

        from cod_stats_spark.functions.url import (
            load_public_suffixes,
            registered_domain,
            registered_domain_sql,
        )

        suf, exc = load_public_suffixes(self.PSL)
        rows = [
            (0, "shop.example.co.il"),   # loaded 2-label rule
            (1, "example.co.il"),
            (2, "foo.bar.anything.ck"),  # wildcard: *.ck
            (3, "sub.www.ck"),           # exception: !www.ck
            (4, "www.ck"),
            (5, "district.k12.ak.us"),   # 3-label explicit rule
            (6, "plain.example.com"),    # two-label fallback
            (7, "localhost"),            # dotless
            (8, None),
        ]
        sdf = spark.createDataFrame(rows, "doc_id long, host string")
        got = [
            (r["doc_id"], r["dom"])
            for r in sdf.select(
                "doc_id",
                registered_domain("host", suf, exc).alias("dom"),
            )
            .orderBy("doc_id")
            .collect()
        ]
        assert dict(got) == {
            0: "example.co.il",
            1: "example.co.il",
            2: "bar.anything.ck",
            3: "www.ck",
            4: "www.ck",
            5: "district.k12.ak.us",
            6: "example.com",
            7: "localhost",
            8: None,
        }
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["doc_id", "host"]))
        duck = con.sql(
            f"SELECT doc_id, {registered_domain_sql('host', suf, exc)} "
            "AS dom FROM t ORDER BY doc_id"
        ).fetchall()
        assert got == [tuple(r) for r in duck]

    def test_default_pattern_unchanged(self):
        """The loader must not perturb the embedded default — the
        stat_aggregates 'dom:' oracle replays PAT_MULTI verbatim."""
        from cod_stats_spark.functions.url import (
            MULTI_SUFFIXES,
            PAT_MULTI,
            multi_suffix_pattern,
        )

        assert multi_suffix_pattern(MULTI_SUFFIXES) == PAT_MULTI
        assert PAT_MULTI.startswith("([^.]+[.](?:")


def test_malformed_exception_rule_skipped():
    """r12 review: a malformed '!' rule must be skipped like a
    malformed suffix rule — splicing it would corrupt the generated
    exception pattern (unterminated group)."""
    from cod_stats_spark.functions.url import (
        exception_pattern,
        load_public_suffixes,
    )

    suf, exc = load_public_suffixes(
        "co.il\n!bad(rule.ck\n!www.ck\n*.ck\n"
    )
    assert exc == ["www.ck"]
    import re

    re.compile(exception_pattern(exc))  # must stay compilable


def test_gate_and_stats_accept_loaded_rules(spark):
    """The relation-path gate and the rollup key on a LOADED rule set:
    a co.il platform entry must split subdomains one label deeper in
    both, so the broadcast anti-join key and the mixture key agree
    with the loaded registered_domain."""
    from cod_stats_spark.functions.url import (
        domain_gate,
        domain_stats,
        load_public_suffixes,
    )

    suf, exc = load_public_suffixes("co.il\n")
    docs = spark.createDataFrame(
        [
            (1, "https://a.shop.co.il/x", "t1"),
            (2, "https://b.shop.co.il/y", "t2"),
            (3, "https://c.other.co.il/z", "t3"),
        ],
        "doc_id long, url string, text string",
    )
    stats = {
        r["domain"]: r["n_docs"]
        for r in domain_stats(docs, suffixes=suf, exceptions=exc).collect()
    }
    assert stats == {"shop.co.il": 2, "other.co.il": 1}
    block = spark.createDataFrame([("shop.co.il",)], "domain string")
    kept = {
        r["doc_id"]
        for r in domain_gate(
            docs, broadcast_list=block, suffixes=suf, exceptions=exc
        ).collect()
    }
    assert kept == {3}


def test_wildcard_exception_rule_skipped_and_www_anchored_exceptions():
    """r12 review #2: a '!*.x' wildcard exception must be skipped (no
    published semantics; its '*' is a dangling regex metacharacter),
    and www-anchored exceptions need strip_www=False upstream — the
    default canonicalization erases the label the rule matches on."""
    import re

    from cod_stats_spark.functions.url import (
        exception_pattern,
        load_public_suffixes,
    )

    suf, exc = load_public_suffixes("*.ck\n!*.bad\n!www.ck\n")
    assert exc == ["www.ck"]
    re.compile(exception_pattern(exc))


def test_strip_www_false_preserves_psl_exception_host(spark):
    """r12 review #3: with the real PSL's '!www.ck', the registrable
    domain of https://www.ck/x is www.ck itself — reachable only when
    url_host keeps the www. label. Both engines must agree."""
    import duckdb
    import pandas as pd

    from cod_stats_spark.functions.url import (
        load_public_suffixes,
        registered_domain,
        registered_domain_sql,
        url_host,
        url_host_sql,
    )

    suf, exc = load_public_suffixes("*.ck\n!www.ck\n")
    rows = [
        (1, "https://www.ck/x"),
        (2, "https://sub.www.ck/y"),
        (3, "https://www.example.com/z"),   # www kept -> 2-label tail
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, url string")
    got = [
        (r["doc_id"], r["dom"])
        for r in sdf.select(
            "doc_id",
            registered_domain(
                url_host("url", strip_www=False), suf, exc
            ).alias("dom"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    assert dict(got) == {
        1: "www.ck",
        2: "www.ck",
        3: "example.com",
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "url"]))
    h = url_host_sql("url", strip_www=False)
    duck = con.sql(
        f"SELECT doc_id, {registered_domain_sql(h, suf, exc)} AS dom "
        "FROM t ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(r) for r in duck]


def test_gate_and_stats_default_strip_www_off_with_exceptions(spark):
    """r12 advice: domain_gate/domain_stats hard-coded url_host's
    default strip_www=True, so a www-anchored PSL exception rule
    ('!www.ck') could never match through those entry points. The
    default now resolves to False whenever exceptions are supplied
    (and stays True otherwise); an explicit strip_www overrides."""
    from cod_stats_spark.functions.url import (
        domain_gate,
        domain_stats,
        load_public_suffixes,
    )

    suf, exc = load_public_suffixes("*.ck\n!www.ck\n")
    docs = spark.createDataFrame(
        [(1, "https://www.ck/x", "aa"), (2, "https://www.example.com/y", "bb")],
        "doc_id long, url string, text string",
    )
    doms = {
        r["domain"]
        for r in domain_stats(docs, suffixes=suf, exceptions=exc).collect()
    }
    assert "www.ck" in doms          # exception matched (www kept)
    assert "example.com" in doms     # two-label fallback unaffected
    # explicit override reproduces the historical canonicalization
    doms_t = {
        r["domain"]
        for r in domain_stats(
            docs, suffixes=suf, exceptions=exc, strip_www=True
        ).collect()
    }
    assert "www.ck" not in doms_t
    # the gate's broadcast path keys on the same exception domain
    import pandas as pd

    block = spark.createDataFrame(pd.DataFrame({"d": ["www.ck"]}))
    kept = domain_gate(
        docs, broadcast_list=block, suffixes=suf, exceptions=exc
    ).collect()
    assert [r["doc_id"] for r in kept] == [2]
    # no exceptions -> default unchanged (www stripped)
    doms_plain = {r["domain"] for r in domain_stats(docs).collect()}
    assert doms_plain == {"ck", "example.com"}


class TestRelationRegisteredDomain:
    """with_registered_domain (r12): the broadcast-join at-scale form
    must agree with the Column regex form rule for rule — exceptions,
    wildcards, 3-label rules, bare suffixes, dotless hosts, nulls."""

    PSL = "co.il\nac.il\n*.ck\n!www.ck\nco.uk\nk12.ak.us\nblogspot.com\n"

    def _hosts(self, spark):
        rows = [
            (0, "shop.example.co.il"),
            (1, "example.co.il"),
            (2, "co.il"),                 # bare suffix -> itself (2-label)
            (3, "foo.bar.anything.ck"),   # wildcard
            (4, "bar.anything.ck"),       # exactly label+wildcard-suffix
            (5, "anything.ck"),           # bare wildcard suffix
            (6, "sub.www.ck"),            # exception
            (7, "www.ck"),                # exception, exact
            (8, "district.k12.ak.us"),    # 3-label rule
            (9, "k12.ak.us"),             # bare 3-label suffix
            (10, "plain.example.com"),
            (11, "someone.blogspot.com"),
            (12, "localhost"),
            (13, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, host string")

    def test_parity_with_regex_path(self, spark):
        from cod_stats_spark.functions.url import (
            load_public_suffixes,
            registered_domain,
            with_registered_domain,
        )

        suf, exc = load_public_suffixes(self.PSL)
        df = self._hosts(spark)
        want = {
            r["doc_id"]: r["d"]
            for r in df.select(
                "doc_id", registered_domain("host", suf, exc).alias("d")
            ).collect()
        }
        got = {
            r["doc_id"]: r["domain"]
            for r in with_registered_domain(
                df, "host", suf, exc
            ).select("doc_id", "domain").collect()
        }
        assert got == want
        # spot-check the semantics themselves, not just parity
        assert got[0] == "example.co.il" and got[3] == "bar.anything.ck"
        assert got[6] == got[7] == "www.ck"
        assert got[2] == "co.il" and got[12] == "localhost"
        assert got[13] is None

    def test_embedded_subset_parity(self, spark):
        """Default rule set: same answers as the Column path over the
        canonical host cases."""
        from cod_stats_spark.functions.url import (
            MULTI_SUFFIXES,
            registered_domain,
            url_host,
            with_registered_domain,
        )

        docs = _urls(spark, CASES).select(
            "doc_id", url_host("url").alias("host")
        )
        want = {
            r["doc_id"]: r["d"]
            for r in docs.select(
                "doc_id", registered_domain("host").alias("d")
            ).collect()
        }
        got = {
            r["doc_id"]: r["domain"]
            for r in with_registered_domain(
                docs, "host", MULTI_SUFFIXES
            ).select("doc_id", "domain").collect()
        }
        assert got == want

    def test_broadcast_join_plan(self, spark):
        """The at-scale contract: broadcast hash joins, no giant
        regex, no shuffle."""
        from cod_stats_spark.functions.url import with_registered_domain

        plan = (
            with_registered_domain(
                self._hosts(spark), "host", ["co.uk", "*.ck", "k12.ak.us"]
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan


def test_dual_path_switch_for_large_rule_sets(spark):
    """Past _REGEX_RULE_LIMIT rules, domain_gate and domain_stats
    derive the registered-domain key via the broadcast-join lookup —
    answers identical to the small-set regex path."""
    from cod_stats_spark.functions.url import (
        domain_gate,
        domain_stats,
    )

    # 70 filler rules push past the 64-rule limit; co.il is the live one
    big = ["co.il"] + [f"fake{i}.zz" for i in range(69)]
    docs = spark.createDataFrame(
        [
            (1, "https://a.shop.co.il/x", "t1"),
            (2, "https://b.shop.co.il/y", "t2"),
            (3, "https://c.other.co.il/z", "t3"),
        ],
        "doc_id long, url string, text string",
    )
    small = {
        r["domain"]: r["n_docs"]
        for r in domain_stats(docs, suffixes=["co.il"]).collect()
    }
    large = {
        r["domain"]: r["n_docs"]
        for r in domain_stats(docs, suffixes=big).collect()
    }
    assert small == large == {"shop.co.il": 2, "other.co.il": 1}
    block = spark.createDataFrame([("shop.co.il",)], "domain string")
    kept = {
        r["doc_id"]
        for r in domain_gate(
            docs, broadcast_list=block, suffixes=big
        ).collect()
    }
    assert kept == {3}


def test_relation_domain_wildcard_plus_explicit_and_empty_labels(spark):
    """r12 review (3rd pass): (1) 'X' alongside '*.X' — the explicit
    rule must still apply at exactly wildcard depth; (2) hosts with
    consecutive dots must fall through exactly as the regex path's
    [^.]+ labels do. Parity on both, plus the expected values."""
    from cod_stats_spark.functions.url import (
        registered_domain,
        with_registered_domain,
    )

    suf = ["k12.ak.us", "*.k12.ak.us"]
    rows = [
        (0, "district.k12.ak.us"),      # explicit rule at wildcard depth
        (1, "school.district.k12.ak.us"),  # wildcard one deeper
        (2, "a..b"),                    # empty label: host itself
        (3, "a.b..ck"),                 # empty label inside a tail
        (4, "x.district.k12.ak.us"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    want = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id", registered_domain("host", suf).alias("d")
        ).collect()
    }
    got = {
        r["doc_id"]: r["domain"]
        for r in with_registered_domain(df, "host", suf)
        .select("doc_id", "domain")
        .collect()
    }
    assert got == want
    assert got[0] == "district.k12.ak.us"
    assert got[1] == "school.district.k12.ak.us"
    assert got[2] == "a..b" and got[3] == "a.b..ck"
