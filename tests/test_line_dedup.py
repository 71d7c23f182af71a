"""Line/paragraph-level exact dedup (operators/line_dedup.py): the
RefinedWeb/Dolma boilerplate pass — corpus-wide keep-first and
drop-all policies on hand-built docs, normalization-keyed decisions
with original text preserved, blank/short-line exemptions, and the
DuckDB replica. Gate-level SQL verification on the real tables lives
in the dedup_exact gate's 'line'/'line_all' arms."""

from __future__ import annotations

import pytest


def _run(spark, rows, **kw):
    from cod_stats_spark.operators.line_dedup import line_dedup

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(docs, **kw).collect()
    }


class TestPolicies:
    _ROWS = [
        (1, "unique alpha\nCOOKIE Banner\nbody one"),
        (2, "cookie  banner\nbody two\ncookie banner"),
        (3, "body three\nCookie Banner"),
    ]

    def test_keep_first_keeps_global_first_occurrence(self, spark):
        """'cookie banner' (normalized) appears at (1,1), (2,0), (2,2),
        (3,1) — only (1,1) survives, with ITS original casing."""
        got = _run(spark, self._ROWS)
        assert got[1] == ("unique alpha\nCOOKIE Banner\nbody one", 3, 3)
        assert got[2] == ("body two", 3, 1)
        assert got[3] == ("body three", 2, 1)

    def test_drop_all_scrubs_every_copy(self, spark):
        got = _run(spark, self._ROWS, keep_first=False)
        assert got[1] == ("unique alpha\nbody one", 3, 2)
        assert got[2] == ("body two", 3, 1)
        assert got[3] == ("body three", 2, 1)

    def test_intra_document_repeat_scrubs_too(self, spark):
        got = _run(spark, [(1, "same line\nother\nsame line")])
        assert got[1] == ("same line\nother", 3, 2)


class TestExemptions:
    def test_blank_lines_never_dedup(self, spark):
        """Paragraph structure survives: the blank separator line
        repeats in every doc but is exempt."""
        got = _run(spark, [(1, "para one\n\npara two"), (2, "para three\n\npara one")])
        assert got[1] == ("para one\n\npara two", 3, 3)
        assert got[2] == ("para three\n", 3, 2)  # trailing blank kept

    def test_min_chars_exempts_short_lines(self, spark):
        rows = [(1, "ok\nlong repeated line"), (2, "ok\nlong repeated line")]
        got = _run(spark, rows, min_chars=5)
        assert got[1] == ("ok\nlong repeated line", 2, 2)
        assert got[2] == ("ok", 2, 1)

    def test_null_and_empty_text(self, spark):
        got = _run(spark, [(1, None), (2, ""), (3, "real")])
        assert got[1] == ("", 1, 1)
        assert got[2] == ("", 1, 1)
        assert got[3] == ("real", 1, 1)


def test_custom_separator_and_validation(spark):
    got = _run(
        spark,
        [(1, "a|dup|b"), (2, "dup|c")],
        sep="|",
    )
    assert got[1] == ("a|dup|b", 3, 3)
    assert got[2] == ("c", 2, 1)
    from cod_stats_spark.operators.line_dedup import line_dedup

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_chars"):
        line_dedup(docs, min_chars=-1)
    with pytest.raises(ValueError, match="sep"):
        line_dedup(docs, sep="")


def test_duckdb_replays_everything(spark):
    import duckdb

    from cod_stats_spark.operators.line_dedup import (
        line_dedup,
        line_dedup_oracle_sql,
    )

    rows = [
        (1, "unique alpha\nCOOKIE Banner\nbody one"),
        (2, "cookie  banner\nbody two\ncookie banner"),
        (3, None),
        (4, "ok\n\nbody one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("docs_ld", docs.toPandas())
    for kf in (True, False):
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
            for r in line_dedup(
                docs, keep_first=kf, base_hash="md5_60"
            ).collect()
        }
        want = {
            int(i): (c, int(nl), int(nk))
            for i, c, nl, nk in con.execute(
                line_dedup_oracle_sql("docs_ld", keep_first=kf)
            ).fetchall()
        }
        assert got == want, kf
