"""HTML → text extraction (functions/html.py): block stripping,
entity-decode ordering, C4 line rules, and exact Spark↔DuckDB parity
of the generated SQL — the stat_aggregates 'html:' arm's contract."""

from __future__ import annotations

from pyspark.sql import functions as F

CASES = [
    (0, "<html><head><script>var a = 1 < 2 && b > 3;</script>"
        "<style>.x { color: red }</style></head><body>"
        "<p>The quick brown fox jumps over the lazy dog today.</p>"
        "</body></html>"),
    (1, "<p>Short line.</p>"),                        # < min_words
    (2, "<p>Unterminated line with plenty of words but no full stop</p>"),
    (3, "<p>JavaScript must be enabled to continue reading this.</p>"),
    (4, "<!-- a comment with enough words to pass every other rule. -->"
        "<p>Real content follows the comment with enough words here.</p>"),
    (5, "<ul><li>First item carries enough words to survive the gate.</li>"
        "<li>Second item also carries enough words to survive.</li></ul>"),
    (6, "<p>Entities: &lt;tag&gt; &amp; &quot;quotes&quot; decode "
        "before the terminal check runs fine.</p>"),
    (7, "<p>Double-encoded &amp;lt; stays literal after a single "
        "decode pass, which is correct.</p>"),
    (8, "<p>A line that ends inside a quote reads \"done.\"</p>"),
    (9, "plain text with no markup at all and words enough to stay here."),
    (10, ""),
    (11, None),
    (12, "<P>UPPERCASE tags and a <B>bold</B> span survive "
         "normalization just fine.</P>"),
    (13, "<p>All rights reserved.</p><p>This privacy policy mention "
         "kills the line too.</p><p>But this sentence lives on "
         "entirely unharmed today.</p>"),
    (14, "<div>multi\n   space\tand\ttabs   collapse to single "
         "spaces in every line.</div>"),
]


def _df(spark):
    return spark.createDataFrame(CASES, "doc_id long, html string")


class TestExtraction:
    def test_scripts_styles_comments_removed_whole(self, spark):
        from cod_stats_spark.functions.html import extract_text

        got = {
            r["doc_id"]: r["ct"]
            for r in _df(spark)
            .select("doc_id", extract_text("html").alias("ct"))
            .collect()
        }
        assert got[0] == "The quick brown fox jumps over the lazy dog today."
        assert "var a" not in got[0] and "color" not in got[0]
        # comment body gone even though it ends in a period
        assert got[4] == (
            "Real content follows the comment with enough words here."
        )

    def test_c4_line_rules(self, spark):
        from cod_stats_spark.functions.html import extract_text

        got = {
            r["doc_id"]: r["ct"]
            for r in _df(spark)
            .select("doc_id", extract_text("html").alias("ct"))
            .collect()
        }
        assert got[1] == ""            # min_words
        assert got[2] == ""            # no terminal punctuation
        assert got[3] == ""            # boilerplate phrase (case-insensitive)
        assert got[8].endswith('"done."')   # terminal punct inside quote
        # each <li> is its own line
        assert got[5].split("\n") == [
            "First item carries enough words to survive the gate.",
            "Second item also carries enough words to survive.",
        ]
        # blocklist kills lines, not documents
        assert got[13] == "But this sentence lives on entirely unharmed today."
        # source newlines/tabs are insignificant markup whitespace —
        # only block tags create lines, so the content stays ONE line
        assert got[14] == (
            "multi space and tabs collapse to single spaces in every line."
        )

    def test_entity_decode_order(self, spark):
        from cod_stats_spark.functions.html import extract_text

        got = {
            r["doc_id"]: r["ct"]
            for r in _df(spark)
            .select("doc_id", extract_text("html").alias("ct"))
            .collect()
        }
        assert got[6] == (
            'Entities: <tag> & "quotes" decode before the terminal '
            "check runs fine."
        )
        # &amp; decodes LAST: &amp;lt; -> &lt; (literal), never <
        assert "&lt;" in got[7] and "<" not in got[7].replace("&lt;", "")

    def test_null_and_empty(self, spark):
        from cod_stats_spark.functions.html import extract_text

        got = {
            r["doc_id"]: r["ct"]
            for r in _df(spark)
            .select("doc_id", extract_text("html").alias("ct"))
            .collect()
        }
        assert got[10] == "" and got[11] is None


class TestSqlParity:
    def test_generated_sql_replays_in_duckdb(self, spark):
        """Row-for-row agreement of extract_text with its generated
        DuckDB SQL over every case, including null/empty and the
        entity/uppercase/whitespace edges."""
        import duckdb
        import pandas as pd

        from cod_stats_spark.functions.html import (
            extract_text,
            extract_text_sql,
        )

        got = [
            (r["doc_id"], r["ct"])
            for r in _df(spark)
            .select("doc_id", extract_text("html").alias("ct"))
            .orderBy("doc_id")
            .collect()
        ]
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame(CASES, columns=["doc_id", "html"])
        )
        duck = con.sql(
            f"SELECT doc_id, {extract_text_sql('html')} AS ct "
            "FROM t ORDER BY doc_id"
        ).fetchall()
        assert got == [tuple(r) for r in duck]

    def test_line_counters_agree(self, spark):
        """normalized vs kept line counts (the gate's m2/m3 columns)
        replay exactly."""
        import duckdb
        import pandas as pd

        from cod_stats_spark.functions.html import (
            html_to_text,
            html_to_text_sql,
            kept_lines,
            kept_lines_sql,
            normalized_lines,
            normalized_lines_sql,
        )

        raw = html_to_text("html")
        got = [
            (r["doc_id"], r["n_all"], r["n_kept"])
            for r in _df(spark)
            .select(
                "doc_id",
                F.size(normalized_lines(raw)).alias("n_all"),
                F.size(kept_lines(raw)).alias("n_kept"),
            )
            .orderBy("doc_id")
            .collect()
        ]
        con = duckdb.connect()
        con.register("t", pd.DataFrame(CASES, columns=["doc_id", "html"]))
        raw_sql = html_to_text_sql("html")
        duck = con.sql(
            f"SELECT doc_id, "
            f"coalesce(len({normalized_lines_sql(raw_sql)}), -1) AS n_all, "
            f"coalesce(len({kept_lines_sql(raw_sql)}), -1) AS n_kept "
            "FROM t ORDER BY doc_id"
        ).fetchall()
        # Spark size() on null arrays is -1, matched via coalesce
        assert got == [tuple(r) for r in duck]
