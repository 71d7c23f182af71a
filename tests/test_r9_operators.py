"""Round-9 operators: exact-substring span dedup (Lee et al.
ExactSubstr at fixed gram granularity), token-window chunking, funnel
+ cohort retention, SCD2 build/apply/lookup. Planted-case semantics
here; full-pipeline value verification lives in the gate oracles
(dedup_exact 'substring' arms, pack_sequences 'chunk' arm,
stat_aggregates 'funnel:'/'cohort:' arms, asof_join_orders 'scd2'
arms)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest


PASSAGE = "alpha beta gamma delta epsilon zeta eta theta"


class TestSubstringDedup:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, PASSAGE + " unique tail one"),
                (2, "lead in words " + PASSAGE + " and more"),
                (3, "no repeated passages in this document at all"),
                (4, ""),
                (5, None),
                (6, "self x " + PASSAGE + " mid " + PASSAGE + " end"),
            ],
            "doc_id long, text string",
        )

    def test_spans_cover_planted_passage(self, spark):
        from cod_stats_spark.operators.substring import (
            duplicate_gram_sites,
            duplicate_spans,
        )

        docs = self._docs(spark)
        sites = duplicate_gram_sites(docs, n=8, min_count=2)
        spans = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(sites, n=8).collect()
        }
        # doc 1: passage at tokens 0..7; doc 2: at 3..10
        assert (1, 0, 8) in spans
        assert (2, 3, 11) in spans
        assert not any(d == 3 or d == 4 or d == 5 for d, *_ in spans)

    def test_removal_rebuilds_clean_text(self, spark):
        from cod_stats_spark.operators.substring import substring_dedup

        out = {
            r["doc_id"]: r
            for r in substring_dedup(self._docs(spark), n=8).collect()
        }
        assert out[1]["clean_text"] == "unique tail one"
        assert out[2]["clean_text"] == "lead in words and more"
        assert out[1]["n_dup_tokens"] == 8 and out[1]["n_spans"] == 1
        assert out[3]["n_spans"] == 0
        assert out[3]["clean_text"].startswith("no repeated")
        assert out[4]["clean_text"] == "" and out[5]["clean_text"] == ""

    def test_keep_first_exempts_global_minimum_site(self, spark):
        from cod_stats_spark.operators.substring import substring_dedup

        out = {
            r["doc_id"]: r
            for r in substring_dedup(
                self._docs(spark), n=8, keep_first=True
            ).collect()
        }
        # doc 1 holds the globally-first site of every passage gram
        assert out[1]["n_dup_tokens"] == 0
        assert out[1]["clean_text"] == PASSAGE + " unique tail one"
        assert out[2]["clean_text"] == "lead in words and more"

    def test_within_document_repeats_are_found(self, spark):
        from cod_stats_spark.operators.substring import substring_dedup

        docs = spark.createDataFrame(
            [(1, ("one two three four " * 4).strip())],
            "doc_id long, text string",
        )
        row = substring_dedup(docs, n=4).collect()[0]
        # every 4-gram in the repeating tape occurs >= 2 times:
        # the whole doc is one duplicated span
        assert row["n_spans"] == 1 and row["n_dup_tokens"] == 16
        assert row["clean_text"] == ""

    def test_short_docs_produce_no_grams(self, spark):
        from cod_stats_spark.operators.substring import duplicate_gram_sites

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
        )
        assert duplicate_gram_sites(docs, n=4).count() == 0


class TestChunking:
    def test_boundaries_overlap_and_tail(self, spark):
        from cod_stats_spark.operators.chunking import chunk_documents

        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        rows = sorted(
            (r["chunk_id"], r["chunk_start"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(docs, max_tokens=4, stride=3).collect()
        )
        assert [r[:3] for r in rows] == [
            (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1),
        ]
        assert rows[0][3] == "w0 w1 w2 w3"
        assert rows[3][3] == "w9"

    def test_disjoint_default_and_reconstruction(self, spark):
        from cod_stats_spark.operators.chunking import chunk_documents

        text = " ".join(f"t{i}" for i in range(11))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            (r["chunk_id"], r["chunk_text"])
            for r in chunk_documents(docs, max_tokens=4).collect()
        )
        assert " ".join(t for _, t in rows) == text  # disjoint cover

    def test_empty_and_null(self, spark):
        from cod_stats_spark.operators.chunking import chunk_documents

        docs = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        assert chunk_documents(docs, max_tokens=4).count() == 0
        kept = chunk_documents(docs, max_tokens=4, keep_empty=True)
        rows = {r["doc_id"]: r for r in kept.collect()}
        assert rows[1]["chunk_text"] == "" and rows[1]["n_tokens"] == 0
        assert rows[2]["n_tokens"] == 0

    def test_guards(self, spark):
        from cod_stats_spark.operators.chunking import chunk_documents

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=4, stride=0)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


class TestFunnel:
    def _events(self, spark):
        rows = [
            # u1 completes view -> click -> buy in order
            (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "buy", _ts(3)),
            # u2 clicks BEFORE viewing; the later click completes step 2
            (2, "click", _ts(1)), (2, "view", _ts(2)), (2, "click", _ts(4)),
            # u3 views only
            (3, "view", _ts(5)),
            # u4 never enters the funnel
            (4, "buy", _ts(1)),
        ]
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )

    def test_strict_sequential_semantics(self, spark):
        from cod_stats_spark.operators.funnel import funnel_counts, funnel_users

        ev = self._events(spark)
        users = {
            r["user_id"]: r
            for r in funnel_users(ev, ["view", "click", "buy"]).collect()
        }
        assert set(users) == {1, 2, 3}          # u4 never did step 1
        assert users[1]["t3"] == _ts(3)
        assert users[2]["t2"] == _ts(4)         # pre-view click ignored
        assert users[2]["t3"] is None
        counts = {
            r["step_name"]: (r["n_users"], r["conversion"])
            for r in funnel_counts(ev, ["view", "click", "buy"]).collect()
        }
        assert counts["view"] == (3, 1.0)
        assert counts["click"] == (2, round(2 / 3, 6))
        assert counts["buy"] == (1, round(1 / 3, 6))

    def test_max_gap_cuts_slow_conversions(self, spark):
        from cod_stats_spark.operators.funnel import funnel_users

        ev = self._events(spark)
        users = {
            r["user_id"]: r
            for r in funnel_users(
                ev, ["view", "click"], max_gap_seconds=24 * 3600
            ).collect()
        }
        assert users[1]["t2"] == _ts(2)         # 1 day gap: inside
        assert users[2]["t2"] is None           # 2 day gap: outside

    def test_guards(self, spark):
        from cod_stats_spark.operators.funnel import funnel_users

        ev = self._events(spark)
        with pytest.raises(ValueError):
            funnel_users(ev, [])
        with pytest.raises(ValueError):
            funnel_users(ev, ["view", "view"])


class TestCohortRetention:
    def test_weekly_triangle(self, spark):
        from cod_stats_spark.operators.funnel import cohort_retention

        rows = [
            # cohort of Mon 2024-01-01: u1 active wk0+wk1, u2 wk0 only
            (1, _ts(1)), (1, _ts(10)),
            (2, _ts(2)),
            # cohort of Mon 2024-01-08: u3 active wk0
            (3, _ts(9)),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (str(r["cohort"]), r["period_offset"]): (
                r["n_active"], r["cohort_size"], r["retention"],
            )
            for r in cohort_retention(ev).collect()
        }
        assert got[("2024-01-01", 0)] == (2, 2, 1.0)
        assert got[("2024-01-01", 1)] == (1, 2, 0.5)
        assert got[("2024-01-08", 0)] == (1, 1, 1.0)

    def test_guard(self, spark):
        from cod_stats_spark.operators.funnel import cohort_retention

        ev = spark.createDataFrame([(1, _ts(1))], "user_id long, ts timestamp")
        with pytest.raises(ValueError):
            cohort_retention(ev, period="year")


class TestScd2:
    def _log(self, spark):
        rows = [
            (1, _ts(1), "bronze"),
            (1, _ts(5), "bronze"),   # no-op: collapses
            (1, _ts(10), "gold"),
            (2, _ts(3), "silver"),
        ]
        return spark.createDataFrame(rows, "k long, t timestamp, attr string")

    def test_build_collapses_and_closes_intervals(self, spark):
        from cod_stats_spark.operators.scd import scd2_build

        rows = sorted(
            (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_build(
                self._log(spark), ["k"], "t", ["attr"]
            ).collect()
        )
        assert rows == [
            (1, "bronze", _ts(1), _ts(10), False),
            (1, "gold", _ts(10), None, True),
            (2, "silver", _ts(3), None, True),
        ]

    def test_no_collapse_keeps_noop_rows(self, spark):
        from cod_stats_spark.operators.scd import scd2_build

        out = scd2_build(self._log(spark), ["k"], "t", ["attr"], collapse=False)
        assert out.where(F.col("k") == 1).count() == 3

    def test_apply_equals_rebuild_with_retroactive_change(self, spark):
        from cod_stats_spark.operators.scd import scd2_apply, scd2_build

        log = self._log(spark)
        older = log.where(F.col("t") >= F.lit(_ts(5)))
        newer = log.where(F.col("t") < F.lit(_ts(5)))  # retroactive batch
        inc = scd2_apply(
            scd2_build(older, ["k"], "t", ["attr"]), newer, ["k"], "t", ["attr"]
        )
        want = sorted(map(tuple, scd2_build(log, ["k"], "t", ["attr"]).collect()))
        assert sorted(map(tuple, inc.collect())) == want

    def test_uncollapsed_apply_equals_rebuild_under_any_interleave(self, spark):
        """The exact identity (scd2_apply docstring case i): with
        collapse=False, apply == rebuild for ARBITRARY interleaving —
        including a retroactive insert INSIDE what collapse would
        have merged into one run."""
        from cod_stats_spark.operators.scd import scd2_apply, scd2_build

        rows = [
            (1, _ts(1), "a"), (1, _ts(5), "a"), (1, _ts(10), "b"),
        ]
        mid = [(1, _ts(3), "b")]  # lands between the two 'a' rows
        log = spark.createDataFrame(rows, "k long, t timestamp, attr string")
        batch = spark.createDataFrame(mid, "k long, t timestamp, attr string")
        inc = scd2_apply(
            scd2_build(log, ["k"], "t", ["attr"], collapse=False),
            batch, ["k"], "t", ["attr"], collapse=False,
        )
        full = scd2_build(
            log.unionByName(batch), ["k"], "t", ["attr"], collapse=False
        )
        assert sorted(map(tuple, inc.collect())) == sorted(
            map(tuple, full.collect())
        )

    def test_collapsed_dim_cannot_replay_dropped_noop(self, spark):
        """The documented SCD2 limitation (docstring case ii): a
        collapsed dimension dropped the t=5 'a' no-op, so a
        retroactive insert inside that run yields a history that
        differs from the full-log rebuild — the raw change log, not
        the dim, is the source of truth for retroactive rebuilds."""
        from cod_stats_spark.operators.scd import scd2_apply, scd2_build

        rows = [
            (1, _ts(1), "a"), (1, _ts(5), "a"), (1, _ts(10), "b"),
        ]
        mid = [(1, _ts(3), "b")]
        log = spark.createDataFrame(rows, "k long, t timestamp, attr string")
        batch = spark.createDataFrame(mid, "k long, t timestamp, attr string")
        inc = scd2_apply(
            scd2_build(log, ["k"], "t", ["attr"]), batch, ["k"], "t", ["attr"]
        )
        full = scd2_build(log.unionByName(batch), ["k"], "t", ["attr"])
        # full rebuild recovers the 'a' run RESUMING at t=5 …
        assert (_ts(5),) in {
            (r["valid_from"],) for r in full.where(F.col("attr") == "a").collect()
        }
        # … which the collapsed dim, having dropped the no-op, cannot
        assert (_ts(5),) not in {
            (r["valid_from"],) for r in inc.collect()
        }

    def test_apply_leaves_unaffected_keys_untouched(self, spark):
        from cod_stats_spark.operators.scd import scd2_apply, scd2_build

        dim = scd2_build(self._log(spark), ["k"], "t", ["attr"])
        batch = spark.createDataFrame(
            [(2, _ts(20), "gold")], "k long, t timestamp, attr string"
        )
        out = scd2_apply(dim, batch, ["k"], "t", ["attr"])
        k1 = sorted(map(tuple, out.where(F.col("k") == 1).collect()))
        assert k1 == sorted(map(tuple, dim.where(F.col("k") == 1).collect()))
        k2 = {
            (r["attr"], r["is_current"])
            for r in out.where(F.col("k") == 2).collect()
        }
        assert k2 == {("silver", False), ("gold", True)}

    def test_lookup_point_in_time(self, spark):
        from cod_stats_spark.operators.scd import scd2_build, scd2_lookup

        dim = scd2_build(self._log(spark), ["k"], "t", ["attr"])
        facts = spark.createDataFrame(
            [
                (100, 1, _ts(1)),    # at the change instant: new value
                (101, 1, _ts(7)),    # mid-interval
                (102, 1, _ts(12)),   # open row
                (103, 2, _ts(1)),    # before first interval
            ],
            "fact_id long, k long, ts timestamp",
        )
        got = {
            r["fact_id"]: r["attr"]
            for r in scd2_lookup(facts, dim, ["k"], "ts", ["attr"]).collect()
        }
        assert got == {100: "bronze", 101: "bronze", 102: "gold", 103: None}


class TestEventPaths:
    def test_planted_session_paths(self, spark):
        from cod_stats_spark.operators.paths import event_path_ngrams

        t0 = dt.datetime(2026, 1, 1, 10, 0)
        sec = dt.timedelta(seconds=1)
        rows = [
            # u1 session 1: view > click > buy (1s apart)
            (1, 1, "view", t0), (1, 2, "click", t0 + sec), (1, 3, "buy", t0 + 2 * sec),
            # u1 session 2 (2h later): view > click
            (1, 4, "view", t0 + dt.timedelta(hours=2)),
            (1, 5, "click", t0 + dt.timedelta(hours=2) + sec),
            # u2: single event — too short for any 2-gram
            (2, 6, "view", t0),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts timestamp"
        )
        got = {
            r["path"]: (r["n_occurrences"], r["n_sessions"])
            for r in event_path_ngrams(ev, n=2, gap_seconds=1800).collect()
        }
        assert got == {"view>click": (2, 2), "click>buy": (1, 1)}
        got3 = {
            r["path"]: (r["n_occurrences"], r["n_sessions"])
            for r in event_path_ngrams(ev, n=3, gap_seconds=1800).collect()
        }
        assert got3 == {"view>click>buy": (1, 1)}

    def test_equal_ts_orders_by_tiebreak(self, spark):
        from cod_stats_spark.operators.paths import event_path_ngrams

        t0 = dt.datetime(2026, 1, 1, 10, 0)
        rows = [(1, 2, "b", t0), (1, 1, "a", t0)]   # same ts: event_id orders
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts timestamp"
        )
        got = [r["path"] for r in event_path_ngrams(ev, n=2).collect()]
        assert got == ["a>b"]

    def test_repeat_inside_one_session_counts_occurrences(self, spark):
        from cod_stats_spark.operators.paths import event_path_ngrams

        t0 = dt.datetime(2026, 1, 1, 10, 0)
        sec = dt.timedelta(seconds=1)
        rows = [(1, i, e, t0 + i * sec) for i, e in enumerate(["x", "y", "x", "y"])]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts timestamp"
        )
        got = {
            r["path"]: (r["n_occurrences"], r["n_sessions"])
            for r in event_path_ngrams(ev, n=2).collect()
        }
        assert got == {"x>y": (2, 1), "y>x": (1, 1)}


class TestIncrementalSubstring:
    def _corpus(self, spark):
        rows = [
            (1, PASSAGE + " first home"),
            (2, "prefix words " + PASSAGE + " suffix words"),
            (3, "completely original content in the first batch here"),
            (4, PASSAGE + " third copy late"),
            (5, "more fresh unrelated text arriving in batch two"),
            (6, "prefix words " + PASSAGE + " suffix words"),  # exact dup of 2
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_sequential_batches_equal_one_shot_keep_first(self, spark, tmp_path):
        """Ids increase across batches, so keep-first-in-time must
        equal the one-shot keep_first pass over the union — including
        a gram whose min_count is only reached ACROSS batches."""
        from cod_stats_spark.operators.substring import substring_dedup
        from cod_stats_spark.streaming import substring_batch_against_corpus

        docs = self._corpus(spark)
        b1 = docs.where("doc_id <= 3")
        b2 = docs.where("doc_id > 3")
        census = str(tmp_path / "census")
        out1 = substring_batch_against_corpus(
            spark, b1, census, n=8, min_count=2
        ).collect()
        out2 = substring_batch_against_corpus(
            spark, b2, census, n=8, min_count=2
        ).collect()
        got = sorted(
            (r["doc_id"], r["clean_text"], r["n_dup_tokens"])
            for r in out1 + out2
        )
        want = sorted(
            (r["doc_id"], r["clean_text"], r["n_dup_tokens"])
            for r in substring_dedup(docs, n=8, keep_first=True).collect()
        )
        assert got == want
        # semantics spot-check: doc 1 keeps the passage, 4 and 6 lose it
        by_id = dict((d, t) for d, t, _ in got)
        assert PASSAGE in by_id[1]
        assert PASSAGE not in by_id[4] and PASSAGE not in by_id[6]

    def test_replayed_batch_id_is_idempotent(self, spark, tmp_path):
        """At-least-once replay (r10): re-running a batch WITH ITS
        BATCH ID must re-scrub against the snapshot it originally read
        and skip the census merge — without the guard, the replay sees
        its own counts already merged and scrubs the batch's own FIRST
        occurrences. The census must not advance on replay."""
        import os

        from cod_stats_spark.streaming import substring_batch_against_corpus

        census = str(tmp_path / "census")
        docs = self._corpus(spark)
        b1, b2 = docs.where("doc_id <= 3"), docs.where("doc_id > 3")
        first = sorted(
            (r["doc_id"], r["clean_text"])
            for r in substring_batch_against_corpus(
                spark, b1, census, n=8, min_count=2, batch_id=0
            ).collect()
        )
        out2 = sorted(
            (r["doc_id"], r["clean_text"])
            for r in substring_batch_against_corpus(
                spark, b2, census, n=8, min_count=2, batch_id=1
            ).collect()
        )
        markers = sorted(
            n for n in os.listdir(census) if n.startswith("_COMMIT")
        )
        # replay BOTH batches: outputs identical, no new versions
        replay1 = sorted(
            (r["doc_id"], r["clean_text"])
            for r in substring_batch_against_corpus(
                spark, b1, census, n=8, min_count=2, batch_id=0
            ).collect()
        )
        replay2 = sorted(
            (r["doc_id"], r["clean_text"])
            for r in substring_batch_against_corpus(
                spark, b2, census, n=8, min_count=2, batch_id=1
            ).collect()
        )
        assert replay1 == first
        assert replay2 == out2
        assert PASSAGE in dict(replay1)[1]     # first occurrence survives
        assert sorted(
            n for n in os.listdir(census) if n.startswith("_COMMIT")
        ) == markers

    def test_census_survives_batches_without_the_gram(self, spark, tmp_path):
        """A gram seen once in batch 1 must still be in the census
        after a batch that doesn't mention it — its SECOND occurrence
        in batch 3 is scrubbed."""
        from cod_stats_spark.streaming import substring_batch_against_corpus

        census = str(tmp_path / "census")
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        substring_batch_against_corpus(
            spark, mk([(1, PASSAGE)]), census, n=8, min_count=2
        ).collect()
        substring_batch_against_corpus(
            spark, mk([(2, "nothing shared at all in this middle batch")]),
            census, n=8, min_count=2,
        ).collect()
        out = substring_batch_against_corpus(
            spark, mk([(3, PASSAGE + " tail")]), census, n=8, min_count=2
        ).collect()
        assert out[0]["clean_text"] == "tail"

    def test_streaming_wrapper_appends_cleaned_batches(self, spark, tmp_path):
        from cod_stats_spark.streaming import stream_substring_dedup

        docs = self._corpus(spark)
        src = tmp_path / "in"
        docs.where("doc_id <= 3").coalesce(1).write.parquet(f"{src}/b0")
        docs.where("doc_id > 3").coalesce(1).write.parquet(f"{src}/b1")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        )
        out = str(tmp_path / "out")
        q = stream_substring_dedup(
            stream, str(tmp_path / "census"), out, n=8, min_count=2,
            checkpoint_path=str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = {r["doc_id"]: r["clean_text"]
                for r in spark.read.parquet(out).collect()}
        assert set(rows) == {1, 2, 3, 4, 5, 6}
        assert PASSAGE in rows[1] and PASSAGE not in rows[6]
