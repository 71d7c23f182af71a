"""Incremental duplicate-line removal (streaming/line_dedup.py) and
its curation-funnel slot (r14): keep-first-in-time against the
persisted line census, append == rebuild under increasing ids,
at-least-once replay idempotence, and the funnel stage in both
postures."""

from __future__ import annotations

import pytest

BOILER = "subscribe to our newsletter for updates"


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCensus:
    def test_keep_first_in_time_across_batches(self, spark, tmp_path):
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        census = str(tmp_path / "census")
        b1 = _batch(spark, [(1, f"unique one\n{BOILER}"), (2, "unique two")])
        out1 = {
            r["doc_id"]: r["clean_text"]
            for r in line_batch_against_corpus(
                spark, b1, census, batch_id=1
            ).collect()
        }
        assert out1[1] == f"unique one\n{BOILER}"  # first-ever ships
        b2 = _batch(spark, [(3, f"{BOILER}\nunique three"), (4, BOILER)])
        out2 = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
            for r in line_batch_against_corpus(
                spark, b2, census, batch_id=2
            ).collect()
        }
        assert out2[3] == ("unique three", 2, 1)
        assert out2[4] == ("", 1, 0)  # scrubbed to empty

    def test_append_equals_rebuild(self, spark, tmp_path):
        from cod_stats_spark.operators.line_dedup import line_dedup
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        rows = [
            (1, f"alpha text\n{BOILER}\nbody one"),
            (2, "beta text\nbody two"),
            (3, f"{BOILER}\nbody three\nbeta text"),
            (4, f"gamma text\n{BOILER}\nbody one"),
        ]
        docs = _batch(spark, rows)
        census = str(tmp_path / "census_ar")
        got = {}
        for bid, pred in ((1, "doc_id <= 2"), (2, "doc_id > 2")):
            for r in line_batch_against_corpus(
                spark, docs.filter(pred), census, batch_id=bid
            ).collect():
                got[r["doc_id"]] = r["clean_text"]
        want = {
            r["doc_id"]: r["clean_text"]
            for r in line_dedup(docs).collect()
        }
        assert got == want

    def test_replay_is_idempotent_and_never_double_counts(
        self, spark, tmp_path
    ):
        from cod_stats_spark.streaming._state import current_version
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        census = str(tmp_path / "census_rp")
        b1 = _batch(spark, [(1, f"{BOILER}\nfirst body")])
        orig = line_batch_against_corpus(
            spark, b1, census, batch_id=7
        ).collect()
        v_after = current_version(census)
        # replay: same batch id — output equals original, state frozen
        replay = line_batch_against_corpus(
            spark, b1, census, batch_id=7
        ).collect()
        assert sorted(map(tuple, orig)) == sorted(map(tuple, replay))
        assert current_version(census) == v_after
        # the replay must NOT have seen its own counts: the boiler
        # line's first occurrence still ships
        assert BOILER in replay[0]["clean_text"]


class TestFunnelStage:
    _ROWS = [
        (1, f"the quick brown fox jumps over the lazy dog\n{BOILER}"),
        (2, "a completely different document about distributed query "
            "engines that shuffle and aggregate large tables"),
        (3, f"{BOILER}\nthe curious cat watches the quiet field with "
            "patient eyes"),
        (4, "another plain english document with enough words to pass "
            "the quality gate without trouble"),
    ]

    def test_one_shot_stage_scrubs_and_counts(self, spark, tmp_path):
        from cod_stats_spark.plans.curation import curate_corpus

        docs = _batch(spark, self._ROWS)
        _, stats = curate_corpus(
            docs, None, str(tmp_path / "out1"),
            min_quality=0.25, token_budget=64, line_sep="\n",
        )
        assert stats["after_line_dedup"] == 4  # no doc emptied
        assert "after_dedup" in stats

    def test_append_equals_rebuild_with_line_stage(self, spark, tmp_path):
        from cod_stats_spark.plans.curation import (
            compact_curated_shards,
            curate_corpus,
            curate_corpus_append,
        )

        docs = _batch(spark, self._ROWS)
        kw = dict(min_quality=0.25, token_budget=64, line_sep="\n")
        state = str(tmp_path / "state_ld")
        _, s1 = curate_corpus_append(
            spark, docs.filter("doc_id <= 2"), None, state, batch_id=1, **kw
        )
        _, s2 = curate_corpus_append(
            spark, docs.filter("doc_id > 2"), None, state, batch_id=2, **kw
        )
        assert s1["after_line_dedup"] == 2 and s2["after_line_dedup"] == 2
        compacted = compact_curated_shards(spark, state)
        got = {
            (r["doc_id"], r["text"])
            for r in compacted.select("doc_id", "text").collect()
        }
        out = str(tmp_path / "rebuild_ld")
        curate_corpus(docs, None, out, **kw)
        want = {
            (r["doc_id"], r["text"])
            for r in spark.read.parquet(out).select("doc_id", "text").collect()
        }
        assert got == want
        by_id = dict(got)
        # first-in-time boilerplate stands in doc 1, scrubbed in doc 3
        assert BOILER in by_id[1]
        assert BOILER not in by_id[3]
        assert "curious cat" in by_id[3]


class TestBloomMode:
    """state_mode='bloom' (r14): Dolma's published posture — the
    seen-set IS a fixed-size Bloom filter relation."""

    _M = 1 << 16  # generous bits for the tiny corpora: FP ~ 0

    def test_matches_exact_mode_when_fp_negligible(self, spark, tmp_path):
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        rows = [
            (1, f"alpha text\n{BOILER}\nbody one"),
            (2, "beta text\nbody two"),
            (3, f"{BOILER}\nbody three\nbeta text"),
            (4, f"gamma text\n{BOILER}\nbody one"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        outs = {}
        for mode, extra in (("exact", {}), ("bloom", {"bloom_bits": self._M})):
            st = str(tmp_path / f"st_{mode}")
            got = {}
            for bid, pred in ((1, "doc_id <= 2"), (2, "doc_id > 2")):
                for r in line_batch_against_corpus(
                    spark, docs.filter(pred), st, batch_id=bid,
                    state_mode=mode, **extra,
                ).collect():
                    got[r["doc_id"]] = r["clean_text"]
            outs[mode] = got
        assert outs["bloom"] == outs["exact"]

    def test_state_size_is_bounded_not_growing(self, spark, tmp_path):
        from cod_stats_spark.streaming._state import read_state
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        st = str(tmp_path / "st_sz")
        cap = self._M // 64  # the hard row bound: one row per word
        for bid in (1, 2, 3):
            docs = spark.createDataFrame(
                [(bid * 100 + i, f"line {bid} {i} unique content")
                 for i in range(40)],
                "doc_id long, text string",
            )
            line_batch_against_corpus(
                spark, docs, st, batch_id=bid,
                state_mode="bloom", bloom_bits=self._M,
            )
            assert read_state(spark, st).count() <= cap

    def test_replay_reads_pre_batch_snapshot(self, spark, tmp_path):
        from cod_stats_spark.streaming._state import current_version
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        st = str(tmp_path / "st_rp")
        b1 = spark.createDataFrame(
            [(1, f"{BOILER}\nfirst body")], "doc_id long, text string"
        )
        orig = line_batch_against_corpus(
            spark, b1, st, batch_id=9, state_mode="bloom",
            bloom_bits=self._M,
        ).collect()
        v = current_version(st)
        replay = line_batch_against_corpus(
            spark, b1, st, batch_id=9, state_mode="bloom",
            bloom_bits=self._M,
        ).collect()
        assert sorted(map(tuple, orig)) == sorted(map(tuple, replay))
        assert current_version(st) == v
        # the replay must NOT have probed its own bits
        assert BOILER in replay[0]["clean_text"]

    def test_mode_marker_freezes_state_dir(self, spark, tmp_path):
        import pytest as _pt

        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        st = str(tmp_path / "st_mk")
        docs = spark.createDataFrame(
            [(1, "some text")], "doc_id long, text string"
        )
        line_batch_against_corpus(
            spark, docs, st, batch_id=1, state_mode="bloom",
            bloom_bits=self._M,
        )
        with _pt.raises(ValueError, match="_LINESTATE.bloom"):
            line_batch_against_corpus(
                spark, docs, st, batch_id=2, state_mode="exact"
            )
        with _pt.raises(ValueError, match="state_mode"):
            line_batch_against_corpus(
                spark, docs, st, batch_id=3, state_mode="census"
            )

    def test_legacy_markerless_dir_is_exact(self, spark, tmp_path):
        """A committed state dir from before the mode marker existed
        holds the exact census: a bloom call must be REFUSED (not
        stamp its own marker and brick the dir), and a subsequent
        exact call must keep working."""
        import pytest as _pt

        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        st = str(tmp_path / "st_legacy")
        docs = spark.createDataFrame(
            [(1, "legacy line\nbody")], "doc_id long, text string"
        )
        line_batch_against_corpus(spark, docs, st, batch_id=1)
        # simulate the pre-marker layout
        import os

        os.remove(os.path.join(st, "_LINESTATE.exact"))
        with _pt.raises(ValueError, match="_LINESTATE.exact"):
            line_batch_against_corpus(
                spark, docs, st, batch_id=2, state_mode="bloom",
                bloom_bits=self._M,
            )
        b2 = spark.createDataFrame(
            [(2, "legacy line\nnew body")], "doc_id long, text string"
        )
        out = line_batch_against_corpus(spark, b2, st, batch_id=2).collect()
        assert out[0]["clean_text"] == "new body"  # census still live


class TestFunnelBloomMode:
    """r15: line_state_mode pass-through — the crawl-scale Bloom
    posture reachable from curate_corpus_append/stream_curate_to_corpus
    instead of only by hand-calling line_batch_against_corpus. The
    exact census stays the default."""

    _M = 1 << 16  # FP ~ 0 at these corpus sizes

    _ROWS = [
        (1, f"the quick brown fox jumps over the lazy dog\n{BOILER}"),
        (2, "a completely different document about distributed query "
            "engines that shuffle and aggregate large tables"),
        (3, f"{BOILER}\nthe curious cat watches the quiet field with "
            "patient eyes"),
        (4, "another plain english document with enough words to pass "
            "the quality gate without trouble"),
    ]

    def _run(self, spark, tmp_path, mode, **extra):
        from cod_stats_spark.plans.curation import (
            compact_curated_shards,
            curate_corpus_append,
        )

        docs = _batch(spark, self._ROWS)
        state = str(tmp_path / f"state_{mode}")
        kw = dict(
            min_quality=0.25, token_budget=64, line_sep="\n",
            line_state_mode=mode, **extra,
        )
        stats = []
        for bid, pred in ((1, "doc_id <= 2"), (2, "doc_id > 2")):
            _, s = curate_corpus_append(
                spark, docs.filter(pred), None, state, batch_id=bid, **kw
            )
            stats.append(s)
        compacted = compact_curated_shards(spark, state)
        return state, stats, {
            (r["doc_id"], r["text"])
            for r in compacted.select("doc_id", "text").collect()
        }

    def test_funnel_parity_at_fp_zero_sizing(self, spark, tmp_path):
        _, s_ex, out_ex = self._run(spark, tmp_path, "exact")
        _, s_bl, out_bl = self._run(
            spark, tmp_path, "bloom", line_bloom_bits=self._M
        )
        assert out_bl == out_ex
        assert [s["after_line_dedup"] for s in s_bl] == [
            s["after_line_dedup"] for s in s_ex
        ]
        by_id = dict(out_bl)
        assert BOILER in by_id[1] and BOILER not in by_id[3]

    def test_funnel_census_state_is_bounded(self, spark, tmp_path):
        import os

        from cod_stats_spark.plans.curation import curate_corpus_append
        from cod_stats_spark.streaming._state import read_state

        state = str(tmp_path / "state_bound")
        cap = self._M // 64
        for bid in (1, 2, 3):
            docs = spark.createDataFrame(
                [
                    (bid * 100 + i,
                     f"unique body {bid} {i} with plenty of words\n{BOILER}")
                    for i in range(30)
                ],
                "doc_id long, text string",
            )
            curate_corpus_append(
                spark, docs, None, state, batch_id=bid,
                min_quality=0.0, token_budget=64, line_sep="\n",
                line_state_mode="bloom", line_bloom_bits=self._M,
            )
            census = read_state(
                spark, os.path.join(state, "line_census")
            )
            assert census.count() <= cap

    def test_funnel_mode_switch_fails_loudly(self, spark, tmp_path):
        import pytest as _pt

        from cod_stats_spark.plans.curation import curate_corpus_append

        docs = _batch(spark, self._ROWS)
        state = str(tmp_path / "state_freeze")
        kw = dict(min_quality=0.25, token_budget=64, line_sep="\n")
        curate_corpus_append(
            spark, docs.filter("doc_id <= 2"), None, state, batch_id=1,
            line_state_mode="bloom", line_bloom_bits=self._M, **kw,
        )
        with _pt.raises(ValueError, match="state dir is _LINESTATE.bloom"):
            curate_corpus_append(
                spark, docs.filter("doc_id > 2"), None, state, batch_id=2,
                line_state_mode="exact", **kw,
            )


class TestVersionPruning:
    """prune_state_versions (r14): retention knob for the versioned
    protocol — keep {current, current−1}, replay-of-latest still
    works, deeper replays fail LOUDLY, markers preserved."""

    def test_prune_bounds_snapshots_and_latest_replay_survives(
        self, spark, tmp_path
    ):
        import os

        from cod_stats_spark.streaming._state import (
            current_version,
            prune_state_versions,
        )
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        st = str(tmp_path / "st_pr")
        outs = {}
        for bid in (1, 2, 3):
            docs = spark.createDataFrame(
                [(bid * 10, f"{BOILER}\nbody {bid}")],
                "doc_id long, text string",
            )
            outs[bid] = line_batch_against_corpus(
                spark, docs, st, batch_id=bid
            ).collect()
        assert current_version(st) == 2
        pruned = prune_state_versions(st, keep_last=2)
        assert pruned == [0]
        vdirs = sorted(n for n in os.listdir(st) if n.startswith("v="))
        assert vdirs == ["v=1", "v=2"]
        # markers survive — replay DETECTION is intact
        markers = [n for n in os.listdir(st) if n.startswith("_COMMIT")]
        assert len(markers) == 3
        # replay of the latest batch reads v=1 (kept) — identical out
        docs3 = spark.createDataFrame(
            [(30, f"{BOILER}\nbody 3")], "doc_id long, text string"
        )
        replay = line_batch_against_corpus(
            spark, docs3, st, batch_id=3
        ).collect()
        assert sorted(map(tuple, outs[3])) == sorted(map(tuple, replay))
        # replay beyond the window fails LOUDLY, never silently merges
        import pytest as _pt

        docs2 = spark.createDataFrame(
            [(20, f"{BOILER}\nbody 2")], "doc_id long, text string"
        )
        with _pt.raises(Exception, match="v=0|PATH_NOT_FOUND|Path does not exist"):
            line_batch_against_corpus(
                spark, docs2, st, batch_id=2
            ).collect()
        assert current_version(st) == 2  # state untouched by the failure

    def test_validation_and_empty_dir(self, tmp_path):
        import pytest as _pt

        from cod_stats_spark.streaming._state import prune_state_versions

        assert prune_state_versions(str(tmp_path / "nothing")) == []
        with _pt.raises(ValueError, match="keep_last"):
            prune_state_versions(str(tmp_path), keep_last=0)
