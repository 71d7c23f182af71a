"""Property-based tests (hypothesis) for the invariant-heavy operators:
sessionization, streaks, skew-salted aggregation, and the as-of join —
each checked against a straightforward Python reference model."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

prop = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

ts_lists = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30)


def _model_sessions(ts_sorted, gap):
    """Reference model: session ordinal per timestamp (>= gap splits)."""
    out, n, last = [], 0, None
    for t in ts_sorted:
        if last is None or t - last >= gap:
            n += 1
        out.append(n)
        last = t
    return out


class TestSessionizeProperties:
    @prop
    @given(ts=ts_lists, gap=st.integers(min_value=1, max_value=2000))
    def test_matches_model(self, spark, ts, gap):
        from cod_stats_spark.operators.sessionize import sessionize

        rows = [("p", i, t) for i, t in enumerate(ts)]
        df = spark.createDataFrame(rows, "k string, idx long, ts long")
        # model needs a total order; operator tiebreaks equal ts by idx
        got = (
            sessionize(df, "ts", ["k"], gap, tiebreak_cols=["idx"])
            .orderBy("ts", "idx")
            .collect()
        )
        expected = _model_sessions([r["ts"] for r in got], gap)
        assert [r["session_number"] for r in got] == expected


class TestStreakProperties:
    @prop
    @given(seq=st.lists(st.sampled_from(["W", "L"]), min_size=1, max_size=40))
    def test_run_lengths_match_model(self, spark, seq):
        from cod_stats_spark.operators.streaks import run_lengths

        df = spark.createDataFrame(
            [("p", i, v) for i, v in enumerate(seq)], "k string, t long, v string"
        )
        runs = run_lengths(df, ["k"], ["t"], "v")
        per_run = runs.groupBy("v", "run_grp").count().collect()
        got = sorted((r["v"], r["count"]) for r in per_run)
        # model: itertools.groupby run lengths
        import itertools

        expected = sorted((v, len(list(g))) for v, g in itertools.groupby(seq))
        assert got == expected


class TestSaltedAggregate:
    @prop
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["hot", "a", "b"]),
                st.integers(min_value=-100, max_value=100),
            ),
            min_size=1,
            max_size=50,
        )
    )
    def test_equals_plain_groupby(self, spark, rows):
        from cod_stats_spark.operators.skew import salted_aggregate

        df = spark.createDataFrame(
            [(k, i, v) for i, (k, v) in enumerate(rows)], "k string, rid long, v long"
        )
        salted = salted_aggregate(
            df, ["k"], [("v", "sum"), ("v", "max"), ("rid", "count")], "rid", buckets=4
        )
        plain = df.groupBy("k").agg(
            F.sum("v").alias("v_sum"), F.max("v").alias("v_max"),
            F.count("rid").alias("rid_count"),
        )
        def key(rws):
            return sorted((r["k"], r["v_sum"], r["v_max"], r["rid_count"]) for r in rws)

        assert key(salted.collect()) == key(plain.collect())


class TestAsofProperties:
    @prop
    @given(
        lts=st.lists(st.integers(0, 500), min_size=1, max_size=20),
        rts=st.lists(st.integers(0, 500), min_size=0, max_size=20),
    )
    def test_matches_model(self, spark, lts, rts):
        from cod_stats_spark.operators.asof_join import asof_join

        rts = sorted(set(rts))
        left = spark.createDataFrame(
            [(1, t, i) for i, t in enumerate(lts)], "k long, ts long, lid long"
        )
        right = spark.createDataFrame(
            [(1, t, float(t)) for t in rts] or [(2, 0, 0.0)],
            "k long, rts long, payload double",
        )
        out = {r["lid"]: r["payload"] for r in
               asof_join(left, right, ["k"], "ts", "rts", ["payload"]).collect()}
        for i, t in enumerate(lts):
            match = [r for r in rts if r <= t]
            expected = float(match[-1]) if match else None
            assert out[i] == expected


class TestSplitAndMixtureProperties:
    @prop
    @given(
        fracs=st.lists(
            st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
            min_size=2, max_size=4,
        ),
        salt=st.sampled_from(["", "a", "b"]),
    )
    def test_assign_splits_partitions_every_row(self, spark, fracs, salt):
        """For ANY fraction map (normalized), splits PARTITION the id
        space: every row gets exactly one split, totals add up, and a
        Python replay of the md5-bucket rule agrees row for row."""
        import hashlib

        from cod_stats_spark.operators.sampling import assign_splits

        total = sum(fracs)
        names = [f"s{i}" for i in range(len(fracs))]
        splits = {n: f / total for n, f in zip(names, fracs)}
        ids = list(range(300))
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        got = {
            r["id"]: r["split"]
            for r in assign_splits(df, "id", splits, salt=salt).collect()
        }
        assert set(got) == set(ids)

        buckets = 1 << 20
        cut, acc = [], 0.0
        for n in names[:-1]:
            acc += splits[n]
            cut.append((n, int(round(acc * buckets))))
        for i in ids:
            b = int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:5], 16)
            exp = names[-1]
            for n, thr in cut:
                if b < thr:
                    exp = n
                    break
            assert got[i] == exp

    @prop
    @given(
        w=st.dictionaries(
            st.sampled_from(["d0", "d1", "d2"]),
            st.floats(min_value=0.1, max_value=1.0, allow_nan=False),
            min_size=1, max_size=3,
        )
    )
    def test_mixture_sample_subset_and_domain_scoped(self, spark, w):
        """The mixture sample is a SUBSET of the input, contains only
        targeted domains, and is deterministic."""
        from cod_stats_spark.operators.sampling import mixture_sample

        rows = [(i, f"d{i % 4}") for i in range(400)]
        df = spark.createDataFrame(rows, "id long, dom string")
        out = mixture_sample(df, "id", "dom", w)
        got = {(r["id"], r["dom"]) for r in out.collect()}
        assert got <= set(rows)
        assert {d for _, d in got} <= set(w)
        again = {(r["id"], r["dom"]) for r in mixture_sample(df, "id", "dom", w).collect()}
        assert got == again


class TestWinnowProperties:
    """Winnowing guarantee (Schleimer et al.): for ANY two documents
    sharing a verbatim substring of length >= k + w - 1, the selected
    fingerprint sets intersect. Checked against a pure-Python replica
    of the selection rule on random texts with a planted shared run;
    also checks the Spark selection equals the replica exactly."""

    K, W = 8, 4

    @staticmethod
    def _select(text, k, w):
        import hashlib

        s = " ".join(text.lower().split())
        if not s:
            return set()
        n = max(len(s) - k + 1, 1)
        hs = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16)
            for i in range(n)
        ]
        m = max(len(hs) - w + 1, 1)
        return {min(hs[j : j + w]) for j in range(m)}

    @prop
    @given(
        pre=st.text(alphabet="abcdef ", max_size=40),
        mid=st.text(alphabet="ghijkl ", min_size=11, max_size=60),
        post=st.text(alphabet="mnopqr ", max_size=40),
    )
    def test_shared_run_always_fingerprinted(self, spark, pre, mid, post):
        from cod_stats_spark.operators.dedup import winnow_fingerprints

        # normalize the planted run the way the operator will, and
        # re-check it still meets the k+w-1 guarantee afterwards
        mid_norm = " ".join(mid.split())
        if len(mid_norm) < self.K + self.W - 1:
            return
        rows = [(1, f"{pre} {mid} {post}"), (2, f"zz {mid} yy")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["id"]: set(r["winnow_fp"])
            for r in winnow_fingerprints(
                df, "text", "doc_id", k=self.K, w=self.W, base_hash="md5_60"
            ).collect()
        }
        assert got[1] & got[2], "guarantee violated: no shared fingerprint"
        # Spark selection == pure-Python replica, doc by doc
        for doc_id, text in rows:
            assert got[doc_id] == self._select(text, self.K, self.W)


def _model_substring_dedup(texts, n, keep_first):
    """Pure-Python reference for ExactSubstr at gram granularity n:
    returns {doc_id: (clean_text, n_dup_tokens)}."""
    toks = {d: t.lower().split() for d, t in texts.items()}
    sites = {}  # gram -> [(doc, pos)]
    for d, tk in sorted(toks.items()):
        for p in range(len(tk) - n + 1):
            sites.setdefault(tuple(tk[p:p + n]), []).append((d, p))
    marked = {d: set() for d in toks}
    for gram, locs in sites.items():
        if len(locs) < 2:
            continue
        first = min(locs)
        for d, p in locs:
            if keep_first and (d, p) == first:
                continue
            marked[d].update(range(p, p + n))
    out = {}
    for d, tk in toks.items():
        kept = [w for i, w in enumerate(tk) if i not in marked[d]]
        out[d] = (" ".join(kept), len(tk) - len(kept))
    return out


class TestSubstringDedupProperties:
    @prop
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(list("abc")), min_size=0, max_size=18),
            min_size=1,
            max_size=6,
        ),
        n=st.integers(min_value=2, max_value=4),
        keep_first=st.booleans(),
    )
    def test_matches_python_reference(self, spark, docs, n, keep_first):
        """Random tiny-alphabet corpora force dense gram collisions —
        within-doc repeats, cross-doc overlaps, islands that merge —
        and the operator must equal the brute-force model on cleaned
        text AND removed-token counts (which pins span boundaries)."""
        from cod_stats_spark.operators.substring import substring_dedup

        texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_dup_tokens"])
            for r in substring_dedup(
                df, n=n, keep_first=keep_first
            ).collect()
        }
        assert got == _model_substring_dedup(texts, n, keep_first)


class TestChunkingProperties:
    @prop
    @given(
        words=st.lists(
            st.text(alphabet="xyz", min_size=1, max_size=4),
            min_size=0,
            max_size=40,
        ),
        max_tokens=st.integers(min_value=1, max_value=9),
        stride_delta=st.integers(min_value=0, max_value=4),
    )
    def test_cover_and_reconstruction(self, spark, words, max_tokens, stride_delta):
        """Every token position is covered by >= 1 chunk; with
        stride == max_tokens the chunks are disjoint and reassemble
        the normalized text exactly."""
        from cod_stats_spark.operators.chunking import chunk_documents

        stride = max(1, max_tokens - stride_delta)
        text = " ".join(words)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            (r["chunk_id"], r["chunk_start"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(
                df, max_tokens=max_tokens, stride=stride
            ).collect()
        )
        covered = set()
        for _, start, ntk, chunk in rows:
            toks = chunk.split() if chunk else []
            assert len(toks) == ntk
            assert toks == words[start:start + ntk]  # content == window
            covered.update(range(start, start + ntk))
        assert covered == set(range(len(words)))
        if stride == max_tokens:
            assert " ".join(t for _, _, _, t in rows if t) == " ".join(words)
