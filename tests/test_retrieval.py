"""BM25 / TF-IDF retrieval operator tests — verified against a plain
Python reference implementation on the same tokenization."""

from __future__ import annotations

import math

import pytest


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick tour of the spark catalyst optimizer"),
    (3, "dogs and foxes are both canids says the zoology text"),
    (4, "completely unrelated document about sequence packing budgets"),
    (5, "the the the the the"),  # stopword-ish repetition
]


def _py_bm25(corpus, query_terms, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in corpus}
    n = len(docs)
    avg_len = sum(len(v) for v in docs.values()) / n
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for i, toks in docs.items():
        s = 0.0
        matched = 0
        for q in query_terms:
            tf = toks.count(q)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avg_len))
        if matched:
            scores[i] = (round(s, 6), matched)
    return scores


class TestBm25:
    def test_matches_python_reference(self, spark):
        from cod_stats_spark.operators.retrieval import (
            bm25_scores,
            doc_term_freqs,
            idf_table,
        )

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        dtf = doc_term_freqs(docs)
        n = len(CORPUS)
        avg_len = sum(len(t.split()) for _, t in CORPUS) / n
        idf = idf_table(dtf, n)
        query = ["quick", "fox", "dog"]
        got = {
            r["doc_id"]: (r["score"], r["n_matched_terms"])
            for r in bm25_scores(dtf, idf, query, avg_len).collect()
        }
        exp = _py_bm25(CORPUS, query)
        assert set(got) == set(exp)
        for i in exp:
            assert got[i][1] == exp[i][1]
            assert got[i][0] == pytest.approx(exp[i][0], abs=1e-6)

    def test_topk_ordering_and_miss(self, spark):
        from cod_stats_spark.operators.retrieval import bm25_topk

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        top = bm25_topk(docs, "quick fox dog", k=3).collect()
        ids = [r["doc_id"] for r in top]
        # doc 1 holds fox AND dog AND quick-adjacent terms — must rank first;
        # doc 4 shares no term and must be absent entirely
        assert ids[0] == 1
        assert 4 not in ids
        scores = [r["score"] for r in top]
        assert scores == sorted(scores, reverse=True)

    def test_rrf_fusion(self, spark):
        """RRF: an id ranked well in BOTH lists beats an id that tops
        only one (k=60 standard)."""
        from cod_stats_spark.operators.retrieval import rrf_fuse

        lex = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], "id long, rank int"
        )
        emb = spark.createDataFrame(
            [(11, 1), (13, 2), (10, 3)], "id long, rank int"
        )
        got = {r["id"]: (r["rrf_score"], r["n_lists"])
               for r in rrf_fuse([lex, emb]).collect()}
        assert got[11][1] == 2 and got[13][1] == 1
        # 11: 1/62 + 1/61 ; 10: 1/61 + 1/63 ; both beat single-list 13
        assert got[11][0] > got[10][0] > got[13][0]
        assert got[11][0] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)

    def test_dtf_single_pass_doc_len(self, spark):
        from cod_stats_spark.operators.retrieval import doc_term_freqs

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        dtf = doc_term_freqs(docs)
        row = dtf.filter("doc_id = 5 and term = 'the'").first()
        assert (row["tf"], row["doc_len"]) == (5, 5)
        # one shuffle: a single partial+final aggregate pair
        plan = dtf._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


def test_multi_query_matches_per_query_rankings(spark):
    """bm25_rank_multi is a plan-shape optimization, not a semantics
    change: per tag it must equal bm25_rank_topk exactly."""
    from cod_stats_spark.operators.retrieval import bm25_rank_multi, bm25_rank_topk

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join hash join"),
            (2, "hash table scan filter"),
            (3, "window sort merge join spark"),
            (4, "filter scan scan scan filter"),
            (5, "join join join hash"),
        ],
        "doc_id long, text string",
    )
    queries = {"qa": ["hash", "join"], "qb": ["scan", "filter"]}
    multi = bm25_rank_multi(docs, queries, k=3)
    rows_multi = {
        (r["tag"], r["rank"], r["doc_id"], r["score"]) for r in multi.collect()
    }
    rows_single = set()
    for tag, terms in queries.items():
        for r in bm25_rank_topk(docs, terms, k=3).collect():
            rows_single.add((tag, r["rank"], r["doc_id"], r["score"]))
    assert rows_multi == rows_single


def test_multi_query_dedupes_repeated_terms(spark):
    """A duplicated term in a query list must not double-count its
    postings — isin() (single-query path) is duplicate-immune, the
    joined pairs table must be too."""
    from cod_stats_spark.operators.retrieval import bm25_rank_multi, bm25_rank_topk

    docs = spark.createDataFrame(
        [(1, "hash join scan"), (2, "hash hash filter"), (3, "scan scan scan")],
        "doc_id long, text string",
    )
    multi = bm25_rank_multi(docs, {"q": ["hash", "hash", "join"]}, k=3).collect()
    single = bm25_rank_topk(docs, ["hash", "hash", "join"], k=3).collect()
    assert sorted((r["doc_id"], r["score"], r["n_matched_terms"]) for r in multi) == \
           sorted((r["doc_id"], r["score"], r["n_matched_terms"]) for r in single)


class TestDtfIndex:
    """write_dtf_index / bm25_serve_multi — the round-7 split of index
    construction (write-once) from query serving (partition-pruned)."""

    def test_serve_parity_with_in_memory_path(self, spark, tmp_path):
        """Serving from the on-disk index must reproduce the in-memory
        bm25_rank_multi rows exactly — tags, ids, 6-dp scores, ranks,
        n_matched_terms."""
        from cod_stats_spark.operators.retrieval import (
            bm25_rank_multi,
            bm25_serve_multi,
            write_dtf_index,
        )

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        path = str(tmp_path / "dtf_idx")
        write_dtf_index(docs, path)
        queries = {"qa": ["quick", "fox", "dog"], "qb": ["catalyst", "text"]}
        mem = bm25_rank_multi(docs, queries, k=4)
        srv = bm25_serve_multi(spark, path, queries, k=4)
        key = lambda r: (
            r["tag"], r["rank"], r["doc_id"], r["score"], r["n_matched_terms"]
        )
        assert sorted(map(key, srv.collect())) == sorted(map(key, mem.collect()))

    def test_serve_prunes_to_probed_buckets(self, spark, tmp_path):
        """The postings scan must carry a term_bucket PartitionFilter
        (directory pruning) and only probed-bucket files may feed the
        result — the ann_lsh_topk_indexed assertion applied to the
        text index."""
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.retrieval import (
            DTF_INDEX_BUCKETS,
            _term_bucket,
            bm25_serve_multi,
            write_dtf_index,
        )

        # widen the vocabulary so several buckets exist on disk
        rows = [(i, f"w{i} w{i+1} shared token{i % 7}") for i in range(200)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path / "dtf_idx")
        write_dtf_index(docs, path)
        written = {
            r["term_bucket"]
            for r in spark.read.parquet(f"{path}/postings")
            .select("term_bucket").distinct().collect()
        }
        assert len(written) > 2  # pruning has something to skip

        out = bm25_serve_multi(spark, path, {"q": ["shared", "w3"]}, k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "term_bucket" in plan
        probe = {
            int(v)
            for v in spark.range(1)
            .select(
                _term_bucket(F.lit("shared")).alias("a"),
                _term_bucket(F.lit("w3")).alias("b"),
            )
            .first()
        }
        assert probe < written  # strictly fewer buckets read than exist
        assert out.count() == 5

    def test_index_stats_match_corpus(self, spark, tmp_path):
        from cod_stats_spark.operators.retrieval import write_dtf_index

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        path = str(tmp_path / "dtf_idx")
        write_dtf_index(docs, path)
        st = spark.read.parquet(f"{path}/stats").first()
        assert int(st["n_docs"]) == len(CORPUS)
        want_avg = sum(len(t.split()) for _, t in CORPUS) / len(CORPUS)
        assert abs(st["avg_len"] - want_avg) < 1e-9
