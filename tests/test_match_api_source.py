"""Paginated match-API data source tests (SURVEY S1/S2/S4)."""

from __future__ import annotations

import json

import pytest


def _write_api(root, pages: list[list[str]], transient: dict | None = None):
    """Lay out a fake API directory: pages/ + details/."""
    (root / "pages").mkdir(parents=True)
    (root / "details").mkdir()
    for i, ids in enumerate(pages):
        doc = {"match_ids": ids, "next_page": i + 1 if i + 1 < len(pages) else None}
        (root / "pages" / f"page_{i}.json").write_text(json.dumps(doc))
    for ids in pages:
        for mid in ids:
            doc = {"matchID": mid, "kills": len(mid)}
            if transient and mid in transient:
                doc["__transient__"] = transient[mid]
            (root / "details" / f"{mid}.json").write_text(json.dumps(doc))


class TestPureFetchLogic:
    def test_pagination_walks_cursor(self, tmp_path):
        from cod_stats_spark.sources.match_api import FileTransport, fetch_page_ids

        _write_api(tmp_path, [["a1", "a2"], ["b1"], ["c1", "c2", "c3"]])
        pages = list(fetch_page_ids(FileTransport(str(tmp_path))))
        assert pages == [(0, ["a1", "a2"]), (1, ["b1"]), (2, ["c1", "c2", "c3"])]

    def test_backoff_retries_then_succeeds(self, tmp_path):
        from cod_stats_spark.sources.match_api import (
            FileTransport,
            fetch_details_batched,
            with_backoff,
        )

        _write_api(tmp_path, [["x1"]], transient={"x1": 2})
        delays: list[float] = []

        def backoff(fn):
            return with_backoff(fn, max_retries=4, base_delay_s=1.0, sleeper=delays.append)

        got = dict(
            fetch_details_batched(FileTransport(str(tmp_path)), ["x1"], backoff=backoff)
        )
        assert json.loads(got["x1"])["matchID"] == "x1"
        assert delays == [1.0, 2.0]  # exponential: base, base*2

    def test_backoff_gives_up_after_max_retries(self, tmp_path):
        from cod_stats_spark.sources.match_api import (
            FileTransport,
            TransientApiError,
            with_backoff,
        )

        _write_api(tmp_path, [["y1"]], transient={"y1": 99})
        t = FileTransport(str(tmp_path))
        with pytest.raises(TransientApiError):
            with_backoff(
                lambda: t.get("details/y1.json"),
                max_retries=2,
                base_delay_s=0.0,
                sleeper=lambda s: None,
            )


class TestStreamingApiSource:
    def test_incremental_pages_exactly_once(self, spark, tmp_path):
        """readStream over the API: batch 1 ingests complete pages,
        the filling tail page is deferred; after the publisher appends
        a page, the next batch picks up ONLY the newly-completed page —
        no re-reads, no gaps."""
        import uuid

        from cod_stats_spark.sources.match_api import register_match_api_source

        # pages 0,1 complete; page 1 is tail (next_page null) → deferred
        _write_api(tmp_path, [["a1", "a2"], ["b1"]])
        register_match_api_source(spark)
        stream = (
            spark.readStream.format("cod_match_api")
            .option("path", str(tmp_path))
            .option("baseDelay", "0.01")
            .load()
        )
        name = f"api_{uuid.uuid4().hex[:8]}"
        q = (stream.writeStream.outputMode("append").format("memory")
             .queryName(name).start())
        try:
            q.processAllAvailable()
            got1 = {r["match_id"] for r in spark.table(name).collect()}
            assert got1 == {"a1", "a2"}  # page 0 only: page 1 still filling

            # publisher completes page 1 by appending page 2 (new tail)
            (tmp_path / "pages" / "page_1.json").write_text(
                json.dumps({"match_ids": ["b1"], "next_page": 2})
            )
            (tmp_path / "pages" / "page_2.json").write_text(
                json.dumps({"match_ids": ["c1"], "next_page": None})
            )
            (tmp_path / "details" / "c1.json").write_text(
                json.dumps({"matchID": "c1", "kills": 2})
            )
            q.processAllAvailable()
            rows = spark.table(name).collect()
            got2 = [r["match_id"] for r in rows]
            assert sorted(got2) == ["a1", "a2", "b1"]  # b1 once, c1 deferred
        finally:
            q.stop()


class TestApiToEngine:
    def test_api_bronze_matches_file_bronze(self, spark, fixture_dirs, tmp_path):
        """The connector feeds the SAME bronze contract as the file
        glob: identical (game_id, player_uno_id) keys and stats structs
        for the reference-shaped fixture corpus."""
        import pathlib

        from cod_stats_spark.engine.ingest import read_matches, read_matches_from_api

        mdir, _ = fixture_dirs
        files = sorted(pathlib.Path(mdir).glob("match_*.json"))
        # serve the fixture corpus as a 2-page API: detail id = filename
        # stem (matchID alone is not unique across players)
        (tmp_path / "pages").mkdir()
        (tmp_path / "details").mkdir()
        ids = [f.stem.replace("match_", "") for f in files]
        half = len(ids) // 2
        for i, chunk in enumerate((ids[:half], ids[half:])):
            (tmp_path / "pages" / f"page_{i}.json").write_text(
                json.dumps({"match_ids": chunk, "next_page": 1 if i == 0 else None})
            )
        for f, mid in zip(files, ids):
            (tmp_path / "details" / f"{mid}.json").write_text(f.read_text())

        via_api = read_matches_from_api(spark, str(tmp_path))
        via_files = read_matches(spark, f"{mdir}/*.json")
        keys_api = {(r["game_id"], r["player_uno_id"]) for r in via_api.collect()}
        keys_files = {(r["game_id"], r["player_uno_id"]) for r in via_files.collect()}
        assert keys_api == keys_files
        # spot-check a stats struct round-trips identically
        a = via_api.filter("game_id = 'g001'").select("stats.playerStats.kills").first()
        b = via_files.filter("game_id = 'g001'").select("stats.playerStats.kills").first()
        assert a == b


class TestChecksumSync:
    def test_only_changed_files_copy(self, tmp_path):
        from cod_stats_spark.sources.checksum_sync import sync_with_checksums

        src = tmp_path / "site"
        (src / "sub").mkdir(parents=True)
        (src / "a.json").write_text('{"v": 1}')
        (src / "sub" / "b.json").write_text('{"v": 2}')
        dest = tmp_path / "pub"
        dest.mkdir()

        first = sync_with_checksums(str(src), str(dest))
        assert first == {"a.json": "copied", "sub/b.json": "copied"}
        assert (dest / "sub" / "b.json").read_text() == '{"v": 2}'

        # re-sync with one changed file: only it copies
        (src / "a.json").write_text('{"v": 99}')
        second = sync_with_checksums(str(src), str(dest))
        assert second == {"a.json": "copied", "sub/b.json": "unchanged"}
        assert (dest / "a.json").read_text() == '{"v": 99}'
        import json as js

        manifest = js.loads((dest / ".checksums.json").read_text())
        assert set(manifest) == {"a.json", "sub/b.json"}


class TestSparkDataSource:
    def test_read_format_end_to_end(self, spark, tmp_path):
        from cod_stats_spark.sources.match_api import register_match_api_source

        pages = [["a1", "a2"], ["b1"], ["c1", "c2", "c3"]]
        _write_api(tmp_path, pages)
        register_match_api_source(spark)
        df = (
            spark.read.format("cod_match_api")
            .option("path", str(tmp_path))
            .option("batchSize", "2")
            .load()
        )
        rows = df.collect()
        assert {r["match_id"] for r in rows} == {"a1", "a2", "b1", "c1", "c2", "c3"}
        # one partition per page — detail fetches distribute
        assert df.rdd.getNumPartitions() == len(pages)
        by_page = {r["match_id"]: r["page"] for r in rows}
        assert by_page["a1"] == 0 and by_page["b1"] == 1 and by_page["c3"] == 2
        # payloads are the detail documents, parseable downstream with
        # the engine's normal JSON path
        payload = json.loads(rows[0]["payload"])
        assert payload["matchID"] == rows[0]["match_id"]

    def test_transient_failures_survive_through_spark(self, spark, tmp_path):
        from cod_stats_spark.sources.match_api import register_match_api_source

        _write_api(tmp_path, [["f1", "f2"]], transient={"f1": 1})
        register_match_api_source(spark)
        df = (
            spark.read.format("cod_match_api")
            .option("path", str(tmp_path))
            .option("baseDelay", "0.01")
            .load()
        )
        assert {r["match_id"] for r in df.collect()} == {"f1", "f2"}


# ---------------------------------------------------------------- HTTP


class _LoopbackApi:
    """Threaded http.server over an api directory, with plant-able
    failure injection: ``fail_once[path] = (times, status)`` answers
    that relative path with ``status`` its first ``times`` hits.
    Thread-safe enough for local[32] (GIL-atomic dict ops)."""

    def __init__(self, root):
        import http.server
        import threading

        self.root = str(root)
        self.fail_once: dict[str, list] = {}  # rel path -> [remaining, status]
        self.stall: dict[str, float] = {}  # rel path -> seconds before body
        self.hits: dict[str, int] = {}
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                import os

                rel = self.path.lstrip("/")
                outer.hits[rel] = outer.hits.get(rel, 0) + 1
                plant = outer.fail_once.get(rel)
                if plant and plant[0] > 0:
                    plant[0] -= 1
                    self.send_response(plant[1])
                    self.end_headers()
                    return
                full = os.path.join(outer.root, rel)
                if not os.path.isfile(full):
                    self.send_response(404)
                    self.end_headers()
                    return
                body = open(full, "rb").read()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                delay = outer.stall.get(rel)
                if delay:
                    import time as _time

                    _time.sleep(delay)  # headers sent, body withheld
                self.wfile.write(body)

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture
def loopback_api(tmp_path):
    api = _LoopbackApi(tmp_path)
    yield tmp_path, api
    api.close()


class TestHttpTransport:
    """The seam proven, not promised: the SAME reader logic runs the
    reference fetcher's contract (fetcher/fetch_matches.ts:282-302
    pagination, :149-218 retry/batch) over a real HTTP loopback."""

    def test_pagination_walks_cursor_over_http(self, loopback_api):
        from cod_stats_spark.sources.match_api import HttpTransport, fetch_page_ids

        root, api = loopback_api
        _write_api(root, [["a1", "a2"], ["b1"]])
        pages = list(fetch_page_ids(HttpTransport(api.url)))
        assert pages == [(0, ["a1", "a2"]), (1, ["b1"])]

    def test_429_retries_then_succeeds(self, loopback_api):
        from cod_stats_spark.sources.match_api import (
            HttpTransport,
            fetch_details_batched,
            with_backoff,
        )

        root, api = loopback_api
        _write_api(root, [["x1"]])
        api.fail_once["details/x1.json"] = [2, 429]
        delays: list[float] = []

        def backoff(fn):
            return with_backoff(fn, max_retries=4, base_delay_s=1.0, sleeper=delays.append)

        got = dict(fetch_details_batched(HttpTransport(api.url), ["x1"], backoff=backoff))
        assert json.loads(got["x1"])["matchID"] == "x1"
        assert delays == [1.0, 2.0]          # same exponential contract
        assert api.hits["details/x1.json"] == 3  # 2 rate-limited + 1 ok

    def test_5xx_transient_404_permanent(self, loopback_api):
        from cod_stats_spark.sources.match_api import HttpTransport, TransientApiError

        root, api = loopback_api
        _write_api(root, [["x1"]])
        api.fail_once["pages/page_0.json"] = [1, 503]
        t = HttpTransport(api.url)
        with pytest.raises(TransientApiError):
            t.get("pages/page_0.json")
        assert t.get("pages/page_0.json")["match_ids"] == ["x1"]
        with pytest.raises(FileNotFoundError):
            t.get("pages/page_99.json")

    def test_spark_read_over_http_matches_file_read(self, spark, loopback_api):
        """Identical rows whether the connector reads the directory or
        the HTTP server publishing it — including a planted 429 burst
        surviving through executor-side retries."""
        from cod_stats_spark.sources.match_api import register_match_api_source

        root, api = loopback_api
        pages = [["a1", "a2"], ["b1"], ["c1", "c2", "c3"]]
        _write_api(root, pages)
        api.fail_once["details/b1.json"] = [1, 429]
        register_match_api_source(spark)

        def rows_for(path):
            df = (
                spark.read.format("cod_match_api")
                .option("path", path)
                .option("batchSize", "2")
                .option("baseDelay", "0.01")
                .load()
            )
            assert df.rdd.getNumPartitions() == len(pages)
            return sorted((r["page"], r["match_id"], r["payload"]) for r in df.collect())

        assert rows_for(api.url) == rows_for(str(root))


class TestTransientScoping:
    def test_reset_transients_rearms_planted_failures(self, tmp_path):
        """Round-5 verdict (what's-wrong #4): the per-process transient
        ledger is keyed by absolute path and resettable per root, so a
        same-process stream restart can choose fresh failures without
        clobbering other fixtures."""
        from cod_stats_spark.sources.match_api import FileTransport, TransientApiError

        a = tmp_path / "api_a"
        b = tmp_path / "api_b"
        _write_api(a, [["x1"]], transient={"x1": 1})
        _write_api(b, [["x1"]], transient={"x1": 1})

        ta = FileTransport(str(a))
        with pytest.raises(TransientApiError):
            ta.get("details/x1.json")
        assert ta.get("details/x1.json")["matchID"] == "x1"
        # a NEW instance (restart without reset) sees the consumed state
        assert FileTransport(str(a)).get("details/x1.json")["matchID"] == "x1"

        # reset of root B must NOT re-arm root A ...
        tb = FileTransport(str(b))
        with pytest.raises(TransientApiError):
            tb.get("details/x1.json")
        FileTransport.reset_transients(str(b))
        assert FileTransport(str(a)).get("details/x1.json")["matchID"] == "x1"
        with pytest.raises(TransientApiError):  # ... but B is re-armed
            FileTransport(str(b)).get("details/x1.json")
        # reset of A re-arms A (the stream-restart scenario)
        FileTransport.reset_transients(str(a))
        with pytest.raises(TransientApiError):
            FileTransport(str(a)).get("details/x1.json")

    def test_stream_restart_same_process_replays_planted_failures(self, spark, tmp_path):
        """Two sequential streams in ONE process over the same fixture:
        after reset_transients the second stream hits (and survives)
        the planted transient exactly like the first did."""
        import uuid

        from cod_stats_spark.sources.match_api import (
            FileTransport,
            register_match_api_source,
        )

        _write_api(tmp_path, [["a1"], ["b1"]], transient={"a1": 1})
        register_match_api_source(spark)

        def run_stream():
            name = f"api_restart_{uuid.uuid4().hex[:8]}"
            q = (
                spark.readStream.format("cod_match_api")
                .option("path", str(tmp_path))
                .option("baseDelay", "0.01")
                .load()
                .writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
                return {r["match_id"] for r in spark.table(name).collect()}
            finally:
                q.stop()

        assert run_stream() == {"a1"}          # consumed the planted failure
        FileTransport.reset_transients(str(tmp_path))
        assert run_stream() == {"a1"}          # restart replays it, still succeeds


class TestStreamBatchCap:
    def test_max_pages_per_batch_bounds_each_microbatch(self, tmp_path):
        """ADVICE r5: a backlog must drain across micro-batches, not in
        one unbounded driver-side list."""
        from cod_stats_spark.sources.match_api import MatchApiStreamReader

        _write_api(tmp_path, [[f"p{i}"] for i in range(6)])  # pages 0..5, 5 is tail
        r = MatchApiStreamReader(
            {"path": str(tmp_path), "basedelay": "0.0", "maxpagesperbatch": "2"}
        )
        rows1, off1 = r.read({"next_page": 0})
        assert [x[0] for x in rows1] == [0, 1] and off1 == {"next_page": 2}
        rows2, off2 = r.read(off1)
        assert [x[0] for x in rows2] == [2, 3] and off2 == {"next_page": 4}
        rows3, off3 = r.read(off2)
        # page 4 is the last COMPLETE page; tail page 5 stays deferred
        assert [x[0] for x in rows3] == [4] and off3 == {"next_page": 5}
        # replay of a committed range ignores the cap (bounded by offsets)
        replay = list(r.readBetweenOffsets({"next_page": 0}, {"next_page": 4}))
        assert [x[0] for x in replay] == [0, 1, 2, 3]


class TestHttpReadTimeout:
    def test_stalled_body_is_transient(self, loopback_api):
        """A server that accepts the connection then stalls mid-body
        raises socket.timeout from resp.read() — NOT a URLError; it
        must map to TransientApiError so backoff retries it
        (code-review r6 finding)."""
        from cod_stats_spark.sources.match_api import HttpTransport, TransientApiError

        root, api = loopback_api
        _write_api(root, [["s1"]])
        api.stall["details/s1.json"] = 1.0
        t = HttpTransport(api.url, timeout_s=0.2)
        with pytest.raises(TransientApiError, match="read timeout"):
            t.get("details/s1.json")
        # once the stall is lifted the same transport succeeds
        api.stall.clear()
        assert t.get("details/s1.json")["matchID"] == "s1"
