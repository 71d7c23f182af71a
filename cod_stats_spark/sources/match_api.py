"""Paginated match-API connector as a real Spark data source.

Reference behaviors re-expressed Spark-side (SURVEY §2.1 S1/S2/S4 —
fetcher/fetch_matches.ts): a cursor-paginated listing endpoint, per-id
detail fetches done in bounded batches, and transient-failure retry
with exponential backoff. The reference runs these as a pre-Spark
Node script; Spark 4's Python Data Source API lets the same contract
be a first-class ``spark.read.format("cod_match_api")`` connector:

- **Pagination (S1)** is inherently serial per cursor, so the DRIVER
  walks the page listing (cheap: ids only, no payloads) inside
  ``partitions()`` and emits ONE InputPartition PER PAGE.
- **Detail fetches (S2)** — the heavy I/O — run distributed: each
  executor task fetches its page's documents in ``batch_size`` groups.
- **Backoff (S4)** wraps every transport call: exponential delay on
  transient errors, bounded retries, injectable sleeper so tests (and
  cron deployments) control real time.

The transport is pluggable behind ``make_transport(root)``: an
``http(s)://`` root gets :class:`HttpTransport` (urllib GET per
endpoint; 429/5xx → retryable, 404 → permanent — mirroring the
reference fetcher's status handling, fetcher/fetch_matches.ts:149-218,
282-302); any other root gets :class:`FileTransport`, which serves a
DIRECTORY laid out like the API (pages/page_<n>.json with
``match_ids`` + ``next_page``; details/<id>.json). Reader logic never
knows which transport it got — tests/test_match_api_source.py runs the
same pagination/backoff/batch contracts through BOTH, the HTTP one
against a loopback http.server.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class TransientApiError(Exception):
    """Retryable failure (HTTP 429/5xx analog)."""


class FileTransport:
    """Serves ``{root}/pages/page_<n>.json`` and ``{root}/details/<id>.json``.

    A path whose file is missing raises FileNotFoundError (permanent);
    a file containing ``{"__transient__": k}`` raises TransientApiError
    on each of its first k reads PER PROCESS — letting tests (and the
    fixture generator) plant rate-limit behavior deterministically.
    The counters are process-global ON PURPOSE (a transient failure is
    a moment-in-time event, not per-reader-instance state, and readers
    construct a fresh transport per call) but keyed by absolute path
    and resettable: a same-process stream RESTART that wants the
    planted failures to fire again calls :meth:`reset_transients`
    (see the restart test).
    """

    _transient_seen: dict[str, int] = {}

    def __init__(self, root: str):
        self.root = root

    @classmethod
    def reset_transients(cls, root: str | None = None) -> None:
        """Forget consumed transient-failure counts — all of them, or
        only those under ``root`` (so one fixture's reset cannot eat
        another concurrent fixture's planted failures)."""
        if root is None:
            cls._transient_seen.clear()
            return
        prefix = os.path.abspath(root) + os.sep
        for k in [k for k in cls._transient_seen if k.startswith(prefix)]:
            del cls._transient_seen[k]

    def get(self, rel_path: str) -> dict:
        full = os.path.abspath(os.path.join(self.root, rel_path))
        with open(full) as f:
            doc = json.load(f)
        fail_times = doc.get("__transient__")
        if fail_times:
            seen = FileTransport._transient_seen.get(full, 0)
            if seen < fail_times:
                FileTransport._transient_seen[full] = seen + 1
                raise TransientApiError(f"transient failure {seen + 1}/{fail_times}: {rel_path}")
        return doc


class HttpTransport:
    """GETs ``{base_url}/{rel_path}`` and parses the JSON body.

    Status mapping mirrors the reference fetcher: 404 is permanent
    (FileNotFoundError — the cursor ran past the published tail);
    429 and 5xx are retryable (TransientApiError, handled by
    ``with_backoff`` exactly like the file transport's planted
    failures); connection-level errors are retryable too (a flaky
    network is the canonical transient).
    """

    def __init__(self, base_url: str, timeout_s: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s

    def get(self, rel_path: str) -> dict:
        url = f"{self.base_url}/{rel_path}"
        try:
            with urllib.request.urlopen(url, timeout=self.timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(url) from e
            if e.code == 429 or e.code >= 500:
                raise TransientApiError(f"HTTP {e.code}: {url}") from e
            raise
        except urllib.error.URLError as e:
            raise TransientApiError(f"connection error: {url} ({e.reason})") from e
        except TimeoutError as e:
            # a server that accepts the connection then stalls mid-body
            # raises socket.timeout from resp.read() — NOT a URLError;
            # it is the canonical transient and must retry, not kill
            # the partition
            raise TransientApiError(f"read timeout: {url}") from e


def make_transport(root: str):
    """The transport seam: http(s) roots → HttpTransport, everything
    else → FileTransport. Readers call this and stay transport-blind."""
    if root.startswith(("http://", "https://")):
        return HttpTransport(root)
    return FileTransport(root)


def with_backoff(
    fn: Callable[[], dict],
    max_retries: int = 4,
    base_delay_s: float = 0.5,
    sleeper: Callable[[float], None] = time.sleep,
) -> dict:
    """Call ``fn``; on TransientApiError retry with exponential backoff
    (base · 2^attempt). Re-raises after ``max_retries`` retries."""
    attempt = 0
    while True:
        try:
            return fn()
        except TransientApiError:
            if attempt >= max_retries:
                raise
            sleeper(base_delay_s * (2**attempt))
            attempt += 1


def fetch_page_ids(
    transport,
    start_page: int = 0,
    max_pages: int = 10_000,
    backoff=with_backoff,
) -> Iterator[tuple[int, list[str]]]:
    """Walk the page cursor from ``start_page``: yields (page, ids).
    Stops at ``next_page: null`` (or the max_pages safety bound)."""
    page = start_page
    for _ in range(max_pages):
        doc = backoff(lambda: transport.get(f"pages/page_{page}.json"))
        yield page, list(doc.get("match_ids", []))
        nxt = doc.get("next_page")
        if nxt is None:
            return
        page = int(nxt)


def fetch_details_batched(
    transport,
    ids: Sequence[str],
    batch_size: int = 10,
    backoff=with_backoff,
) -> Iterator[tuple[str, str]]:
    """(id, payload-json) for each id, fetched in ``batch_size`` groups
    (the reference throttles detail fetches the same way)."""
    for i in range(0, len(ids), batch_size):
        for mid in ids[i : i + batch_size]:
            doc = backoff(lambda m=mid: transport.get(f"details/{m}.json"))
            yield mid, json.dumps(doc, sort_keys=True)


class _PagePartition(InputPartition):
    def __init__(self, page: int, ids: list[str]):
        self.page = page
        self.ids = ids


class MatchApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("cod_match_api requires .option('path', <api root dir>)")
        self.batch_size = int(options.get("batchsize", 10))
        self.max_retries = int(options.get("maxretries", 4))
        self.base_delay = float(options.get("basedelay", 0.05))

    def _backoff(self, fn):
        return with_backoff(fn, self.max_retries, self.base_delay)

    def partitions(self):
        # driver-side cursor walk: ids only — payload bytes never
        # touch the driver
        transport = make_transport(self.root)
        return [
            _PagePartition(page, ids)
            for page, ids in fetch_page_ids(transport, backoff=self._backoff)
        ]

    def read(self, partition: _PagePartition):
        transport = make_transport(self.root)
        for mid, payload in fetch_details_batched(
            transport, partition.ids, self.batch_size, backoff=self._backoff
        ):
            yield (partition.page, mid, payload)


class MatchApiStreamReader(SimpleDataSourceStreamReader):
    """Incremental polling (the reference's cron pull, engine-side):
    the streaming offset is the page cursor ``{"next_page": n}``. Each
    micro-batch reads every COMPLETE new page past the committed
    cursor; the partially-filled tail page is left for a later batch
    (its contents may still grow), so a page is ingested exactly once.
    Exactly-once delivery then follows from Spark's offset log — a
    crashed batch replays the same [start, end) via readBetweenOffsets.

    ``maxPagesPerBatch`` (default 50) bounds one micro-batch: after a
    backlog (a long-down stream, a huge initial history) the whole
    uncommitted range would otherwise land in ONE batch's driver-side
    row list — an OOM/latency hazard. Leftover pages are picked up by
    the following micro-batches via the committed cursor offset.
    """

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("cod_match_api requires .option('path', <api root dir>)")
        self.batch_size = int(options.get("batchsize", 10))
        self.max_retries = int(options.get("maxretries", 4))
        self.base_delay = float(options.get("basedelay", 0.05))
        self.max_pages_per_batch = int(options.get("maxpagesperbatch", 50))

    def _backoff(self, fn):
        return with_backoff(fn, self.max_retries, self.base_delay)

    def initialOffset(self) -> dict:
        return {"next_page": 0}

    def _read_range(
        self, start_page: int, end_page: int | None, max_pages: int | None = None
    ):
        transport = make_transport(self.root)
        rows = []
        page = start_page
        while end_page is None or page < end_page:
            if max_pages is not None and page - start_page >= max_pages:
                break  # cap this micro-batch; cursor resumes here next batch
            try:
                doc = self._backoff(lambda: transport.get(f"pages/page_{page}.json"))
            except FileNotFoundError:
                break  # cursor past the published tail
            has_next = doc.get("next_page") is not None
            if end_page is None and not has_next:
                break  # tail page may still be filling — do not consume
            ids = list(doc.get("match_ids", []))
            for mid, payload in fetch_details_batched(
                transport, ids, self.batch_size, backoff=self._backoff
            ):
                rows.append((page, mid, payload))
            page += 1
        return rows, page

    def read(self, start: dict):
        rows, next_page = self._read_range(
            int(start["next_page"]), None, max_pages=self.max_pages_per_batch
        )
        return iter(rows), {"next_page": next_page}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._read_range(int(start["next_page"]), int(end["next_page"]))
        return iter(rows)


class MatchApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cod_match_api"

    def schema(self) -> str:
        return "page int, match_id string, payload string"

    def reader(self, schema) -> MatchApiReader:
        return MatchApiReader(self.options)

    def simpleStreamReader(self, schema) -> MatchApiStreamReader:
        return MatchApiStreamReader(self.options)


def register_match_api_source(spark) -> None:
    """Idempotent registration: spark.read.format('cod_match_api')."""
    spark.dataSource.register(MatchApiDataSource)
