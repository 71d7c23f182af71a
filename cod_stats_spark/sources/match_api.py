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

The transport is pluggable. The built-in one serves a DIRECTORY
laid out like the API (pages/page_<n>.json with ``match_ids`` +
``next_page``; details/<id>.json) — the unit-testable stand-in this
environment allows; an HTTP transport drops in without touching the
reader logic (the seam mirrors multimodal.py's codec registry).
"""

from __future__ import annotations

import json
import os
import time
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
    """

    _transient_seen: dict[str, int] = {}

    def __init__(self, root: str):
        self.root = root

    def get(self, rel_path: str) -> dict:
        full = os.path.join(self.root, rel_path)
        with open(full) as f:
            doc = json.load(f)
        fail_times = doc.get("__transient__")
        if fail_times:
            seen = FileTransport._transient_seen.get(full, 0)
            if seen < fail_times:
                FileTransport._transient_seen[full] = seen + 1
                raise TransientApiError(f"transient failure {seen + 1}/{fail_times}: {rel_path}")
        return doc


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
        transport = FileTransport(self.root)
        return [
            _PagePartition(page, ids)
            for page, ids in fetch_page_ids(transport, backoff=self._backoff)
        ]

    def read(self, partition: _PagePartition):
        transport = FileTransport(self.root)
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
    """

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("cod_match_api requires .option('path', <api root dir>)")
        self.batch_size = int(options.get("batchsize", 10))
        self.max_retries = int(options.get("maxretries", 4))
        self.base_delay = float(options.get("basedelay", 0.05))

    def _backoff(self, fn):
        return with_backoff(fn, self.max_retries, self.base_delay)

    def initialOffset(self) -> dict:
        return {"next_page": 0}

    def _read_range(self, start_page: int, end_page: int | None):
        transport = FileTransport(self.root)
        rows = []
        page = start_page
        while end_page is None or page < end_page:
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
        rows, next_page = self._read_range(int(start["next_page"]), None)
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
