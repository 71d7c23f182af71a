"""Versioned rewrite-state for foreachBatch maintenance loops.

Append-only state (the incremental-dedup index) just appends; state
that must be REWRITTEN per batch (SCD2 dimensions, gram censuses)
needs the version/commit protocol: read the newest COMMITTED snapshot,
write the NEXT version dir (never touching the one the lazy plan
reads — no read-overwrite conflict), then commit it MANIFEST-LAST by
creating an empty marker file ``_COMMIT.v{N}``.

The commit is rename-free on purpose (round-9 verdict, what's-wrong
#3): the r9 protocol repointed a ``_CURRENT`` file with
``os.replace``, which is atomic only on a POSIX local filesystem —
object stores (S3) have no atomic rename at all, and HDFS needs the
Hadoop FileSystem API. Creating a NEW, uniquely-named marker is the
one primitive every storage layer provides with atomic visibility
(a directory entry / a PUT): the version is encoded in the marker's
NAME, its content is never read, so a reader can never observe a
half-written pointer. Crash between data write and marker: the
dangling ``v=N`` dir is invisible and the next writer overwrites it.
Crash after the marker: durable.

Pointer/marker I/O routes through a minimal FS interface:
local ``os`` for plain paths, the Hadoop FileSystem API (via the
session JVM) for schemed paths (``file:``, ``hdfs:``, ``s3a:`` …) —
so the protocol follows wherever Spark can write parquet. A custom
``fs`` object (exists/mkdirs/list_names/read_text/create_text) can be
injected for tests; the interface deliberately has NO rename, proving
nothing depends on one.

Single-writer per state_dir (foreachBatch serializes batches); legacy
r9 dirs with a ``_CURRENT`` pointer are still readable — the first
new write commits ``legacy+1`` with a marker, which takes precedence
from then on.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_MARKER = re.compile(r"^_COMMIT\.v(\d+)(?:\.(.+))?$")


class _LocalStateFS:
    """Plain-path backend (the common local/testing case)."""

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def list_names(self, d: str) -> list[str]:
        return os.listdir(d) if os.path.isdir(d) else []

    def read_text(self, p: str) -> str:
        with open(p) as f:
            return f.read()

    def create_text(self, p: str, s: str) -> None:
        # a NEW unique name per call — visibility of the directory
        # entry is the atomic event; content is never read back
        with open(p, "w") as f:
            f.write(s)

    def list_files(self, d: str) -> list[str]:
        """All regular files under ``d``, recursively (full paths)."""
        out = []
        for root, _dirs, names in os.walk(d):
            out.extend(os.path.join(root, n) for n in names)
        return out

    def delete(self, p: str) -> None:
        if os.path.isdir(p):
            import shutil

            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)


class _HadoopStateFS:
    """Schemed-path backend through the JVM Hadoop FileSystem —
    whatever filesystem Spark itself writes the parquet through."""

    def __init__(self, spark: SparkSession, base: str):
        self._jPath = spark._jvm.org.apache.hadoop.fs.Path
        self._fs = self._jPath(base).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._jPath(p))

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._jPath(p))

    def list_names(self, d: str) -> list[str]:
        jp = self._jPath(d)
        if not self._fs.exists(jp):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(jp)]

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._jPath(p))
        try:
            out = bytearray()
            while True:
                b = stream.read()
                if b < 0:
                    break
                out.append(b)
            return out.decode()
        finally:
            stream.close()

    def create_text(self, p: str, s: str) -> None:
        out = self._fs.create(self._jPath(p), True)
        try:
            out.write(bytearray(s.encode()))
        finally:
            out.close()

    def list_files(self, d: str) -> list[str]:
        """All regular files under ``d``, recursively (full paths)."""
        jp = self._jPath(d)
        if not self._fs.exists(jp):
            return []
        it = self._fs.listFiles(jp, True)
        out = []
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return out

    def delete(self, p: str) -> None:
        self._fs.delete(self._jPath(p), True)


def _fs_for(spark: SparkSession, path: str):
    return _HadoopStateFS(spark, path) if "://" in path or path.startswith(
        "file:"
    ) else _LocalStateFS()


def current_version(state_dir: str, fs=None) -> int | None:
    """Newest committed version: max over ``_COMMIT.v{N}`` markers,
    falling back to (and unioned with) the legacy r9 ``_CURRENT``
    pointer so pre-upgrade state dirs stay readable."""
    fs = fs or _LocalStateFS()
    versions = [
        int(m.group(1))
        for m in (_MARKER.match(n) for n in fs.list_names(state_dir))
        if m
    ]
    legacy = os.path.join(state_dir, "_CURRENT")
    if fs.exists(legacy):
        try:
            versions.append(int(fs.read_text(legacy).strip()))
        except ValueError:
            pass
    return max(versions) if versions else None


def read_state(
    spark: SparkSession, state_dir: str, fs=None
) -> DataFrame | None:
    """The live snapshot, or None before the first commit."""
    fs = fs or _fs_for(spark, state_dir)
    v = current_version(state_dir, fs)
    if v is None:
        return None
    return spark.read.parquet(f"{state_dir}/v={v}")


def find_version_by_note(state_dir: str, note: str, fs=None) -> int | None:
    """The version whose commit marker carries ``note`` (None if no
    commit did). Notes ride the marker NAME — `_COMMIT.v{N}.{note}` —
    so a writer's version and its note become visible in ONE atomic
    directory-entry creation; an at-least-once caller (foreachBatch)
    tags each commit with its batch id and detects replays by looking
    the id up here, with no window where the data is committed but the
    tag is not."""
    fs = fs or _LocalStateFS()
    hits = [
        int(m.group(1))
        for m in (_MARKER.match(n) for n in fs.list_names(state_dir))
        if m and m.group(2) == note
    ]
    return max(hits) if hits else None


def legacy_flat_output(spark: SparkSession, out_path: str, fs=None) -> bool:
    """True when ``out_path`` already holds a pre-r11 flat output
    tree: data files directly at the root instead of ``batch=<id>``
    subdirs. Mixing the per-epoch partition dirs into such a tree
    breaks partition discovery ("conflicting directory structures" —
    leaf files at different depths), so streaming writers that find
    one fall back to the flat append for the tree's lifetime (with
    the pre-r11 at-least-once double-append caveat that layout always
    had). Root-listing only — O(root entries), checked once per
    stream."""
    fs = fs or _fs_for(spark, out_path)
    if not fs.exists(out_path):
        return False
    return any(n.startswith("part-") for n in fs.list_names(out_path))


def write_state(
    df: DataFrame, state_dir: str, fs=None, note: str | None = None
) -> None:
    """Write the next version dir, then commit it manifest-last.
    ``note`` (filename-safe: letters, digits, ``_ - .``) is recorded
    in the commit marker's name for :func:`find_version_by_note`."""
    if note is not None and not re.fullmatch(r"[\w.-]+", note):
        raise ValueError(f"write_state: note not filename-safe: {note!r}")
    spark = df.sparkSession
    fs = fs or _fs_for(spark, state_dir)
    cur = current_version(state_dir, fs)
    nxt = 0 if cur is None else cur + 1
    fs.mkdirs(state_dir)
    df.write.mode("overwrite").parquet(f"{state_dir}/v={nxt}")
    name = f"_COMMIT.v{nxt}" + (f".{note}" if note is not None else "")
    fs.create_text(os.path.join(state_dir, name), str(nxt))


def prune_state_versions(
    state_dir: str, keep_last: int = 2, fs=None
) -> list[int]:
    """Delete version snapshots older than the newest ``keep_last`` —
    the versioned protocol's RETENTION knob (r14): every
    :func:`write_state` keeps its predecessor on disk, which the
    batch-tagged replay path needs (a replayed batch reads its
    original snapshot, tagged-version − 1), but unpruned that is
    O(state size × batches) forever — at crawl scale a census state
    written per batch retains thousands of corpus-sized snapshots.

    ``keep_last=2`` (the default) keeps {current, current − 1}:
    exactly what a replay of the MOST RECENT batch reads. Replays
    reaching further back than the window fail LOUDLY (the snapshot's
    parquet path is gone) instead of silently recomputing against the
    wrong state — pruning trades replay depth for space, and the
    at-least-once sources this protocol serves (foreachBatch) only
    ever replay the in-flight epoch. Commit markers are PRESERVED
    (tiny files — they are the replay-detection record; a pruned
    replay must still be detected, then fail on the missing read,
    never re-merge as if new).

    Single-writer contract: run from the state's one writer (the
    compaction-loop slot). Returns the pruned version numbers."""
    if keep_last < 1:
        raise ValueError("prune_state_versions: keep_last must be >= 1")
    fs = fs or _LocalStateFS()
    cur = current_version(state_dir, fs)
    if cur is None:
        return []
    cutoff = cur - int(keep_last) + 1
    pruned = []
    for name in fs.list_names(state_dir):
        m = re.match(r"^v=(\d+)$", name)
        if m and int(m.group(1)) < cutoff:
            fs.delete(os.path.join(state_dir, name))
            pruned.append(int(m.group(1)))
    return sorted(pruned)
