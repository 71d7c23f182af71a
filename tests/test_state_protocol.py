"""Versioned-state commit protocol (streaming/_state.py): the commit
must need NO rename anywhere (object-store posture — r9 verdict),
work through the Hadoop FileSystem API for schemed paths, hide
uncommitted (crashed) writes, and keep reading legacy r9 dirs that
used the _CURRENT pointer."""

from __future__ import annotations

import os


class RenamelessFS:
    """Stub filesystem with atomic-create-only semantics (an object
    store): the interface has no rename/replace at all, and create is
    the only way a name appears. Any attempt to use os-level renames
    would simply not go through this object — the protocol passing
    with ONLY these five ops proves it never needs one."""

    def __init__(self):
        self.created: list[str] = []

    def exists(self, p):
        return os.path.exists(p)

    def mkdirs(self, p):
        os.makedirs(p, exist_ok=True)

    def list_names(self, d):
        return os.listdir(d) if os.path.isdir(d) else []

    def read_text(self, p):
        with open(p) as f:
            return f.read()

    def create_text(self, p, s):
        self.created.append(os.path.basename(p))
        with open(p, "w") as f:
            f.write(s)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


class TestManifestLastCommit:
    def test_sequential_versions_through_renameless_fs(self, spark, tmp_path):
        from cod_stats_spark.streaming._state import read_state, write_state

        d = str(tmp_path / "state")
        fs = RenamelessFS()
        assert read_state(spark, d, fs=fs) is None
        write_state(_df(spark, [1, 2]), d, fs=fs)
        assert sorted(
            r["x"] for r in read_state(spark, d, fs=fs).collect()
        ) == [1, 2]
        write_state(_df(spark, [7]), d, fs=fs)
        assert [r["x"] for r in read_state(spark, d, fs=fs).collect()] == [7]
        # the only pointer artifacts are the per-version markers
        assert fs.created == ["_COMMIT.v0", "_COMMIT.v1"]

    def test_uncommitted_write_is_invisible_and_overwritten(
        self, spark, tmp_path
    ):
        """Crash between data write and marker: the dangling v=N dir
        must be invisible to readers and reclaimed by the next
        writer."""
        from cod_stats_spark.streaming._state import (
            current_version,
            read_state,
            write_state,
        )

        d = str(tmp_path / "state")
        fs = RenamelessFS()
        write_state(_df(spark, [1]), d, fs=fs)
        # simulate the crash: v=1 data lands, marker never created
        _df(spark, [99]).write.parquet(f"{d}/v=1")
        assert current_version(d, fs=fs) == 0
        assert [r["x"] for r in read_state(spark, d, fs=fs).collect()] == [1]
        write_state(_df(spark, [2]), d, fs=fs)  # reclaims v=1
        assert [r["x"] for r in read_state(spark, d, fs=fs).collect()] == [2]

    def test_file_uri_goes_through_hadoop_fs(self, spark, tmp_path):
        """A schemed path must route pointer I/O through the JVM
        Hadoop FileSystem — the 100 TB deployment's path shape."""
        from cod_stats_spark.streaming._state import (
            _fs_for,
            _HadoopStateFS,
            read_state,
            write_state,
        )

        d = f"file://{tmp_path}/state"
        assert isinstance(_fs_for(spark, d), _HadoopStateFS)
        write_state(_df(spark, [5]), d)
        write_state(_df(spark, [6]), d)
        assert [r["x"] for r in read_state(spark, d).collect()] == [6]
        # the markers physically exist where the URI points
        names = os.listdir(tmp_path / "state")
        assert "_COMMIT.v0" in names and "_COMMIT.v1" in names

    def test_legacy_current_pointer_still_reads_then_upgrades(
        self, spark, tmp_path
    ):
        from cod_stats_spark.streaming._state import (
            current_version,
            read_state,
            write_state,
        )

        d = str(tmp_path / "state")
        # hand-build an r9-protocol dir: v=3 data + _CURRENT pointer
        _df(spark, [42]).write.parquet(f"{d}/v=3")
        with open(os.path.join(d, "_CURRENT"), "w") as f:
            f.write("3")
        assert current_version(d) == 3
        assert [r["x"] for r in read_state(spark, d).collect()] == [42]
        write_state(_df(spark, [43]), d)  # first post-upgrade commit
        assert current_version(d) == 4
        assert [r["x"] for r in read_state(spark, d).collect()] == [43]
