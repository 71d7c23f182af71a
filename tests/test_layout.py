"""Z-order layout (operators/layout.py) — pruning proven from parquet
footer statistics, not claimed."""

from __future__ import annotations

import glob
import os


def _file_ranges(path: str, cols):
    """[(per-file {col: (min, max)})] from parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                col = row_group.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        if any(lo[c] is not None for c in cols):
            out.append({c: (lo[c], hi[c]) for c in cols})
    return out


class TestZOrder:
    def test_files_tile_both_dimensions(self, spark, tmp_path):
        """Z-ordered files cover a small min-max window in BOTH
        columns; a single-column sort leaves the other column spanning
        ~the full domain in every file — the footer stats a reader
        prunes on."""
        from cod_stats_spark.operators.layout import write_zordered

        n = 1 << 12
        # uniform 2-d grid: x row-major, y column-major — adversarial
        # for any single-column sort
        df = spark.sql(
            f"SELECT id % 64 AS x, id DIV 64 AS y, id AS payload FROM range({n})"
        )
        zpath = str(tmp_path / "zordered")
        write_zordered(df, zpath, ["x", "y"], bits=6, num_files=16)
        spath = str(tmp_path / "xsorted")
        df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

        def widths(path):
            ranges = _file_ranges(path, ["x", "y"])
            assert len(ranges) >= 8
            return (
                max(r["x"][1] - r["x"][0] for r in ranges),
                max(r["y"][1] - r["y"][0] for r in ranges),
            )

        zx, zy = widths(zpath)
        sx, sy = widths(spath)
        # z-order: every file compact in BOTH dims (≤ half the domain)
        assert zx <= 32 and zy <= 32, (zx, zy)
        # x-sort: x compact but y unpruned (full 0..63 span somewhere)
        assert sx <= 16 and sy >= 60, (sx, sy)

    def test_zorder_roundtrip_preserves_rows(self, spark, tmp_path):
        from cod_stats_spark.operators.layout import write_zordered

        df = spark.sql("SELECT id AS x, (id * 7) % 100 AS y FROM range(1000)")
        p = str(tmp_path / "z")
        write_zordered(df, p, ["x", "y"], bits=8, num_files=4)
        back = spark.read.parquet(p)
        assert back.count() == 1000
        assert set(back.columns) == {"x", "y"}
        assert back.agg({"x": "sum"}).first()[0] == df.agg({"x": "sum"}).first()[0]

    def test_bits_overflow_guard(self, spark):
        import pytest

        from cod_stats_spark.operators.layout import zorder_key

        df = spark.range(10).selectExpr("id a", "id b", "id c", "id d")
        with pytest.raises(ValueError, match="exceeds a long"):
            zorder_key(df, ["a", "b", "c", "d"], bits=16)


def _scan_output_rows(df) -> int:
    """numOutputRows of the executed plan's parquet scan — rows the
    reader actually decoded AFTER parquet row-group skipping (Spark
    pushes the predicate into the scan; surviving rows are counted at
    the scan node, the row-level filter runs above it)."""
    df.collect()
    ep = df._jdf.queryExecution().executedPlan()
    try:
        ep = ep.finalPhysicalPlan()  # unwrap AQE
    except Exception:
        pass
    leaves = ep.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                total += kv._2().value()
    return total


class TestZOrderSparkPruning:
    def test_spark_scan_skips_row_groups_on_either_dimension(
        self, spark, tmp_path
    ):
        """End-to-end in Spark, not pyarrow: a range predicate on the
        SECOND Z-order column must let the parquet reader skip most
        row groups (scan numOutputRows ≪ table rows), while the same
        predicate against a single-column-sorted layout decodes
        ~everything — the read-path payoff `write_zordered` exists
        for (round-6 verdict task 5)."""
        from cod_stats_spark.operators.layout import write_zordered

        n = 1 << 14
        df = spark.sql(
            f"SELECT id % 128 AS x, id DIV 128 AS y, id AS payload FROM range({n})"
        )
        zp = str(tmp_path / "z")
        sp = str(tmp_path / "s")
        # 64 files ≈ 256-row row groups: skipping granularity fine
        # enough that the curve's tiling shows up in the scan metric
        write_zordered(df, zp, ["x", "y"], bits=6, num_files=64)
        df.repartitionByRange(64, "x").sortWithinPartitions("x").write.parquet(sp)

        pred = "y BETWEEN 10 AND 20"
        z_rows = _scan_output_rows(spark.read.parquet(zp).filter(pred))
        s_rows = _scan_output_rows(spark.read.parquet(sp).filter(pred))
        # x-sorted: every row group spans the full y domain — nothing
        # skips; z-ordered: only the row groups tiling y∈[10,20] decode
        assert s_rows >= n * 0.9, s_rows
        assert z_rows <= n / 4, z_rows
        assert z_rows < s_rows / 3, (z_rows, s_rows)
        # and the answers agree exactly
        want = sorted(
            r["payload"] for r in df.filter(pred).collect()
        )
        got = sorted(
            r["payload"] for r in spark.read.parquet(zp).filter(pred).collect()
        )
        assert got == want

    def test_predicate_on_first_dimension_also_prunes(self, spark, tmp_path):
        from cod_stats_spark.operators.layout import write_zordered

        n = 1 << 14
        df = spark.sql(
            f"SELECT id % 128 AS x, id DIV 128 AS y, id AS payload FROM range({n})"
        )
        zp = str(tmp_path / "z2")
        write_zordered(df, zp, ["x", "y"], bits=6, num_files=64)
        z_rows = _scan_output_rows(
            spark.read.parquet(zp).filter("x BETWEEN 100 AND 110")
        )
        assert z_rows <= n / 4, z_rows


def test_constant_column_zorder(spark, tmp_path):
    """A constant column contributes cell 0 everywhere instead of
    dividing by a zero range."""
    from cod_stats_spark.operators.layout import write_zordered

    df = spark.sql("SELECT 7 AS x, id AS y FROM range(100)")
    p = str(tmp_path / "const")
    write_zordered(df, p, ["x", "y"], bits=6, num_files=2)
    assert spark.read.parquet(p).count() == 100


def test_empty_input_zorder(spark, tmp_path):
    from cod_stats_spark.operators.layout import write_zordered

    df = spark.createDataFrame([], "x long, y long")
    p = str(tmp_path / "empty_z")
    write_zordered(df, p, ["x", "y"], bits=6, num_files=2)
    assert spark.read.schema("x long, y long").parquet(p).count() == 0


class TestWriteSorted:
    def test_files_hold_disjoint_ordered_key_ranges(self, spark, tmp_path):
        """Total-order contract from the footers: file key intervals
        are pairwise disjoint and the union is the full domain — the
        'ORDER BY export' layout a dominant-predicate column wants."""
        from cod_stats_spark.operators.layout import write_sorted

        df = spark.sql(
            "SELECT (id * 2654435761) % 4096 AS k, id AS payload "
            "FROM range(4096)"
        )
        path = str(tmp_path / "sorted")
        write_sorted(df, path, ["k"], num_files=8)
        ranges = sorted(r["k"] for r in _file_ranges(path, ["k"]))
        assert len(ranges) >= 4
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2          # disjoint AND ordered
        assert ranges[0][0] == 0 and ranges[-1][1] == 4095

    def test_scan_prunes_to_one_file_on_point_predicate(self, spark, tmp_path):
        from cod_stats_spark.operators.layout import write_sorted

        df = spark.sql("SELECT id AS k, id AS payload FROM range(4096)")
        path = str(tmp_path / "sorted")
        write_sorted(df, path, ["k"], num_files=8)
        back = spark.read.parquet(path).where("k = 17")
        # row-group pruning: far fewer rows surface than the table holds
        assert back.count() == 1
        ranges = _file_ranges(path, ["k"])
        covering = [r for r in ranges if r["k"][0] <= 17 <= r["k"][1]]
        assert len(covering) == 1

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        from cod_stats_spark.operators.layout import write_sorted

        df = spark.sql("SELECT id % 97 AS k, id AS payload FROM range(1000)")
        path = str(tmp_path / "sorted")
        write_sorted(df, path, ["k"], num_files=4)
        assert spark.read.parquet(path).count() == 1000
        got = sorted(r["payload"] for r in spark.read.parquet(path).collect())
        assert got == list(range(1000))
