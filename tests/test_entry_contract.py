"""Driver-contract tests: entry() smoke, queries()/oracle_sql()
integrity, and a fast oracle-parity spot check at sf0.001."""

from __future__ import annotations

import datetime as dt
import math
import os

import pytest

SF = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)

# fast queries whose oracle parity is re-checked inside CI (full suite:
# tools/check_oracle.py)
SPOT = ["q1_pricing_summary", "sessionize_events", "pivot_priority", "lang_id"]


@needs_testdata
class TestEntryContract:
    def test_entry_smoke(self, spark):
        import __spark_entry__ as e

        df = e.entry(spark)
        rows = df.collect()
        assert len(rows) > 0
        assert df.columns[0] == "l_returnflag"

    def test_registry_integrity(self):
        import __spark_entry__ as e

        q, o = e.queries(), e.oracle_sql()
        assert len(q) >= 30
        assert set(o) <= set(q)
        # every non-oracled query documents why (rows-only families)
        from cod_stats_spark.plans.bench_queries import coverage

        cov = coverage()
        assert set(cov) == set(q)

    def test_all_queries_return_rows(self, spark):
        """Every registered query executes at sf0.001. The counts run
        from a driver thread pool (r17): each query is independent
        (state-writing gates all mkdtemp their own dirs), Spark
        schedules concurrent actions fine, and serially this was the
        single slowest test in the suite (411 s measured — it
        re-executes the heavy replay gates back to back)."""
        from concurrent.futures import ThreadPoolExecutor

        import __spark_entry__ as e
        from cod_stats_spark.plans.bench_queries import load_tables

        # warm the lazy table catalog serially before fanning out
        # (concurrent first-reads of the same reader have flaked);
        # items() resolves every reader
        load_tables(spark, SF).items()

        def one(item):
            name, fn = item
            return name, fn(spark, SF).count()

        with ThreadPoolExecutor(max_workers=8) as pool:
            for name, n in pool.map(one, e.queries().items()):
                assert n >= 0, name

    @pytest.mark.parametrize("name", SPOT)
    def test_oracle_parity_spot(self, spark, name):
        import duckdb

        import __spark_entry__ as e

        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

        def canon(v):
            if isinstance(v, float):
                return round(v, 9) if not math.isnan(v) else "nan"
            if isinstance(v, dt.datetime):
                return v.replace(tzinfo=None).isoformat()
            if isinstance(v, dt.date):
                return v.isoformat()
            return v

        sdf = e.queries()[name](spark, SF)
        scols = sdf.columns
        srows = sorted(
            tuple(canon(v) for _, v in sorted(zip(scols, r), key=lambda kv: kv[0]))
            for r in sdf.collect()
        )
        cur = con.execute(e.oracle_sql()[name])
        ocols = [d[0] for d in cur.description]
        orows = sorted(
            tuple(canon(v) for _, v in sorted(zip(ocols, r), key=lambda kv: kv[0]))
            for r in cur.fetchall()
        )
        assert sorted(scols) == sorted(ocols)
        assert srows == orows
