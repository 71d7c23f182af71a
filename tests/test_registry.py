"""Registry contract: the driver's correctness harness runs at most 50
queries() entries — anything registered past that window silently gets
no oracle row (round-3/4 verdicts). Guard the budget here."""

from __future__ import annotations

DRIVER_WINDOW = 50


def test_registry_fits_driver_window():
    from cod_stats_spark.plans.bench_queries import QUERIES

    assert len(QUERIES) <= DRIVER_WINDOW, (
        f"{len(QUERIES)} queries registered but the driver only runs "
        f"{DRIVER_WINDOW}; merge or demote to BENCH_ONLY"
    )


def test_every_oracle_has_a_query():
    from cod_stats_spark.plans.bench_queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)


def test_bench_headline_names_resolve():
    import bench
    from cod_stats_spark.plans.bench_queries import BENCH_ONLY, QUERIES

    all_names = set(QUERIES) | set(BENCH_ONLY)
    missing = [n for n in bench.HEADLINE if n not in all_names]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
