"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (when present) its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive multiset of
canonicalized values.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
import traceback

sys.path.insert(0, ".")


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if math.isinf(v):
            return ("f", "inf" if v > 0 else "-inf")
        # floats are pre-rounded in the queries; normalize -0.0 and int-like
        if v == int(v) and abs(v) < 1e15:
            return ("f", float(v))
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(canon(x) for x in v))
    return ("s", str(v))


def _spark_type_class(dt) -> str:
    name = dt.typeName()
    return {
        "byte": "int", "short": "int", "integer": "int", "long": "int",
        "float": "float", "double": "float",
        "decimal": "decimal",
        "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
        "string": "str", "boolean": "bool", "binary": "binary",
        "array": "list",
    }.get(name, name)


def _arrow_type_class(t) -> str:
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def type_audit(sdf, con, sql) -> list[str]:
    """The driver compares Arrow/pandas-converted values, so a DuckDB
    HUGEINT (sum of ints -> decimal128, pandas float64) hash-mismatches a
    Spark bigint even when fetchall() values compare equal. Flag any
    column whose Arrow type class differs from Spark's.

    Schema comes from a LIMIT 0 wrapper: re-executing the full oracle
    just to read its Arrow schema doubled DuckDB cost per gate (the
    value comparison keeps fetchall(), so its conversion path — the
    thing the audit exists to police — stays byte-identical)."""
    arrow_schema = con.execute(f"SELECT * FROM ({sql}) _probe LIMIT 0").arrow().schema
    spark_types = {f.name: _spark_type_class(f.dataType) for f in sdf.schema.fields}
    problems = []
    for field in arrow_schema:
        oc = _arrow_type_class(field.type)
        sc = spark_types.get(field.name)
        if sc is not None and oc != sc:
            problems.append(
                f"type class differs on '{field.name}': spark={sc} oracle={oc} "
                f"(arrow {field.type}) — driver hash will mismatch; cast the oracle"
            )
    return problems


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from cod_stats_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    from cod_stats_spark.tables import TABLE_NAMES

    import os as _os

    for t in TABLE_NAMES:
        # partial dirs (e.g. the generated .scale_data/sf1eq stratum
        # carries only 5 tables) register what exists; gates touching
        # a missing table then fail individually instead of up front
        if _os.path.isfile(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(queries)
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        try:
            problems += type_audit(sdf, con, oracles[name])
        except Exception as e:
            problems.append(f"type audit error: {e}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount differ: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm, om = df_multiset(scols, srows), df_multiset(ocols, orows)
            if sm != om:
                diff_s = {k: v for k, v in sm.items() if om.get(k) != v}
                diff_o = {k: v for k, v in om.items() if sm.get(k) != v}
                ex_s = list(diff_s.items())[:3]
                ex_o = list(diff_o.items())[:3]
                problems.append(
                    f"value multiset differs ({len(diff_s)}/{len(sm)} spark-side rows unmatched)\n"
                    f"    spark-only: {ex_s}\n    oracle-only: {ex_o}"
                )
        if problems:
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
