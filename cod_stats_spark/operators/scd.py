"""Slowly-changing-dimension type 2 — history build, incremental
maintenance, and point-in-time lookup.

The warehouse-standard way to keep attribute HISTORY for a dimension:
one row per (key, value-run) with a validity interval
[valid_from, valid_to) and an open current row (valid_to null). The
reference stores only latest-state rows (its lookup tables are
overwrite-on-ingest — SURVEY.md §1.4); SCD2 is the general form every
analytics engine grows into, and its point-in-time lookup is the
as-of family this repo already has.

Relationship to :mod:`operators.merge` (r3): merge.scd2_apply is the
MERGE INTO pattern over a current/history table — append-only forward
in time, one latest source row per key per batch, string sentinel
open end. THIS module is the change-log form: build/rebuild from raw
observations, arbitrary batch interleaving with an exact
apply == rebuild contract, typed null open end, and scd2_lookup.

- :func:`scd2_build` — history from a change log: per key, order by
  ts, optionally collapse no-op changes (same attrs as the previous
  row), close each row with the next row's ts. Two window passes over
  ONE (key)-shuffle (collapse flag, then lead), no joins.
- :func:`scd2_apply` — incremental maintenance: new change rows fold
  into an existing dimension by rebuilding ONLY the affected keys
  (semi-join selects them — broadcast-sized in any real batch) and
  passing every other key through untouched. By construction
  apply(build(older), newer) == build(all) — the `asof_join_orders`
  gate's 'scd2_inc' arm value-verifies exactly that equality through
  point-in-time lookups replayed in SQL.
- :func:`scd2_lookup` — facts annotated with the dimension attributes
  in force at each fact's timestamp. Because SCD2 intervals tile the
  timeline per key (valid_to[i] == valid_from[i+1], last row open),
  the lookup IS an as-of join on valid_from — one shuffle+window via
  operators/asof_join, no interval theta join needed.

100 TB posture: build is one shuffle on the dimension key (dimension
change logs are orders of magnitude smaller than facts); apply
shuffles only the affected-key slice; lookup inherits asof_join's
single union+window shuffle on the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cod_stats_spark.operators.asof_join import asof_join


def scd2_build(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    collapse: bool = True,
) -> DataFrame:
    """(key..., attr..., valid_from, valid_to, is_current) from a
    change log with one row per observed state. Rows must be unique
    per (key, ts) — pre-aggregate ties deterministically first (the
    gate takes max per day, like the as-of gate). ``collapse=True``
    drops rows whose attrs equal the immediately preceding row's
    (no-op changes), so consecutive runs of the same value become one
    interval."""
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    df = changes.select(*key_cols, ts_col, *attr_cols)
    if collapse:
        cur = F.struct(*attr_cols)
        prev = F.lag(cur).over(w)
        # eqNullSafe: null attrs collapse like any other repeated
        # value; lag() is null only on the key's first row
        df = (
            df.withColumn("_keep", prev.isNull() | ~cur.eqNullSafe(prev))
            .where(F.col("_keep"))
            .drop("_keep")
        )
    # lead over the kept rows rides the same (key) exchange: the
    # filter preserved the child partitioning and sort
    return (
        df.withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumnRenamed(ts_col, "valid_from")
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols, *attr_cols, "valid_from", "valid_to", "is_current"
        )
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    collapse: bool = True,
    dedupe: bool = False,
) -> DataFrame:
    """Fold a batch of change rows into an existing SCD2 dimension.
    Only keys present in ``changes`` are rebuilt (their existing
    intervals revert to change rows — valid_from carries the original
    observation time); unaffected keys pass through without
    rewriting. Out-of-order and retroactive changes re-sort into the
    per-key history.

    apply(build(log_a), log_b) == build(log_a ∪ log_b) holds exactly
    when (i) ``collapse=False``, for ARBITRARY interleaving — no
    information is ever dropped — or (ii) ``collapse=True`` with
    append-only batches (each key's new changes all dated after its
    current open row), the production ingest case. A collapsed
    dimension cannot replay a no-op observation it already dropped,
    so a retroactive insert INSIDE a collapsed same-value run may
    legitimately differ from a full-log rebuild — that is inherent to
    SCD2, not to this implementation; keep the raw change log if you
    need retroactive rebuilds. Point-in-time LOOKUP results are
    identical for collapsed and uncollapsed dimensions (collapse only
    merges same-value intervals), which is what the
    `asof_join_orders` gate's 'scd2_inc' arm verifies under an
    adversarially interleaved split.

    ``dedupe=True`` drops duplicate (key, ts) rows from the unioned
    change log (first by attr order for determinism) — makes the fold
    idempotent under at-least-once batch replay (a re-delivered batch
    collides with its own reverted dim rows), at the cost of one
    row_number window that rides the rebuild's key exchange. Leave
    False when inputs honor the unique-(key, ts) contract."""
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    affected = changes.select(*key_cols).distinct()
    untouched = dim.join(F.broadcast(affected), key_cols, "left_anti")
    reverted = dim.join(F.broadcast(affected), key_cols, "left_semi").select(
        *key_cols, F.col("valid_from").alias(ts_col), *attr_cols
    )
    log = reverted.unionByName(changes.select(*key_cols, ts_col, *attr_cols))
    if dedupe:
        w = Window.partitionBy(*key_cols, ts_col).orderBy(*attr_cols)
        log = (
            log.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    rebuilt = scd2_build(log, key_cols, ts_col, attr_cols, collapse=collapse)
    return untouched.unionByName(rebuilt)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """facts + the dimension attributes valid at each fact's
    timestamp (null before the key's first interval). Inclusive on
    valid_from: a fact AT the change instant sees the new value —
    the [valid_from, valid_to) convention."""
    return asof_join(
        facts,
        dim,
        on=on,
        left_ts=fact_ts,
        right_ts="valid_from",
        right_payload=list(attr_cols),
    )


def scd2_oracle_sql(
    src: str,
    key_sql: str,
    ts_sql: str,
    attr_sql: str,
    collapse: bool = True,
) -> str:
    """DuckDB replica of scd2_build for a single key/attr pair:
    (key, attr, valid_from, valid_to, is_current)."""
    keep = (
        "WHERE prev_t IS NULL OR attr IS DISTINCT FROM prev"
        if collapse
        else ""
    )
    return f"""
WITH log AS (
  SELECT {key_sql} AS k, {ts_sql} AS t, {attr_sql} AS attr FROM {src}
),
flagged AS (
  SELECT k, t, attr,
         lag(attr) OVER (PARTITION BY k ORDER BY t) AS prev,
         lag(t)    OVER (PARTITION BY k ORDER BY t) AS prev_t
  FROM log
),
kept AS (SELECT k, t, attr FROM flagged {keep})
SELECT k, attr, t AS valid_from,
       lead(t) OVER (PARTITION BY k ORDER BY t) AS valid_to,
       lead(t) OVER (PARTITION BY k ORDER BY t) IS NULL AS is_current
FROM kept
"""
