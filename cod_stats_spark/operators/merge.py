"""MERGE-style table maintenance without a transactional table format.

The reference's only write semantics is INSERT OR IGNORE on a natural
key (SURVEY §1.4) — `insert_only` here. Real pipelines also need
upserts and slowly-changing-dimension history; with plain Parquet
(no Delta/Iceberg in this environment) these are emulated as pure
DataFrame algebra and an atomic overwrite of the target:

- insert_only   — target ∪ (source ⟂ target)           [INSERT OR IGNORE]
- upsert        — (target ⟂ source) ∪ latest(source)   [MERGE matched-update]
- scd2_apply    — close changed current rows (end_ts), append new
                  versions; full history preserved

All set logic is anti-joins + unions + a window dedup — shuffles on
the merge key only. At cluster scale, swap the final overwrite for
MERGE INTO on Delta/Iceberg; the semantics here are the same.

Relationship to :mod:`operators.scd` (r9): this module's
``scd2_apply`` is the MERGE INTO pattern — a current/history table,
one latest row per key per batch, append-only forward in time, string
sentinel for the open end. ``operators/scd.scd2_build/scd2_apply`` is
the CHANGE-LOG form — arbitrary (incl. retroactive/interleaved)
batches rebuilt per affected key with a documented apply == rebuild
contract, typed null open end, and the as-of point-in-time lookup.
Use this module when maintaining a dimension table forward from
per-batch snapshots; use operators/scd when you own the raw change
log.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _latest_per_key(source: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        source.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def insert_only(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """INSERT OR IGNORE: keep target rows, add source rows whose key is
    absent (first-seen wins, like the reference's PK semantics)."""
    keys = list(keys)
    new_rows = source.dropDuplicates(keys).join(
        target.select(*keys), keys, "left_anti"
    )
    return target.unionByName(new_rows)


def delete_keys(
    target: DataFrame, keys_df: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE … WHEN MATCHED THEN DELETE — the right-to-erasure /
    retention pass: every target row whose key appears in ``keys_df``
    is removed. One broadcast-eligible left-anti join on the key
    (deletion lists are small by nature); rewrite-and-swap the target
    like the other maintenance ops. For SCD2 history tables, pass the
    dimension's key columns to erase a subject's ENTIRE history."""
    keys = list(keys)
    return target.join(
        F.broadcast(keys_df.select(*keys).distinct()), keys, "left_anti"
    )


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """MERGE: source rows replace matching target rows; unmatched source
    rows insert. ``order_col`` picks the winning source version when the
    batch contains several rows per key."""
    keys = list(keys)
    winners = _latest_per_key(source, keys, order_col)
    kept = target.join(winners.select(*keys), keys, "left_anti")
    return kept.unionByName(winners.select(*target.columns))


def scd2_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    change_cols: Sequence[str],
    effective_col: str,
    end_col: str = "valid_to",
    current_col: str = "is_current",
    open_end: str = "9999-12-31T23:59:59Z",
) -> DataFrame:
    """Slowly-changing-dimension type 2 over a history table.

    ``target`` rows carry (keys..., change_cols..., effective_col,
    end_col, current_col). For each source row whose change_cols differ
    from the key's CURRENT version: the current version is closed
    (end = new effective) and the new version appended as current.
    Unchanged keys pass through untouched; brand-new keys insert.
    """
    keys = list(keys)
    change_cols = list(change_cols)
    src = _latest_per_key(source, keys, effective_col).select(
        *keys, *change_cols, effective_col
    )

    current = target.filter(F.col(current_col))
    history = target.filter(~F.col(current_col))

    cmp_cond = [current[k] == src[k] for k in keys]
    joined = current.alias("t").join(src.alias("s"), cmp_cond, "left")
    changed_pred = F.coalesce(
        ~F.struct(*[F.col(f"t.{c}") for c in change_cols]).eqNullSafe(
            F.struct(*[F.col(f"s.{c}") for c in change_cols])
        )
        & F.col(f"s.{keys[0]}").isNotNull(),
        F.lit(False),
    )

    unchanged_current = joined.filter(~changed_pred).select("t.*")
    closed = (
        joined.filter(changed_pred)
        .select("t.*", F.col(f"s.{effective_col}").alias("_new_eff"))
        .withColumn(end_col, F.col("_new_eff"))
        .withColumn(current_col, F.lit(False))
        .drop("_new_eff")
    )

    existing_keys = current.select(*keys)
    changed_keys = joined.filter(changed_pred).select(*[F.col(f"s.{k}").alias(k) for k in keys])
    new_keys_rows = src.join(existing_keys, keys, "left_anti")
    new_versions = (
        src.join(changed_keys, keys, "left_semi")
        .unionByName(new_keys_rows)
        .withColumn(end_col, F.lit(open_end))
        .withColumn(current_col, F.lit(True))
        .select(*unchanged_current.columns)
    )
    return history.unionByName(unchanged_current).unionByName(closed).unionByName(
        new_versions
    )
