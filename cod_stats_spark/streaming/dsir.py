"""Incremental DSIR — maintain the RAW-corpus feature counts as
versioned state so the importance model refits per batch without ever
re-scanning shipped data.

A DSIR model (operators/dsir.py) is two hashed-n-gram count vectors:
the TARGET corpus (fixed — it defines what "looks right") and the RAW
corpus (grows with every crawl batch). Bucket counts are ADDITIVE
integers, so the incremental posture is exact, not approximate:
keep (fid, count) for the raw corpus in a versioned snapshot
(streaming/_state — manifest-last ``_COMMIT.v{N}`` markers), add each
batch's counts, and refit. The refitted model's λ6 vector is
BIT-IDENTICAL to a from-scratch ``dsir_fit`` over the union: the
merged counts are the same integers, so the driver's ``ln`` sees the
same inputs (tested in tests/test_streaming_dsir.py).

Protocol (the census/tape discipline):

- model parameters (dim, ngrams, base_hash, lowercase, smoothing) are
  frozen per state dir by a ``_DSIR`` marker validated on every call —
  a silent parameter change would make the merged counts meaningless;
- the target counts are computed ONCE at init and stored frozen under
  ``target/`` (the reference corpus is an input, not state);
- each update tags its commit with the batch id in the marker NAME, so
  an at-least-once replay (foreachBatch) is detected and recomputes
  its model from the snapshot that batch originally PRODUCED instead
  of double-adding — replayed output == original output, the raw
  counts never advance twice.

Per batch: one explode→fid count shuffle over the BATCH only (≤dim
result rows), a dim-bounded driver merge, one ≤dim-row state write,
and a driver-side refit (dim ints). Nothing rereads shipped corpus;
state size is ≤dim rows forever.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession

from cod_stats_spark.operators.dsir import (
    DsirModel,
    _bucket_counts,
    _lam6_from_counts,
)
from cod_stats_spark.streaming._state import (
    _fs_for,
    find_version_by_note,
    read_state,
    write_state,
)

__all__ = [
    "dsir_init_state",
    "dsir_update",
    "dsir_model_from_state",
]


def _dsir_marker(
    dim: int, ngrams: int, base_hash: str, lowercase: bool, smoothing: float
) -> str:
    sig = zlib.crc32(
        f"{int(dim)}|{int(ngrams)}|{base_hash}|{bool(lowercase)}|"
        f"{float(smoothing)!r}".encode()
    ) & 0xFFFFFFFF
    return f"_DSIR.d{int(dim)}.n{int(ngrams)}.{sig:08x}"


def _check_marker(
    spark: SparkSession, state_dir: str,
    dim: int, ngrams: int, base_hash: str, lowercase: bool, smoothing: float,
    create: bool,
) -> None:
    fs = _fs_for(spark, state_dir)
    want = _dsir_marker(dim, ngrams, base_hash, lowercase, smoothing)
    have = [n for n in fs.list_names(state_dir) if n.startswith("_DSIR.")]
    if not have:
        if not create:
            raise ValueError(
                f"dsir state dir {state_dir!r} is uninitialized — call "
                "dsir_init_state first (the target counts are computed "
                "there, once)"
            )
        fs.mkdirs(state_dir)
        fs.create_text(f"{state_dir}/{want}", "")
        return
    if want not in have:
        raise ValueError(
            "dsir_update: model parameters differ from the state dir's "
            f"frozen marker ({have[0]!r} vs {want!r}) — dim/ngrams/"
            "base_hash/lowercase/smoothing are fixed for a state's "
            "lifetime (changing them mid-stream would merge counts from "
            "different feature spaces)"
        )


def _counts_df(spark: SparkSession, counts: dict[int, int]) -> DataFrame:
    rows = sorted((int(f), int(c)) for f, c in counts.items() if c)
    return spark.createDataFrame(rows or [], "fid int, c long")


def _counts_from_df(df: DataFrame | None) -> dict[int, int]:
    if df is None:
        return {}
    return {int(r["fid"]): int(r["c"]) for r in df.collect()}


def _refit(
    target: dict[int, int], raw: dict[int, int],
    dim: int, ngrams: int, base_hash: str, lowercase: bool, smoothing: float,
) -> DsirModel:
    """Refit from count snapshots through the SHARED λ6 formula
    (operators/dsir._lam6_from_counts) — same op order, same doubles,
    same micro-units as a from-scratch fit."""
    tt, tr = sum(target.values()), sum(raw.values())
    if tt == 0 or tr == 0:
        raise ValueError(
            f"dsir refit: empty feature stream (target={tt}, raw={tr})"
        )
    return DsirModel(
        dim=dim, ngrams=ngrams, base_hash=base_hash,
        lowercase=lowercase, smoothing=float(smoothing),
        log_ratio6=_lam6_from_counts(target, raw, dim, smoothing),
    )


def dsir_init_state(
    spark: SparkSession,
    target: DataFrame,
    state_dir: str,
    text_col: str = "text",
    dim: int = 1 << 14,
    ngrams: int = 2,
    base_hash: str = "xxhash64",
    lowercase: bool = True,
    smoothing: float = 1.0,
) -> None:
    """Freeze the model parameters (``_DSIR`` marker) and compute +
    store the target corpus's bucket counts under ``target/`` — run
    ONCE per state dir; raises if already initialized (re-initializing
    with a different target would silently re-weigh every later
    batch; build a new state dir instead)."""
    fs = _fs_for(spark, state_dir)
    if fs.exists(state_dir) and any(
        n.startswith("_DSIR.") for n in fs.list_names(state_dir)
    ):
        raise ValueError(
            f"dsir_init_state: {state_dir!r} already initialized"
        )
    _check_marker(spark, state_dir, dim, ngrams, base_hash, lowercase,
                  smoothing, create=True)
    ct, tt = _bucket_counts(target, text_col, dim, ngrams, base_hash,
                            lowercase)
    if tt == 0:
        raise ValueError("dsir_init_state: target has no features")
    write_state(_counts_df(spark, ct), f"{state_dir}/target", note="init")


def dsir_update(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    text_col: str = "text",
    dim: int = 1 << 14,
    ngrams: int = 2,
    base_hash: str = "xxhash64",
    lowercase: bool = True,
    smoothing: float = 1.0,
    prune_keep_last: int | None = None,
) -> DsirModel:
    """Add one raw batch's counts to the state and return the model
    refit over EVERYTHING seen so far — bit-identical to
    ``dsir_fit(target, union_of_batches)`` (integer counts, same ln
    inputs). An at-least-once replay of a batch id recomputes its
    model from the snapshot that batch originally committed and does
    NOT advance the state.

    ``prune_keep_last`` (r15): bound the raw-count state's version
    retention to the newest N snapshots after each commit
    (streaming/_state.prune_state_versions). Each snapshot is ≤dim
    rows, but a long-lived stream otherwise accretes one per batch
    forever. A replay of batch N reads the snapshot N itself (its
    own commit), so ``keep_last=2`` keeps the in-flight epoch
    replayable with margin; replays past the window fail loudly on
    the missing snapshot instead of double-adding. The frozen
    ``target/`` state is never pruned (version 0 is its only
    version)."""
    _check_marker(spark, state_dir, dim, ngrams, base_hash, lowercase,
                  smoothing, create=False)
    raw_dir = f"{state_dir}/raw"
    target = _counts_from_df(read_state(spark, f"{state_dir}/target"))

    note = f"b{int(batch_id)}"
    fs = _fs_for(spark, raw_dir)
    replayed = (
        find_version_by_note(raw_dir, note, fs)
        if fs.exists(raw_dir)
        else None
    )
    if replayed is not None:
        raw = _counts_from_df(spark.read.parquet(f"{raw_dir}/v={replayed}"))
        return _refit(target, raw, dim, ngrams, base_hash, lowercase,
                      smoothing)

    cb, _ = _bucket_counts(batch, text_col, dim, ngrams, base_hash,
                           lowercase)
    raw = _counts_from_df(read_state(spark, raw_dir))
    for f, c in cb.items():
        raw[f] = raw.get(f, 0) + c
    write_state(_counts_df(spark, raw), raw_dir, note=note)
    if prune_keep_last is not None:
        from cod_stats_spark.streaming._state import prune_state_versions

        prune_state_versions(
            raw_dir, keep_last=max(2, int(prune_keep_last)), fs=fs
        )
    return _refit(target, raw, dim, ngrams, base_hash, lowercase, smoothing)


def dsir_model_from_state(
    spark: SparkSession,
    state_dir: str,
    dim: int = 1 << 14,
    ngrams: int = 2,
    base_hash: str = "xxhash64",
    lowercase: bool = True,
    smoothing: float = 1.0,
) -> DsirModel:
    """The current model without an update (e.g. to score a serving
    batch against everything ingested so far)."""
    _check_marker(spark, state_dir, dim, ngrams, base_hash, lowercase,
                  smoothing, create=False)
    target = _counts_from_df(read_state(spark, f"{state_dir}/target"))
    raw = _counts_from_df(read_state(spark, f"{state_dir}/raw"))
    return _refit(target, raw, dim, ngrams, base_hash, lowercase, smoothing)
