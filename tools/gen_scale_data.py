"""Generate local scale points above the driver's sf0.1 testdata.

The driver's testdata tops out at sf0.1 (17.5 MB) — small enough that
every scale_check slope mostly measures fixed overhead. This script
synthesizes two larger strata inside the repo (testdata itself is
read-only to us):

- ``.scale_data/sf1eq/``  — 10 replicas of sf0.1 (~200 MB): the point
  where the LINEAR term first clears the fixed-overhead floor.
- ``.scale_data/sf10eq/`` — 100 replicas (~2 GB): the multi-GB point
  where shuffle width, AQE coalescing, and (if any) spill actually
  engage — the regime tools/shuffle_audit.py measures.

Construction (fully deterministic, numpy PCG64 seeded per table; the
first 10 replicas of sf10eq are IDENTICAL rows to sf1eq):

- every table is N replicas of sf0.1; replica 0 is the original rows
  verbatim, replicas 1..N-1 remap primary keys by +r*KEY_STRIDE;
- `documents` replicas perturb ~1/3 of tokens, keyed by
  (hash(original text), replica, position) — so two docs that were
  EXACT duplicates of each other stay exact duplicates within each
  replica (the corpus dup-rate per stratum matches sf0.1), while
  cross-replica copies land far below the near-dup threshold
  (3-shingle Jaccard ~0.3 << 0.7) instead of inflating it;
- `events`/`orders` keep their key-distribution shape: user/customer
  ids are reused across replicas (N× rows PER KEY — deeper windows,
  heavier sessionization, the direction a real year of data grows),
  timestamps shift by +r hours so per-key orderings interleave;
- `embeddings` adds seeded N(0, 0.05) noise per replica — N× corpus
  with preserved cluster structure for the ANN/kNN family;
- `lineitem` jitters quantities/prices and shifts ship dates, keeping
  the groupBy cardinalities (returnflag/linestatus) identical.

Replica tables are streamed through a ParquetWriter one at a time, so
peak memory stays one-replica-sized regardless of N.

Usage: python tools/gen_scale_data.py [sf1eq|sf10eq ...] [--force]
(default: both strata; idempotent — a stratum already holding all five
tables is skipped)
"""

from __future__ import annotations

import hashlib
import os
import sys
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STRATA = {"sf1eq": 10, "sf10eq": 100}
KEY_STRIDE = 10_000_000

TABLES = ["documents", "events", "embeddings", "orders", "lineitem"]

_VOCAB: list[str] = []


def _perturb_text(text: str, replica: int) -> str:
    """Replace ~1/3 of tokens, deterministically keyed by the ORIGINAL
    text (not the doc id): exact-dup pairs stay exact dups within a
    replica; cross-replica Jaccard drops well under the near-dup bar."""
    toks = text.split()
    base = hashlib.md5(f"{text}|{replica}".encode()).digest()
    seed = int.from_bytes(base[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    mask = rng.random(len(toks)) < (1 / 3)
    vocab_pick = rng.integers(0, len(_VOCAB), len(toks))
    return " ".join(
        _VOCAB[vocab_pick[i]] if mask[i] else t for i, t in enumerate(toks)
    )


def gen_documents(src_tbl: pa.Table, replicas: int) -> Iterator[pa.Table]:
    global _VOCAB
    texts = src_tbl.column("text").to_pylist()
    # the replacement vocabulary is the corpus's own token set — the
    # perturbed docs stay in-distribution for lang-id/quality/BM25
    _VOCAB = sorted({t for x in texts for t in x.split()})
    doc_id = src_tbl.column("doc_id").to_numpy()
    lang = src_tbl.column("lang").to_pylist()
    source = src_tbl.column("source").to_pylist()
    # exact-dup groups share perturbed output: cache per unique text
    for r in range(replicas):
        if r == 0:
            new_texts = texts
        else:
            cache: dict[str, str] = {}
            new_texts = [
                cache.setdefault(t, _perturb_text(t, r)) for t in texts
            ]
        yield pa.table(
            {
                "doc_id": doc_id + r * KEY_STRIDE,
                "text": new_texts,
                "lang": lang,
                "source": source,
                "n_chars": np.array([len(t) for t in new_texts], dtype=np.int64),
            }
        )


def gen_events(src_tbl: pa.Table, replicas: int) -> Iterator[pa.Table]:
    event_id = src_tbl.column("event_id").to_numpy()
    ts = src_tbl.column("ts").cast(pa.int64()).to_numpy()  # epoch us
    user_id = src_tbl.column("user_id").to_numpy()
    etype = src_tbl.column("event_type").to_pylist()
    value = src_tbl.column("value").to_numpy()
    props = src_tbl.column("props").to_pylist()
    for r in range(replicas):
        rng = np.random.Generator(np.random.PCG64(1000 + r))
        jitter = rng.integers(0, 3_600_000_000, len(ts)) if r else np.zeros(len(ts), dtype=np.int64)
        yield pa.table(
            {
                "event_id": event_id + r * KEY_STRIDE,
                "ts": pa.array(ts + r * 3_600_000_000 + jitter, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": user_id,  # same users: N× depth per key
                "event_type": etype,
                "value": np.round(value * (1.0 + (rng.random(len(value)) - 0.5) * 0.1), 2)
                if r
                else value,
                "props": props,
            }
        )


def gen_embeddings(src_tbl: pa.Table, replicas: int) -> Iterator[pa.Table]:
    vec_id = src_tbl.column("vec_id").to_numpy()
    emb = np.array(src_tbl.column("embedding").to_pylist(), dtype=np.float32)
    label = src_tbl.column("label").to_numpy()
    for r in range(replicas):
        if r == 0:
            e = emb
        else:
            rng = np.random.Generator(np.random.PCG64(2000 + r))
            e = (emb + rng.normal(0, 0.05, emb.shape)).astype(np.float32)
        yield pa.table(
            {
                "vec_id": vec_id + r * KEY_STRIDE,
                "embedding": pa.array(list(e), pa.list_(pa.float32())),
                "label": pa.array(label, pa.int32()),
            }
        )


def gen_orders(src_tbl: pa.Table, replicas: int) -> Iterator[pa.Table]:
    okey = src_tbl.column("o_orderkey").to_numpy()
    ckey = src_tbl.column("o_custkey").to_numpy()
    status = src_tbl.column("o_orderstatus").to_pylist()
    price = src_tbl.column("o_totalprice").to_numpy()
    odate = src_tbl.column("o_orderdate").cast(pa.int64()).to_numpy()
    prio = src_tbl.column("o_orderpriority").to_pylist()
    for r in range(replicas):
        rng = np.random.Generator(np.random.PCG64(3000 + r))
        yield pa.table(
            {
                "o_orderkey": okey + r * KEY_STRIDE,
                "o_custkey": ckey,  # same customers: deeper windows
                "o_orderstatus": status,
                "o_totalprice": np.round(
                    price * (1.0 + (rng.random(len(price)) - 0.5) * 0.1), 2
                )
                if r
                else price,
                "o_orderdate": pa.array(
                    odate + r * 86_400_000_000, pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": prio,
            }
        )


def gen_lineitem(src_tbl: pa.Table, replicas: int) -> Iterator[pa.Table]:
    cols = {c: src_tbl.column(c).to_numpy() for c in
            ("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax")}
    lnum = src_tbl.column("l_linenumber").to_numpy()
    rflag = src_tbl.column("l_returnflag").to_pylist()
    lstat = src_tbl.column("l_linestatus").to_pylist()
    sdate = src_tbl.column("l_shipdate").cast(pa.int64()).to_numpy()
    for r in range(replicas):
        rng = np.random.Generator(np.random.PCG64(4000 + r))
        jit = (1.0 + (rng.random(len(lnum)) - 0.5) * 0.1) if r else 1.0
        yield pa.table(
            {
                "l_orderkey": cols["l_orderkey"] + r * KEY_STRIDE,
                "l_partkey": cols["l_partkey"],
                "l_suppkey": cols["l_suppkey"],
                "l_linenumber": pa.array(lnum, pa.int32()),
                "l_quantity": np.round(cols["l_quantity"] * jit, 2) if r else cols["l_quantity"],
                "l_extendedprice": np.round(cols["l_extendedprice"] * jit, 2)
                if r
                else cols["l_extendedprice"],
                "l_discount": cols["l_discount"],
                "l_tax": cols["l_tax"],
                "l_returnflag": rflag,
                "l_linestatus": lstat,
                "l_shipdate": pa.array(
                    sdate + r * 86_400_000_000, pa.int64()
                ).cast(pa.timestamp("us")),
            }
        )


GENERATORS = {
    "documents": gen_documents,
    "events": gen_events,
    "embeddings": gen_embeddings,
    "orders": gen_orders,
    "lineitem": gen_lineitem,
}


def gen_stratum(name: str, force: bool) -> None:
    replicas = STRATA[name]
    out_dir = os.path.join(_REPO, ".scale_data", name)
    os.makedirs(out_dir, exist_ok=True)
    done = all(os.path.isfile(os.path.join(out_dir, f"{t}.parquet")) for t in TABLES)
    if done and not force:
        print(f"{out_dir} already complete (use --force to regenerate)")
        return
    for t in TABLES:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        path = os.path.join(out_dir, f"{t}.parquet")
        writer = None
        n_out = 0
        try:
            for chunk in GENERATORS[t](src, replicas):
                if writer is None:
                    # several row groups so Spark's scan (and spread()'s
                    # metadata probe) sees a splittable file at this size
                    writer = pq.ParquetWriter(path, chunk.schema)
                writer.write_table(chunk, row_group_size=65536)
                n_out += chunk.num_rows
        finally:
            if writer is not None:
                writer.close()
        print(f"{name}/{t}: {src.num_rows} -> {n_out} rows")
    total = sum(
        os.path.getsize(os.path.join(out_dir, f)) for f in os.listdir(out_dir)
    )
    print(f"total {total/1e6:.1f} MB at {out_dir}")


def main() -> None:
    force = "--force" in sys.argv
    names = [a for a in sys.argv[1:] if a in STRATA] or list(STRATA)
    for name in names:
        gen_stratum(name, force)


if __name__ == "__main__":
    main()
