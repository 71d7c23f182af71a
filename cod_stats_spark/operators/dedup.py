"""Deduplication operators for document-scale pipelines.

Five strategies, all shuffle-conscious:

- exact_dedup           — hash-groupBy on a fingerprint (one shuffle)
- minhash_lsh_pairs     — shingle → minhash signature → banded LSH
                          buckets → candidate pairs (self-join only
                          WITHIN buckets, never all-pairs)
- simhash               — 64-bit weighted-projection fingerprint;
                          near-dups share bands of the fingerprint
- ngram_jaccard_pairs   — exact Jaccard on shingle sets for candidate
                          pairs (verification stage after LSH)
- embedding_cosine_pairs— near-dup by embedding cosine within LSH
                          buckets (see similarity.py for the ANN side)

Everything is built-in Column expressions (xxhash64, transform,
aggregate) — no Python in the per-row path. At 100 TB the only
shuffles are the bucket groupBys; bucket sizes are bounded by banding
parameters, so the within-bucket self-join never degenerates to a
cross join on a hot key (cap enforced via ``max_bucket_size``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import fingerprint, shingles
from cod_stats_spark.operators._util import spread


def _md5_60(c):
    """60-bit base hash from the first 15 hex chars of md5 — chosen so a
    SQL oracle (DuckDB) can reproduce it digit-by-digit. Value range
    [0, 2^60): multiply-add against 62-bit coefficients stays exactly
    representable in int128, which the oracle uses to mirror Java's
    wrapping long arithmetic."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _md5_64(c):
    """Full 64-bit base hash from the first 16 hex chars of md5 (signed
    two's-complement, matching what xxhash64 yields). The unsigned
    decimal from conv() can exceed long range, so hop through
    DECIMAL(20,0) and wrap explicitly."""
    u = F.conv(F.substring(F.md5(c), 1, 16), 16, 10).cast("decimal(20,0)")
    two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    return F.when(u >= two63, (u - two64)).otherwise(u).cast("long")


# Per-token/shingle base hashes for the sketch families. xxhash64 is
# the production default (fastest JVM path); the md5-derived members
# exist so gate queries can run with a hash a SQL oracle reproduces
# exactly — same family, same pipeline, verifiable internals.
BASE_HASHES = {"xxhash64": F.xxhash64, "md5_60": _md5_60, "md5_64": _md5_64}


def exact_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint; keeps one deterministic
    survivor per group (min/max id) and reports the duplicate count.

    One shuffle (groupBy fingerprint). The reference's analog is the
    (game_id, player_uno_id) INSERT OR IGNORE key (SURVEY.md §1.4).
    """
    fp = fingerprint(F.col(text_col)).alias("fp")
    keeper = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(keeper.alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """id → minhash signature (array<long>, one min-hash per seed).

    Hash family: ONE xxhash64 per shingle, then ``h_i = a_i·h + b_i``
    (odd multipliers from a deterministic PRNG seed) — the standard
    universal-hashing minhash construction. 32× fewer string hashes
    than seeding xxhash64 per function.

    Shape: a SINGLE projection — per row, hash the shingle array once,
    then ``sig[i] = array_min(transform(hs, h -> a_i·h + b_i))`` via
    nested higher-order functions. No explode, no aggregate, ZERO
    shuffle; and because the seeds index a lambda evaluated at runtime,
    the expression tree is O(1) in num_hashes (a per-seed min-aggregate
    column costs Catalyst O(num_hashes) analysis on every query build).
    """
    import random

    rnd = random.Random(0xC0D5)
    coeffs = [
        (rnd.randrange(1, 1 << 61) * 2 + 1, rnd.randrange(0, 1 << 61))
        for _ in range(num_hashes)
    ]
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    sh = shingles(F.col(text_col), shingle_n, distinct=False)
    # The one-element explode is a Generate barrier: CollapseProject
    # would otherwise inline the whole shingle pipeline into the
    # 32-iteration seed lambda below (32× recompute per doc). The
    # barrier pins `hs` to one evaluation per row, AFTER the spread()
    # repartition so the work parallelizes beyond the scan's tasks.
    hash_fn = BASE_HASHES[base_hash]
    base = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array(F.transform(sh, lambda s: hash_fn(s)))).alias("hs"),
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: h * F.element_at(a_arr, i + 1) + F.element_at(b_arr, i + 1),
            )
        ),
    )
    return base.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
    base_hash: str = "xxhash64",
    band_key: str = "hash",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows = num_hashes/bands per band; docs agreeing on ALL rows of any
    band collide. Pairs are emitted once (id_a < id_b), deduped across
    bands. Buckets over ``max_bucket_size`` (hot templates, empty docs)
    switch from all-pairs to hub-and-spoke expansion against the
    bucket's min id — linear instead of quadratic cost, and the cluster
    stays connected for the verify + connected-components stages, so
    nothing is silently dropped.

    ``band_key``: "hash" compresses each band's rows to one xxhash64
    (narrower shuffle key — production default); "values" buckets on
    the raw row values (exact banding semantics, SQL-reproducible).
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, base_hash)
    if band_key == "hash":
        band_exprs = [
            F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ]
    else:
        band_exprs = [
            F.array(*[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ]
    banded = sigs.select(
        "id",
        F.posexplode(F.array(*band_exprs)).alias("band", "band_hash"),
    )
    buckets = banded.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    small = buckets.filter(F.size("ids").between(2, max_bucket_size))
    pairs = small.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    # Oversized buckets (hot templates) are NOT dropped: link every
    # member to the bucket's min id — O(size) pairs instead of
    # O(size²). Verification + connected components still merge the
    # cluster through the hub, so no silent pair loss.
    big = buckets.filter(F.size("ids") > max_bucket_size)
    star = big.select(
        F.element_at("ids", 1).alias("id_a"),
        F.explode(F.slice("ids", 2, F.size("ids"))).alias("id_b"),
    )
    return pairs.unionByName(star).distinct()


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 64,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sum +1/-1 votes of each
    token's hash bit; fingerprint bit = sign of the vote.

    Shape: ZERO shuffle — votes fold per row. Each token's hash expands
    to 16 SWAR-packed longs (4 × 16-bit bit-counters per long), and a
    single higher-order ``aggregate`` sums them into the per-doc vote
    array; the fingerprint unpacks the counters (vote_b set ⇔
    2·Σbit_b > n). Lane arithmetic is exact through two's-complement
    wraparound while every counter < 2^16, so token streams are capped
    at 65535 tokens per doc (a prefix fingerprint beyond that —
    near-dup semantics are unaffected for any realistic document).
    Compared to the explode → hash-aggregate shape this removes the
    per-token shuffle/agg machinery entirely: per-doc output with
    per-doc input means the whole operator is one narrow projection.
    """
    import functools
    import operator

    from cod_stats_spark.functions.text import normalize_text, words

    lanes = 4  # 16-bit counters per long
    lane_w = 16
    max_toks = (1 << lane_w) - 1
    n_packed = bits // lanes

    toks = F.slice(words(normalize_text(F.col(text_col))), 1, max_toks)
    hash_fn = BASE_HASHES[base_hash]

    def packed(h):  # one token hash -> n_packed SWAR lane contributions
        return F.array(
            *[
                functools.reduce(
                    operator.add,
                    [
                        F.shiftleft(
                            F.shiftrightunsigned(h, j * lanes + m)
                            .bitwiseAND(F.lit(1))
                            .cast("long"),
                            lane_w * m,
                        )
                        for m in range(lanes)
                    ],
                )
                for j in range(n_packed)
            ]
        )

    # one-element explode = Generate barrier pinning the token-hash
    # expansion to a single evaluation per row (see minhash_signatures)
    base = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(F.array(F.transform(toks, lambda t: packed(hash_fn(t)))))
        ).alias("w"),
    ).select("id", F.col("w")[0].alias("pkd"))
    votes = F.aggregate(
        F.col("pkd"),
        F.expr(f"array_repeat(cast(0 as bigint), {n_packed})"),
        lambda acc, arr: F.zip_with(acc, arr, lambda a, b: a + b),
    )
    # token-less docs have no fingerprint (same contract as the former
    # explode shape, where zero tokens produced zero agg rows)
    witharr = base.filter(F.size("pkd") > 0).select(
        "id", F.size("pkd").alias("n"), votes.alias("pks")
    )
    # fingerprint bit b set ⇔ majority of token hashes have bit b set.
    # One runtime fold over the 64 bits — NOT 64 inlined when/OR nodes,
    # which cost Catalyst ~1.5 s of analysis on every query build.
    fp = F.expr(
        f"""
aggregate(sequence(0, {bits - 1}), cast(0 as bigint),
  (acc, b) -> acc | if(2 * (shiftrightunsigned(pks[cast(b / {lanes} as int)],
                                               {lane_w} * (b % {lanes})) & {max_toks}) > n,
                       shiftleft(cast(1 as bigint), b), cast(0 as bigint)))
"""
    )
    # second Generate barrier: consumers reference `simhash` several
    # times (one per LSH band); without it CollapseProject would inline
    # — and recompute — the whole fingerprint fold per reference
    return witharr.select(
        F.explode(F.array(F.struct(F.col("id"), fp.alias("simhash")))).alias("r")
    ).select("r.id", "r.simhash")


def hamming64(a, b):
    """Hamming distance between two 64-bit columns (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 1000,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    ``bands`` chunks (pigeonhole: distance<=bands-1 guarantees one exact
    band match), bucket-join, verify Hamming distance.
    """
    width = 64 // bands
    sims = simhash(df, text_col, id_col, base_hash=base_hash)
    banded = sims.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for b in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    buckets = banded.groupBy("band", "chunk").agg(
        F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("items")
    )
    small = buckets.filter(F.size("items").between(2, max_bucket_size))
    pairs = small.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda a, i: F.transform(
                        F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                        lambda b: F.struct(
                            a["id"].alias("id_a"),
                            b["id"].alias("id_b"),
                            hamming64(a["simhash"], b["simhash"]).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    # oversized buckets: hub-and-spoke to the min id (see
    # minhash_lsh_pairs) — Hamming still verified on every emitted pair
    big = buckets.filter(F.size("items") > max_bucket_size)
    hub = F.element_at("items", 1)
    star = big.select(
        hub["id"].alias("id_a"),
        F.explode(F.slice("items", 2, F.size("items"))).alias("other"),
        hub["simhash"].alias("_hub_sim"),
    ).select(
        "id_a",
        F.col("other")["id"].alias("id_b"),
        hamming64(F.col("_hub_sim"), F.col("other")["simhash"]).alias("hamming"),
    )
    return pairs.unionByName(star).filter(F.col("hamming") <= max_hamming).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    candidate_pairs: DataFrame,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs (id_a, id_b).

    Two broadcast-eligible joins fetch shingle sets; intersection /
    union via array ops. Run AFTER LSH — never on all pairs.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"))
    joined = candidate_pairs.join(a, "id_a").join(b, "id_b")
    # |A∪B| = |A| + |B| − |A∩B| (shingle arrays are distinct) — one
    # array_intersect per pair instead of intersect + union, with sizes
    # precomputed on the build sides before the join
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.col("sz_a") + F.col("sz_b") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
