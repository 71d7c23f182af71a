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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import fingerprint, shingles
from cod_stats_spark.functions.text import shingles_sql as _shingles_sql
from cod_stats_spark.functions.text import words_sql as _words_sql
from cod_stats_spark.operators._util import spread


# ------------------------------------------------------------------
# SQL-string expression builders.
#
# The sketch expressions below are BIG trees (32-seed minhash, 64-lane
# SWAR simhash). Building them from pyspark Column operations costs
# thousands of py4j round trips (~0.5 s of driver time PER QUERY
# BUILD, profiled); rendering the same tree as one SQL string and
# parsing it JVM-side with a single F.expr call is ~100× cheaper and
# produces the identical expression. Semantics are pinned by the
# DuckDB value oracles (dedup_minhash / dedup_simhash gates).


def _md5_60_sql(x: str) -> str:
    """60-bit base hash from the first 15 hex chars of md5 — chosen so a
    SQL oracle (DuckDB) can reproduce it digit-by-digit. Value range
    [0, 2^60): multiply-add against 62-bit coefficients stays exactly
    representable in int128, which the oracle uses to mirror Java's
    wrapping long arithmetic."""
    return f"cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"


def _md5_64_sql(x: str) -> str:
    """Full 64-bit base hash from the first 16 hex chars of md5 (signed
    two's-complement, matching what xxhash64 yields). The unsigned
    decimal from conv() can exceed long range, so hop through
    DECIMAL(20,0) and wrap explicitly."""
    u = f"cast(conv(substring(md5({x}), 1, 16), 16, 10) as decimal(20,0))"
    two63 = "cast('9223372036854775808' as decimal(20,0))"
    two64 = "cast('18446744073709551616' as decimal(21,0))"
    return f"cast(if({u} >= {two63}, {u} - {two64}, {u}) as bigint)"


# Per-token/shingle base hashes for the sketch families. xxhash64 is
# the production default (fastest JVM path); the md5-derived members
# exist so gate queries can run with a hash a SQL oracle reproduces
# exactly — same family, same pipeline, verifiable internals.
BASE_HASH_SQL = {
    "xxhash64": lambda x: f"xxhash64({x})",
    "md5_60": _md5_60_sql,
    "md5_64": _md5_64_sql,
}

MINHASH_SEED = 0xC0D5


def minhash_coeffs(num_hashes: int, seed: int = MINHASH_SEED) -> list[tuple[int, int]]:
    """The (a_i, b_i) universal-hash coefficients used by
    :func:`minhash_signatures` — the single source of truth, imported by
    the SQL oracle generator too so the Spark path and the DuckDB
    replica can never drift apart silently."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, 1 << 61) * 2 + 1, rnd.randrange(0, 1 << 61))
        for _ in range(num_hashes)
    ]


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
    shingle_col: str | None = None,
) -> DataFrame:
    """id → minhash signature (array<long>, one min-hash per seed).

    ``shingle_col``: name of a PRECOMPUTED shingle-array column — skips
    shingling entirely (pipelines that also Jaccard-verify shingle the
    corpus once and share the projection). Min-hashing is duplicate-
    invariant, so a distinct or non-distinct array gives identical
    signatures.

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
    The tree is rendered as ONE SQL string (see module note on py4j
    build cost).
    """
    coeffs = minhash_coeffs(num_hashes)
    a_sql = "array(" + ", ".join(f"{a}L" for a, _ in coeffs) + ")"
    b_sql = "array(" + ", ".join(f"{b}L" for _, b in coeffs) + ")"
    sh_sql = (
        f"`{shingle_col}`"
        if shingle_col
        else _shingles_sql(text_col, shingle_n, distinct=False)
    )
    hash_sql = BASE_HASH_SQL[base_hash]("s")
    # The one-element explode is a Generate barrier: CollapseProject
    # would otherwise inline the whole shingle pipeline into the
    # 32-iteration seed lambda below (32× recompute per doc). The
    # barrier pins `hs` to one evaluation per row, AFTER the spread()
    # repartition so the work parallelizes beyond the scan's tasks.
    base = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array(F.expr(f"transform({sh_sql}, s -> {hash_sql})"))).alias("hs"),
    )
    sig_sql = (
        f"transform(sequence(0, {num_hashes - 1}), i -> array_min(transform(hs,"
        f" h -> h * element_at({a_sql}, i + 1) + element_at({b_sql}, i + 1))))"
    )
    return base.select("id", F.expr(sig_sql).alias("sig"))


def minhash_band_keys(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    base_hash: str = "xxhash64",
    band_key: str = "hash",
    shingle_col: str | None = None,
) -> DataFrame:
    """id → (band, band_hash) LSH keys, one row per band.

    The joinable form of the banded signature: two docs are candidate
    near-dups iff they share a (band, band_hash) row. Used by
    :func:`minhash_lsh_pairs` for self-join dedup and by the streaming
    incremental dedup to probe a persisted corpus index with a new
    micro-batch (cross-set candidates without re-sketching the corpus).
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, base_hash, shingle_col
    )
    wrap = "xxhash64({0})" if band_key == "hash" else "array({0})"
    band_exprs_sql = ", ".join(
        wrap.format(", ".join(f"sig[{b * rows + r}]" for r in range(rows)))
        for b in range(bands)
    )
    return sigs.select(
        "id",
        F.posexplode(F.expr(f"array({band_exprs_sql})")).alias("band", "band_hash"),
    )


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
    shingle_col: str | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows = num_hashes/bands per band; docs agreeing on ALL rows of any
    band collide. Pairs are emitted once (id_a < id_b), deduped across
    bands. Buckets over ``max_bucket_size`` (hot templates, empty docs)
    switch from all-pairs to TWO-HUB expansion: every member pairs with
    the bucket's two smallest ids — 2·O(size) pairs instead of
    O(size²). Connectivity through the verify + connected-components
    stages survives either hub failing downstream verification
    (Jaccard) against a spoke; a genuinely-duplicate spoke pair is lost
    only if BOTH hubs fail verification against one of the two spokes —
    an accepted recall approximation on hot buckets, not lossless
    (spoke–spoke pairs are never emitted). The oracle gates rely on
    their buckets staying under the cap (the SQL replica bands
    uncapped all-pairs); gate data is bounded well below the default.

    ``band_key``: "hash" compresses each band's rows to one xxhash64
    (narrower shuffle key — production default); "values" buckets on
    the raw row values (exact banding semantics, SQL-reproducible).
    """
    banded = minhash_band_keys(
        df, text_col, id_col, num_hashes, bands, shingle_n, base_hash, band_key,
        shingle_col,
    )
    return lsh_pairs_from_band_keys(banded, max_bucket_size)


def lsh_pairs_from_band_keys(
    banded: DataFrame,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Bucket ``(id, band, band_hash)`` rows into candidate pairs —
    the second half of :func:`minhash_lsh_pairs`, split out so callers
    that already hold band keys (the streaming incremental dedup
    sketches each batch exactly once and reuses the keys for pairing,
    index probing, and the index append) skip re-sketching."""
    buckets = banded.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    small = buckets.filter(F.size("ids").between(2, max_bucket_size))
    pairs = small.select(
        F.expr(
            "explode(flatten(transform(ids, (a, i) ->"
            " transform(slice(ids, i + 2, size(ids)),"
            " b -> struct(a as id_a, b as id_b)))))"
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    # Oversized buckets (hot templates) are NOT dropped: every member
    # pairs with the TWO smallest ids (2·O(size) pairs). Two hubs so a
    # single hub failing downstream Jaccard cannot disconnect spokes
    # that match each other — loss needs both hubs to fail (see
    # docstring; tests plant exactly this scenario).
    big = buckets.filter(F.size("ids") > max_bucket_size)
    star = big.select(
        F.expr(
            "explode(flatten(transform(slice(ids, 1, 2), (h, i) ->"
            " transform(slice(ids, i + 2, size(ids)),"
            " b -> struct(h as id_a, b as id_b)))))"
        ).alias("p")
    ).select("p.id_a", "p.id_b")
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
    lanes = 4  # 16-bit counters per long
    lane_w = 16
    max_toks = (1 << lane_w) - 1
    n_packed = bits // lanes

    toks_sql = f"slice({_words_sql(text_col)}, 1, {max_toks})"
    h = BASE_HASH_SQL[base_hash]("t")

    # one token hash -> n_packed SWAR lane contributions. Two levels of
    # transform so the hash binds to a lambda VARIABLE (evaluated once
    # per token — HOF lambdas run interpreted, where every repeated
    # subexpression re-evaluates), and each lane long comes from a
    # 16-entry constant LUT indexed by the matching nibble of the hash
    # (3 interpreted ops per lane instead of 16 shift/mask/add nodes).
    lut = [
        sum(((nib >> m) & 1) << (lane_w * m) for m in range(lanes))
        for nib in range(1 << lanes)
    ]
    lut_sql = "array(" + ", ".join(f"{v}L" for v in lut) + ")"
    packed_sql = "array(" + ", ".join(
        f"element_at({lut_sql}, cast(shiftrightunsigned(h, {j * lanes}) & 15 as int) + 1)"
        for j in range(n_packed)
    ) + ")"

    # one-element explode = Generate barrier pinning the token-hash
    # expansion to a single evaluation per row (see minhash_signatures)
    base = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                F.expr(f"transform(transform({toks_sql}, t -> {h}), h -> {packed_sql})")
            )
        ).alias("pkd"),
    )
    votes_sql = (
        f"aggregate(pkd, array_repeat(cast(0 as bigint), {n_packed}),"
        f" (acc, arr) -> zip_with(acc, arr, (a, b) -> a + b))"
    )
    # token-less docs have no fingerprint (same contract as the former
    # explode shape, where zero tokens produced zero agg rows)
    witharr = base.filter(F.size("pkd") > 0).select(
        "id", F.size("pkd").alias("n"), F.expr(votes_sql).alias("pks")
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


def simhash_combo_layout(
    blocks: int, table_blocks: int
) -> tuple[list[int], list[int], int, list[tuple[int, ...]]]:
    """(widths, offsets, maxw, combos) describing Manku block-
    combination tables over a 64-bit fingerprint — the single source
    of truth for the key layout, shared by the Spark key generator
    below AND the DuckDB oracle replica (bench_queries), so the two
    engines can never drift on block boundaries or table order."""
    from itertools import combinations

    base, extra = divmod(64, blocks)
    widths = [base + (1 if i < extra else 0) for i in range(blocks)]
    offsets = [sum(widths[:i]) for i in range(blocks)]
    maxw = max(widths)
    if maxw * table_blocks > 63:
        raise ValueError(
            f"combo key would exceed 63 bits: {table_blocks} x {maxw}"
        )
    return widths, offsets, maxw, list(combinations(range(blocks), table_blocks))


def _simhash_combo_keys_sql(blocks: int, table_blocks: int) -> list[str]:
    """Band-key expressions for Manku-style block-combination tables
    (Manku/Jain/Das Sarma, "Detecting Near-Duplicates for Web
    Crawling", WWW'07): split the 64-bit fingerprint into ``blocks``
    near-even chunks and key one table per C(blocks, table_blocks)
    combination, concatenating the combo's chunks into one ≤64-bit
    long. Recall guarantee is pigeonhole on CLEAN blocks: distance
    <= blocks - table_blocks leaves some combo untouched. The point of
    paying more tables is the KEY WIDTH: random collisions scale
    n²/2^keybits, and e.g. (6, 3) gives ~33-bit keys (negligible at
    any realistic n) where contiguous 4×16 leaves an n²/2^16 term
    that the r7 sf10eq audit measured dominating the bucket shuffle."""
    widths, offsets, maxw, combos = simhash_combo_layout(blocks, table_blocks)
    keys = []
    for combo in combos:
        expr = None
        for b in combo:
            chunk = (
                f"(shiftrightunsigned(simhash, {offsets[b]})"
                f" & {(1 << widths[b]) - 1})"
            )
            expr = chunk if expr is None else f"(shiftleft({expr}, {maxw}) | {chunk})"
        keys.append(expr)
    return keys


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 1000,
    base_hash: str = "xxhash64",
    combo: tuple[int, int] | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    ``bands`` chunks (pigeonhole: distance<=bands-1 guarantees one exact
    band match), bucket-join, verify Hamming distance.

    ``combo=(blocks, table_blocks)`` switches the banding to
    block-combination tables (see :func:`_simhash_combo_keys_sql`):
    same distance <= blocks-table_blocks pigeonhole guarantee, but the
    wider keys remove the n²/2^chunkbits random-collision term that
    makes contiguous banding quadratic on big corpora — use (6, 3)
    at scale. Every emitted pair is Hamming-verified either way, so
    the schemes differ only in candidate recall/cost, not precision.
    """
    sims = simhash(df, text_col, id_col, base_hash=base_hash)
    return hash64_near_pairs(
        sims,
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
        combo=combo,
    )


def hash64_near_pairs(
    hashed: DataFrame,
    id_col: str = "id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 1000,
    combo: tuple[int, int] | None = None,
) -> DataFrame:
    """Near-dup pairs over PRECOMPUTED 64-bit fingerprints — the
    banding/bucketing half of :func:`simhash_near_pairs` split out so
    any 64-bit hash family rides the same machinery (the perceptual
    aHash/dHash media fingerprints of
    ``operators.multimodal.phash_media`` are the motivating caller;
    SimHash's contiguous-band and Manku block-combination layouts
    apply verbatim to any 64-bit key). Same pigeonhole recall
    guarantee, same Hamming verification on every emitted pair, same
    two-hub oversized-bucket expansion."""
    if (id_col, hash_col) != ("id", "simhash") or list(hashed.columns) != [
        "id",
        "simhash",
    ]:
        # normalize lazily: the simhash caller already matches with the
        # DEFAULT names, and an extra Project node there would move its
        # frozen plan signature. Non-default names always project (r16
        # review: a canonically-named frame with swapped id_col/hash_col
        # arguments must not silently pair on the wrong columns).
        hashed = hashed.select(
            F.col(id_col).alias("id"), F.col(hash_col).alias("simhash")
        )
    sims = hashed
    if combo is not None:
        chunks_sql = ", ".join(_simhash_combo_keys_sql(*combo))
    else:
        width = 64 // bands
        chunks_sql = ", ".join(
            f"shiftrightunsigned(simhash, {b * width}) & {(1 << width) - 1}"
            for b in range(bands)
        )
    banded = sims.select(
        "id",
        "simhash",
        F.posexplode(F.expr(f"array({chunks_sql})")).alias("band", "chunk"),
    )
    buckets = banded.groupBy("band", "chunk").agg(
        F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("items")
    )
    small = buckets.filter(F.size("items").between(2, max_bucket_size))
    pairs = small.select(
        F.expr(
            "explode(flatten(transform(items, (a, i) ->"
            " transform(slice(items, i + 2, size(items)),"
            " b -> struct(a.id as id_a, b.id as id_b,"
            " bit_count(a.simhash ^ b.simhash) as hamming)))))"
        ).alias("p")
    ).select("p.*")
    # oversized buckets: two-hub expansion to the two smallest ids (see
    # minhash_lsh_pairs — same recall reasoning) — Hamming still
    # verified on every emitted pair
    big = buckets.filter(F.size("items") > max_bucket_size)
    star = big.select(
        F.expr(
            "explode(flatten(transform(slice(items, 1, 2), (h, i) ->"
            " transform(slice(items, i + 2, size(items)),"
            " b -> struct(h.id as id_a, b.id as id_b,"
            " bit_count(h.simhash ^ b.simhash) as hamming)))))"
        ).alias("p")
    ).select("p.*")
    return pairs.unionByName(star).filter(F.col("hamming") <= max_hamming).distinct()


def winnow_sql(
    x: str,
    k: int = 8,
    w: int = 4,
    base_hash: str = "xxhash64",
    ansi: bool | None = None,
) -> str:
    """SQL expression: the winnowed fingerprint set of a text column
    (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD'03): hash every character k-gram
    of the normalized text, slide a w-gram window, keep each window's
    MINIMUM hash, distinct the selections. Expected density 2/(w+1) of
    the grams — a guaranteed-coverage sample (every shared substring
    of length >= k+w-1 contributes at least one shared fingerprint),
    which is what makes winnowing detect PARTIAL overlap/containment
    that whole-document resemblance sketches (MinHash) dilute away.

    Zero shuffle, one projection: the same nested-lambda binding
    discipline as the minhash/simhash builders (norm text and the
    gram-hash array each bind to a lambda variable, evaluated once
    per row). Docs shorter than k chars contribute their whole text
    as the single gram; empty docs select nothing."""
    h = BASE_HASH_SQL[base_hash]("substring(s, i, {k})".format(k=k))
    norm = f"trim(regexp_replace(lower({x}), '\\\\s+', ' '))"
    hashes = (
        f"transform(sequence(1, greatest(length(s) - {k} + 1, 1)), i -> {h})"
    )
    # window minimum as a least() chain over element_at probes: same
    # value as array_min(slice(hs, j, w)) — both ignore the nothing-
    # is-null case and longs have a total order — but slice() ALLOCATES
    # a fresh w-element array per position inside an interpreted HOF
    # lambda, which the r16 profile showed dominating this projection
    # (guide §1.2 per-task work; probes past the end return null,
    # which least() skips, so the j > size-w+1 guard stays the
    # sequence bound exactly as before).
    #
    # Probe choice (r17): element_at in non-ANSI sessions — the mode
    # this engine pins in get_spark/prep_session — and try_element_at
    # only when the active session actually runs ANSI (where a plain
    # element_at past the array end throws INVALID_ARRAY_INDEX).
    # In a non-ANSI session the two forms compile to byte-identical
    # physical plans (both resolve to element_at(..., failOnError =
    # false) — plans/r17/dedup_winnow_{before,after}.txt differ only
    # in expression ids), so this is NOT a performance change; it
    # restores the entry's r15/r16 ANALYZED-plan signature (the
    # unresolved TryElementAt node hashes differently), reconnecting
    # the bench entry's cross-round timing history, while keeping the
    # generated SQL valid under ANSI. ``ansi=None`` resolves from the
    # active session; no session (or an unreadable conf) defaults to
    # the SAFE form.
    if ansi is None:
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        try:
            ansi = sess is None or (
                sess.conf.get("spark.sql.ansi.enabled", "true").lower()
                == "true"
            )
        except Exception:
            ansi = True
    probe = "try_element_at" if ansi else "element_at"
    if w == 1:
        win_min = f"{probe}(hs, j)"
    else:
        win_min = (
            "least("
            + ", ".join(f"{probe}(hs, j + {d})" for d in range(w))
            + ")"
        )
    select = (
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {w} + 1, 1)),"
        f" j -> {win_min}))"
    )
    return (
        f"transform(array({norm}), s -> if(length(s) = 0,"
        f" array()," # noqa: ISC003 — readability of the generated SQL
        f" transform(array({hashes}), hs -> {select})[0]))[0]"
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
    base_hash: str = "xxhash64",
    out_col: str = "winnow_fp",
) -> DataFrame:
    """id → winnowed fingerprint set (array<long>, see
    :func:`winnow_sql`). The per-doc building block: persist it next
    to the corpus and containment queries become fingerprint joins."""
    # resolve the probe form from the OWNING session, not the
    # thread-local active session: getActiveSession() is None on
    # driver pool threads (py4j maps each Python thread to its own
    # JVM thread), which silently flipped the generated SQL to the
    # try-form and moved the plan signature depending on which thread
    # built the plan (r17)
    try:
        ansi = (
            df.sparkSession.conf.get(
                "spark.sql.ansi.enabled", "true"
            ).lower()
            == "true"
        )
    except Exception:
        ansi = True
    return spread(df).select(
        F.col(id_col).alias("id"),
        F.expr(winnow_sql(text_col, k, w, base_hash, ansi=ansi)).alias(out_col),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = 1000,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, shared) for document pairs sharing >= ``min_shared``
    winnowed fingerprints — the copy/containment detector: a paragraph
    lifted verbatim into an otherwise-different document keeps its
    fingerprints, so the pair surfaces even though whole-doc Jaccard
    is far below any near-dup threshold (tests plant exactly this).

    Shape: one zero-shuffle fingerprint projection, one groupBy on the
    fingerprint value, per-bucket pairing, one (id_a, id_b) count agg —
    the decontaminate/LSH bucket discipline. ``max_fp_df`` drops
    fingerprints present in more than that many documents before
    pairing (stop-fingerprint cap, same contract as decontaminate's
    ``max_gram_df``): boilerplate shared by half the corpus identifies
    nothing and is what would make the pairing quadratic; with the cap
    the intermediate is <= cap · |fingerprints| — linear. Shared
    counts for surviving pairs then UNDERCOUNT by the dropped
    boilerplate, which is the standard trade. None disables."""
    fps = winnow_fingerprints(df, text_col, id_col, k, w, base_hash).select(
        "id", F.explode("winnow_fp").alias("fp")
    )
    buckets = fps.groupBy("fp").agg(F.array_sort(F.collect_list("id")).alias("ids"))
    sized = buckets.filter(F.size("ids") >= 2)
    if max_fp_df is not None:
        sized = sized.filter(F.size("ids") <= max_fp_df)
    pairs = sized.select(
        F.expr(
            "explode(flatten(transform(ids, (a, i) ->"
            " transform(slice(ids, i + 2, size(ids)),"
            " b -> struct(a as id_a, b as id_b)))))"
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def winnow_contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = 1000,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """(doc_id, bench_id, n_overlap) for corpus×benchmark pairs sharing
    >= ``min_shared`` winnowed fingerprints — the VERBATIM-overlap
    contamination report.

    Relationship to `decontaminate.contamination_pairs` (word n-gram
    report): same join shape, different gram economics. Winnowing
    emits ~2/(w+1) of the char-gram hashes per document (vs one gram
    per token) while KEEPING the guarantee that any lifted run of
    >= k+w-1 characters shares at least one fingerprint — so the
    Σ_f cnt_c(f)·cnt_b(f) pairing intermediate starts ~2.5× smaller
    per covered byte, and the report answers the question eval
    contamination actually asks (verbatim leakage) rather than
    bag-of-ngram co-occurrence. ``max_fp_df`` drops fingerprints in
    more than that many BENCHMARK docs before pairing (the stop-gram
    cap, same contract as contamination_pairs' ``max_gram_df``).
    Overlap counts are shared-fingerprint counts — a ~2/(w+1)-rate
    sample of the shared gram volume, not a gram census."""
    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col
    cfp = winnow_fingerprints(corpus, text_col, id_col, k, w, base_hash).select(
        F.col("id").alias("doc_id"), F.explode("winnow_fp").alias("fp")
    )
    bfp = winnow_fingerprints(
        benchmark, bench_text_col, bench_id_col, k, w, base_hash
    ).select(F.col("id").alias("bench_id"), F.explode("winnow_fp").alias("fp"))
    if max_fp_df is not None:
        keep = bfp.groupBy("fp").agg(F.count(F.lit(1)).alias("_n")).filter(
            F.col("_n") <= max_fp_df
        )
        bfp = bfp.join(keep.select("fp"), "fp", "left_semi")
    return (
        cfp.join(bfp, "fp")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_shared)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    candidate_pairs: DataFrame,
    shingle_n: int = 3,
    threshold: float = 0.8,
    shingle_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs (id_a, id_b).

    ``shingle_col``: name of a precomputed shingle-array column on
    ``df`` — skips re-shingling when the caller already pays for the
    projection. The array need not be distinct: set semantics are
    restored here with array_distinct over the INVOLVED docs only
    (array_distinct is O(k²) per doc — paying it corpus-wide at the
    shared projection would cost more than the re-shingle it saves).

    Run AFTER LSH — never on all pairs. The candidate list is persisted
    (it is read twice: once to restrict shingling, once for the verify
    join) — candidates are bounded by the LSH banding caps, so this
    materialization is small by construction; at scale it is the
    natural pipeline break a real system writes to a table anyway.
    Shingle sets are computed ONLY for documents that appear in some
    candidate pair (left-semi restriction) — the verify cost scales
    with the candidate set, not the corpus.
    """
    from pyspark.storagelevel import StorageLevel

    # materialize eagerly (count): each persisted set has TWO consumers
    # in the verify join; within one action the consumer stages run
    # concurrently and would otherwise both compute the un-populated
    # cache — the explicit barrier makes the expensive LSH plan run
    # exactly once
    candidate_pairs = candidate_pairs.persist(StorageLevel.MEMORY_AND_DISK)
    candidate_pairs.count()
    involved = (
        candidate_pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"))
        .distinct()
    )
    # explode(array(..)) = Generate barrier: `sh` is referenced by the
    # size() column and both join sides; without the barrier the
    # interpreted shingle expression would re-evaluate per reference
    sh_expr = (
        F.array_distinct(F.col(shingle_col))
        if shingle_col
        else F.explode(F.array(shingles(text_col, shingle_n)))
    )
    # persist WITHOUT an eager count: the verify join's two build
    # sides may race to populate the cache inside one action
    # (duplicating this small candidate-restricted projection once),
    # but skipping the extra barrier job saves a full scheduler
    # round-trip per pipeline run — the right trade for a plan whose
    # cost is bounded by the candidate set, not the corpus.
    sh = (
        df.join(involved.withColumnRenamed("id", id_col), id_col, "left_semi")
        .select(F.col(id_col).alias("id"), sh_expr.alias("sh"))
        .withColumn("sz", F.size("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
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
