"""Perceptual-hash media near-dup (operators/multimodal.py
_decode_pgm / make_pgm_media / phash_media + operators/dedup.py
hash64_near_pairs): PGM codec registry entry, byte-level generator
parity with a DuckDB rebuild, hand-computed aHash/dHash bit patterns,
identical-media == identical-hash (the byte-exact-dedup parity), the
single-pixel near-dup property, and Hamming-LSH pairing over
precomputed fingerprints."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _pgm(rows: list[list[int]]) -> bytes:
    h = len(rows)
    w = len(rows[0])
    return f"P5\n{w} {h}\n255\n".encode() + bytes(
        v for r in rows for v in r
    )


def _media_df(spark, n=60, key_mod=7, noise_mod=3, noise=True):
    from cod_stats_spark.operators.multimodal import make_pgm_media

    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        (F.col("id") % key_mod).cast("string").alias("_key"),
        F.when(F.col("id") % noise_mod == 0, F.col("id")).alias("_noise"),
    )
    return make_pgm_media(
        base, "media_id", "_key", noise_col="_noise" if noise else None
    )


class TestPgmCodec:
    def test_registry_decodes_pgm(self, spark):
        from cod_stats_spark.operators.multimodal import decode_media_meta

        got = decode_media_meta(_media_df(spark, n=5)).collect()
        assert len(got) == 5
        for r in got:
            assert r["format"] == "pgm"
            assert (r["width"], r["height"]) == (16, 16)
            assert r["n_frames"] == 1
            # header ("P5\n16 16\n255\n" = 13 bytes) + 256 pixels
            assert r["n_bytes"] == 13 + 256

    def test_sniff_rejects_non_pgm(self):
        from cod_stats_spark.operators.multimodal import _decode_pgm

        assert _decode_pgm(b"P6\n2 2\n255\n" + b"x" * 12) is None
        assert _decode_pgm(b"FAKE|1|1|1|1|") is None
        assert _decode_pgm(b"P5 garbage") is None

    def test_pixel_decode_guards(self):
        from cod_stats_spark.operators.multimodal import (
            _decode_pgm_pixels,
        )

        with pytest.raises(ValueError, match="not binary PGM"):
            _decode_pgm_pixels(b"\x89PNG....")
        with pytest.raises(ValueError, match="carries only"):
            _decode_pgm_pixels(b"P5\n4 4\n255\n" + b"\x00" * 7)
        with pytest.raises(ValueError, match="16-bit"):
            _decode_pgm_pixels(b"P5\n2 2\n65535\n" + b"\x00" * 8)


class TestMakePgmMediaByteParity:
    def test_duckdb_rebuilds_identical_bytes(self, spark):
        """The generator is engine-reproducible: DuckDB rebuilds every
        payload byte-for-byte (md5 pixel rows + the single-pixel noise
        overlay), cross-checked through sha256 of the hex rendering —
        the multimodal_codecs gate's discipline."""
        import duckdb

        got = {
            r["media_id"]: r["h"]
            for r in _media_df(spark, n=60)
            .select("media_id", F.sha2(F.hex("media_bytes"), 256).alias("h"))
            .collect()
        }
        con = duckdb.connect()
        want = {
            int(r[0]): r[1]
            for r in con.execute(
                """
WITH base AS (
  SELECT range AS media_id, (range % 7)::VARCHAR AS key,
         CASE WHEN range % 3 = 0 THEN range END AS noise
  FROM range(60)
), rows_hex AS (
  SELECT media_id, key, noise,
         string_agg(md5(key || ':' || y::VARCHAR), '' ORDER BY y) AS hx
  FROM base, range(16) t(y) GROUP BY ALL
), perturbed AS (
  SELECT media_id,
    CASE WHEN noise IS NULL THEN hx
    ELSE substr(hx, 1, (noise % 256)::INT * 2)
         || lower(printf('%02x',
              ((('0x' || substr(hx, (noise % 256)::INT * 2 + 1, 2))::INT
                + 1 + (noise % 9)::INT) % 256)))
         || substr(hx, (noise % 256)::INT * 2 + 3)
    END AS hx
  FROM rows_hex
)
SELECT media_id,
       sha256(hex(encode('P5' || chr(10) || '16 16' || chr(10)
                         || '255' || chr(10)) || unhex(hx)))
FROM perturbed
"""
            ).fetchall()
        }
        assert got == want


class TestPhashMedia:
    def test_flat_image_hashes_zero(self, spark):
        """Every block mean equals the image mean — strict > sets no
        bit in either hash."""
        from cod_stats_spark.operators.multimodal import phash_media

        df = spark.createDataFrame(
            [(1, _pgm([[100] * 16 for _ in range(16)]), "image")],
            "media_id long, media_bytes binary, media_type string",
        )
        got = phash_media(df).first()
        assert (got["ahash"], got["dhash"]) == (0, 0)
        assert (got["width"], got["height"]) == (16, 16)

    def test_half_bright_hand_computed(self, spark):
        """Left 8 columns 255, right 8 columns 0. aHash: col-blocks
        0..3 (cols 0..7) are brighter than the mean -> bits j=0..3 of
        every row-block -> 0x0F per row byte. dHash (9 col-blocks,
        bounds [0,1,3,5,7,8,10,12,14,16]): only the j=4 vs j=5 edge
        (cols 7 vs 8..9) crosses the boundary -> bit j=4 per row ->
        0x10 per row byte."""
        from cod_stats_spark.operators.multimodal import phash_media

        img = [[255] * 8 + [0] * 8 for _ in range(16)]
        df = spark.createDataFrame(
            [(1, _pgm(img), "image")],
            "media_id long, media_bytes binary, media_type string",
        )
        got = phash_media(df).first()
        want_a = sum(0x0F << (8 * i) for i in range(8))
        want_d = sum(0x10 << (8 * i) for i in range(8))
        assert got["ahash"] == want_a
        assert got["dhash"] == want_d

    def test_identical_media_identical_hashes(self, spark):
        """The byte-exact-dedup parity: rows sharing a key with no
        noise produce byte-identical payloads, hence hamming-0 pairs
        on BOTH hashes."""
        from cod_stats_spark.operators.multimodal import phash_media

        media = _media_df(spark, n=42, key_mod=7, noise=False)
        rows = phash_media(media).collect()
        groups: dict[int, set] = {}
        for r in rows:
            groups.setdefault(r["media_id"] % 7, set()).add(
                (r["ahash"], r["dhash"])
            )
        assert len(rows) == 42
        for k, hs in groups.items():
            assert len(hs) == 1, f"key {k} hashed unequally: {hs}"
        # distinct keys land on distinct fingerprints for this seed
        assert len({h for hs in groups.values() for h in hs}) == 7

    def test_single_pixel_noise_is_near_not_equal_payload(self, spark):
        """A one-pixel perturbation moves the PAYLOAD (byte dedup
        misses it) but keeps the perceptual hash within a few bits —
        the reason the media near-dup rung exists."""
        from cod_stats_spark.operators.multimodal import phash_media

        media = _media_df(spark, n=63, key_mod=7, noise_mod=3)
        payloads = {
            r["media_id"]: bytes(r["media_bytes"])
            for r in media.collect()
        }
        hashes = {
            r["media_id"]: r["ahash"] for r in phash_media(media).collect()
        }
        for mid in range(0, 63, 3):  # the perturbed ids
            base = mid + 7 if (mid + 7) % 3 != 0 else mid + 14
            if base >= 63:
                continue
            assert payloads[mid] != payloads[base]
            ham = bin(
                (hashes[mid] ^ hashes[base]) & ((1 << 64) - 1)
            ).count("1")
            assert ham <= 6, (mid, base, ham)

    def test_validation(self, spark):
        from cod_stats_spark.operators.multimodal import phash_media

        df = spark.createDataFrame(
            [(1, b"not a pgm", "image")],
            "media_id long, media_bytes binary, media_type string",
        )
        with pytest.raises(ValueError, match="hash_size"):
            phash_media(df, hash_size=9)
        with pytest.raises(Exception, match="not binary PGM"):
            phash_media(df).collect()


class TestHash64NearPairs:
    def test_exact_pair_set_within_pigeonhole(self, spark):
        """bands=4 guarantees every pair at hamming <= 3 shares a
        band — the emitted set must EQUAL the brute-force answer."""
        from cod_stats_spark.operators.dedup import hash64_near_pairs

        vals = [
            (1, 0x0123456789ABCDEF),
            (2, 0x0123456789ABCDEE),  # ham 1 vs id 1
            (3, 0x0123456789ABCD00),  # ham vs 1: EF^00 = 11101111 -> 7
            (4, 0x0123456789ABCDEF),  # ham 0 vs id 1
            (5, -0x0123456789ABCDF0),
        ]
        df = spark.createDataFrame(vals, "id long, simhash long")
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hash64_near_pairs(df, max_hamming=3).collect()
        }
        import itertools

        want = set()
        for (a, ha), (b, hb) in itertools.combinations(vals, 2):
            ham = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                want.add((a, b, ham))
        assert got == want
        assert (1, 4, 0) in got and (1, 2, 1) in got

    def test_combo_banding_and_custom_columns(self, spark):
        from cod_stats_spark.operators.dedup import hash64_near_pairs

        df = spark.createDataFrame(
            [(10, 7), (20, 7), (30, -1)], "media_id long, ahash long"
        )
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hash64_near_pairs(
                df,
                id_col="media_id",
                hash_col="ahash",
                max_hamming=3,
                combo=(6, 3),
            ).collect()
        }
        assert got == {(10, 20, 0)}

    def test_explicit_columns_on_canonically_named_frame(self, spark):
        """Non-default id_col/hash_col must be honored even when the
        frame's columns happen to be named id/simhash already (r16
        review: the lazy-normalization guard compared only the column
        list, so swapped arguments silently paired on the wrong
        columns)."""
        from cod_stats_spark.operators.dedup import hash64_near_pairs

        # semantics swapped: the HASH lives in 'id', the key in 'simhash'
        df = spark.createDataFrame(
            [(7, 100), (7, 200), (-1, 300)], "id long, simhash long"
        )
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hash64_near_pairs(
                df, id_col="simhash", hash_col="id", max_hamming=3
            ).collect()
        }
        assert got == {(100, 200, 0)}

    def test_simhash_near_pairs_delegates_unchanged(self, spark):
        """The refactor keeps simhash_near_pairs' behavior: identical
        docs still pair at hamming 0."""
        from cod_stats_spark.operators.dedup import simhash_near_pairs

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
             (3, "completely different text about ships at sea")],
            "id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_pairs(docs, "text", "id").collect()
        }
        assert (1, 2, 0) in got
