"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns carried next to a
typed metadata struct. Decode / feature-extract / resize / frame-sample
run as Arrow-batched functions over ``mapInPandas`` — per-partition
batch iterators, the right shape for a 100 TB media table (no per-row
Python, no driver collect, batches stream through each task).

The actual codec step is STUBBED (no PIL/ffmpeg in this environment):
``decode_image_meta`` parses a deterministic fake header we also use in
tests, and ``RealDecodeUnavailable`` marks where a real codec plugs in.
Everything around the stub — schemas, batching, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata schema carried alongside every media payload.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),      # fake | png | wav | ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        *MEDIA_META_SCHEMA.fields,
    ]
)


class RealDecodeUnavailable(NotImplementedError):
    """Raised where a real codec (PIL / soundfile / pyav) would be called."""


# ---------------------------------------------------------------- codecs
#
# The decode seam is a sniff-decode REGISTRY: each codec inspects the
# payload's magic bytes and either claims it (returning the metadata
# fields it can extract) or passes (None). ``_decode_one`` walks the
# registry in order and raises RealDecodeUnavailable only when no codec
# claims the payload — so plugging in PIL/soundfile/pyav is
# ``register_codec`` with a sniffer, no core changes. Two codecs ship:
# the FAKE test format, and a real pure-Python PNG header parser
# (signature + IHDR — the metadata this operator extracts needs no
# pixel decode, so no PIL required).


def _decode_fake(raw: bytes) -> dict | None:
    if not raw.startswith(b"FAKE|"):
        return None
    parts = raw.split(b"|", 5)
    return {
        "format": "fake",
        "width": int(parts[1]),
        "height": int(parts[2]),
        "n_frames": int(parts[3]),
        "sample_rate": int(parts[4]),
    }


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _decode_png(raw: bytes) -> dict | None:
    """PNG metadata decode, pure Python: 8-byte signature, then the
    IHDR chunk's big-endian width/height (bytes 16..24). Proves the
    registry seam works on a REAL format without any media library."""
    import struct

    if len(raw) < 24 or raw[:8] != PNG_SIGNATURE or raw[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", raw[16:24])
    return {"format": "png", "width": width, "height": height, "n_frames": 1}


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xCF + 1)
) - {0xC4, 0xC8, 0xCC}  # SOF0..15 minus DHT/JPG/DAC


def _decode_jpeg(raw: bytes) -> dict | None:
    """JPEG metadata decode, pure Python: walk the marker segments from
    SOI to the first SOF frame header and read its big-endian
    height/width (ITU T.81 §B.2.2 — precision byte, then Y, then X).
    No entropy decode, no library."""
    import struct

    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            return None  # desynced — not a parseable JPEG stream
        marker = raw[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        if pos + 9 <= len(raw) and marker in _JPEG_SOF_MARKERS:
            height, width = struct.unpack(">HH", raw[pos + 5 : pos + 9])
            return {"format": "jpeg", "width": width, "height": height, "n_frames": 1}
        (seg_len,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        if seg_len < 2:
            return None
        pos += 2 + seg_len
    return None


def _decode_wav(raw: bytes) -> dict | None:
    """WAV metadata decode, pure Python: RIFF/WAVE container walk; the
    ``fmt `` chunk yields channels/sample-rate/block-align, the
    ``data`` chunk size yields the frame count (size / block_align)."""
    import struct

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos = 12
    sample_rate = block_align = data_size = None
    while pos + 8 <= len(raw):
        chunk_id = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt " and len(body) >= 16:
            _fmt, _ch, sample_rate, _br, block_align, _bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif chunk_id == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None:
        return None
    n_frames = (
        int(data_size // block_align) if data_size is not None and block_align else None
    )
    return {"format": "wav", "sample_rate": int(sample_rate), "n_frames": n_frames}


# One definition of the P5 header grammar for BOTH the metadata
# sniffer and the pixel decoder — two drifting copies would let
# decode_media_meta accept a payload phash_media then rejects.
_PGM_HEADER_RE = re.compile(rb"P5\s+(\d+)\s+(\d+)\s+(\d+)\s")


def _decode_pgm(raw: bytes) -> dict | None:
    """Binary PGM (P5) metadata decode, pure Python: magic + ASCII
    width/height/maxval header, then one whitespace byte, then raw
    grayscale pixel bytes. The RASTER codec of the suite — the only
    built-in whose PIXELS are decodable without a media library, which
    is what the perceptual-hash near-dup path consumes."""
    if not raw.startswith(b"P5"):
        return None
    m = _PGM_HEADER_RE.match(raw)
    if m is None:
        return None
    return {
        "format": "pgm",
        "width": int(m.group(1)),
        "height": int(m.group(2)),
        "n_frames": 1,
    }


def _pgm_shape(raw: bytes):
    """(width, height, raster bytes) of a P5 payload — the validated
    header parse of :func:`_decode_pgm_pixels` WITHOUT materializing
    the 8×-inflated int64 pixel array, so callers can group/slice by
    shape first and decode only what they are about to hash (r17,
    ADVICE — batch-memory bounding). Raises on a malformed or short
    payload (a truncated raster would silently hash garbage
    otherwise)."""
    m = _PGM_HEADER_RE.match(raw or b"")
    if m is None:
        raise ValueError("phash_media: payload is not binary PGM (P5)")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval > 255:
        raise ValueError(
            f"phash_media: 16-bit PGM (maxval {maxval}) unsupported"
        )
    data = raw[m.end():]
    if len(data) < w * h:
        raise ValueError(
            f"phash_media: PGM declares {w}x{h} but carries only "
            f"{len(data)} pixel bytes"
        )
    return w, h, data


def _decode_pgm_pixels(raw: bytes):
    """(width, height, H×W int64 pixel array) of a P5 payload — the
    pixel-level sibling of :func:`_decode_pgm`, shared by
    :func:`phash_media`. Raises on a malformed or short payload (a
    truncated raster would silently hash garbage otherwise)."""
    import numpy as np

    w, h, data = _pgm_shape(raw)
    px = np.frombuffer(data[: w * h], dtype=np.uint8).astype(np.int64)
    return w, h, px.reshape(h, w)


CODECS: list = [_decode_fake, _decode_png, _decode_jpeg, _decode_wav, _decode_pgm]


def register_codec(sniff_decode) -> None:
    """Plug in a real codec: ``sniff_decode(raw: bytes) -> dict | None``
    returning metadata fields for payloads it claims, None otherwise.
    Registered codecs are consulted after the built-ins."""
    CODECS.append(sniff_decode)


def make_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministically synthesize a binary media payload per row.

    Header layout (ASCII): ``FAKE|<w>|<h>|<frames>|<rate>|`` followed by
    the UTF-8 payload bytes. Used by tests and the bench harness so the
    decode path has real bytes to chew on without bundled media files.

    Dimensions derive from md5 prefixes (not xxhash/crc32) so an
    independent engine can recompute the expected metadata — the
    correctness gate rebuilds this header in DuckDB and cross-checks
    the decoded output.
    """

    def _md5_dim(col, modulus):
        return (
            F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % modulus + 1
        ).cast("int")

    w = _md5_dim(F.col(text_col), 1920)
    h = _md5_dim(F.reverse(F.col(text_col)), 1080)
    frames = _md5_dim(F.concat(F.col(text_col), F.lit("f")), 300)
    rate = F.lit(16000)
    header = F.concat_ws(
        "|", F.lit("FAKE"), w.cast("string"), h.cast("string"),
        frames.cast("string"), rate.cast("string"), F.lit(""),
    )
    payload = F.concat(header, F.col(text_col)).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("media_bytes"),
        F.lit("image").alias("media_type"),
    )


def make_png_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize REAL PNG-headered binary payloads per row (signature +
    IHDR with md5-derived dimensions, zero CRC, text bytes as body) —
    the input for exercising the PNG codec end-to-end. All JVM-side
    (unhex/concat), and byte-reproducible in the SQL oracle, which
    rebuilds the identical blob and cross-checks a sha256 over its hex
    rendering."""

    def _md5_dim(col, modulus):
        return (
            F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % modulus + 1
        ).cast("int")

    w = _md5_dim(F.col(text_col), 1920)
    h = _md5_dim(F.reverse(F.col(text_col)), 1080)
    header = F.concat(
        F.unhex(F.lit(PNG_SIGNATURE.hex().upper() + "0000000D" + "49484452")),
        F.unhex(F.concat(F.lpad(F.hex(w), 8, "0"), F.lpad(F.hex(h), 8, "0"))),
        # bit depth 8, color type 2 (truecolor), compression/filter/
        # interlace 0, then a zeroed CRC (metadata decode skips it)
        F.unhex(F.lit("0802000000" + "00000000")),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.concat(header, F.col(text_col).cast("binary")).alias("media_bytes"),
        F.lit("image").alias("media_type"),
    )


def _le16(v):
    """4-char LE hex rendering of a 16-bit int column (byte-swapped)."""
    be = F.lpad(F.hex(v), 4, "0")
    return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))


def _le32(v):
    """8-char LE hex rendering of a 32-bit int column (byte-reversed)."""
    be = F.lpad(F.hex(v), 8, "0")
    return F.concat(
        F.substring(be, 7, 2), F.substring(be, 5, 2),
        F.substring(be, 3, 2), F.substring(be, 1, 2),
    )


def _md5_mod(col, modulus):
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % modulus


def make_jpeg_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize REAL JPEG-headered payloads per row: SOI + a SOF0
    frame header (precision 8, md5-derived height/width, 3 components)
    + text bytes as body. All JVM-side hex/unhex — byte-reproducible
    in the SQL oracle."""
    w = (_md5_mod(F.col(text_col), 1920) + 1).cast("int")
    h = (_md5_mod(F.reverse(F.col(text_col)), 1080) + 1).cast("int")
    header = F.unhex(
        F.concat(
            # SOI, SOF0 marker, length 0x0011, precision 8
            F.lit("FFD8" + "FFC0" + "0011" + "08"),
            F.lpad(F.hex(h), 4, "0"),
            F.lpad(F.hex(w), 4, "0"),
            # 3 components: (id, sampling 1x1, quant table)
            F.lit("03" + "011100" + "021101" + "031101"),
        )
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.concat(header, F.col(text_col).cast("binary")).alias("media_bytes"),
        F.lit("image").alias("media_type"),
    )


def make_wav_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize REAL RIFF/WAVE payloads per row: canonical 44-byte
    header (PCM fmt chunk with md5-derived sample rate and channel
    count, little-endian fields) + text bytes as the data chunk."""
    rate = ((_md5_mod(F.col(text_col), 4) + 1) * 8000).cast("int")  # 8/16/24/32 kHz
    channels = (_md5_mod(F.reverse(F.col(text_col)), 2) + 1).cast("int")
    block_align = (channels * 2).cast("int")          # 16-bit samples
    byte_rate = (rate * block_align).cast("int")
    data_size = F.octet_length(F.col(text_col)).cast("int")
    header = F.unhex(
        F.concat(
            F.lit("52494646"),                  # 'RIFF'
            _le32(data_size + 36),
            F.lit("57415645" + "666D7420" + "10000000" + "0100"),  # 'WAVE','fmt ',16,PCM
            _le16(channels),
            _le32(rate),
            _le32(byte_rate),
            _le16(block_align),
            F.lit("1000"),                      # bits per sample = 16 LE
            F.lit("64617461"),                  # 'data'
            _le32(data_size),
        )
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.concat(header, F.col(text_col).cast("binary")).alias("media_bytes"),
        F.lit("audio").alias("media_type"),
    )


def _decode_one(media_id: int, raw: bytes, media_type: str) -> dict:
    import hashlib

    meta = {
        "media_id": media_id,
        "media_type": media_type,
        "format": None,
        "width": None,
        "height": None,
        "n_frames": None,
        "sample_rate": None,
        "n_bytes": len(raw) if raw is not None else 0,
        "sha256": hashlib.sha256(raw).hexdigest() if raw is not None else None,
    }
    if raw is not None:
        for codec in CODECS:
            fields = codec(raw)
            if fields is not None:
                meta.update(fields)
                return meta
    raise RealDecodeUnavailable(
        f"no registered codec claims media_id={media_id}; add one with "
        "register_codec() (PIL / soundfile / pyav adapters plug in there)"
    )


def decode_media_meta(df: DataFrame) -> DataFrame:
    """binary payload → typed metadata rows, via mapInPandas.

    Arrow-batched: each pandas batch is decoded in one Python call per
    partition-batch; partitioning of the input is preserved (no shuffle).
    """

    names = [f.name for f in DECODED_SCHEMA.fields]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation: pd.DataFrame from per-column lists
            # is several times faster than from a list of per-row dicts
            cols: dict[str, list] = {n: [] for n in names}
            for mid, raw, mtype in zip(
                pdf["media_id"], pdf["media_bytes"], pdf["media_type"]
            ):
                meta = _decode_one(mid, raw, mtype)
                for n in names:
                    cols[n].append(meta[n])
            yield pd.DataFrame(cols, columns=names)

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample frame indices from decoded video metadata (codegen-side)."""
    return df.withColumn(
        "sampled_frames",
        F.when(
            F.col("n_frames").isNotNull(),
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
        ),
    )


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Compute target dimensions preserving aspect ratio (metadata-only;
    the pixel op itself would live in the decode mapInPandas stage)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return df.withColumn("target_width", F.ceil(F.col("width") * scale).cast("int")).withColumn(
        "target_height", F.ceil(F.col("height") * scale).cast("int")
    )


# ------------------------------------------------- perceptual hashing
#
# Media-CONTENT near-dup (the LAION-pipeline posture): a 64-bit
# aHash/dHash over decoded grayscale pixels, integer-exact so the SQL
# oracle can re-derive every bit, feeding the existing Hamming-LSH
# banding in operators/dedup.py (SimHash's table layouts apply
# verbatim to any 64-bit fingerprint).


def phash_block_bounds(n: int, blocks: int) -> list[int]:
    """Downsample-block boundaries b[0..blocks] over an n-pixel axis:
    block j covers [b[j], b[j+1]) with b[j] = floor(j·n/blocks) — the
    single source of truth for the grid, shared by the numpy hash
    path AND the DuckDB oracle generator (the simhash_combo_layout
    convention, so the two engines cannot drift on block edges)."""
    return [(j * n) // blocks for j in range(blocks + 1)]


def make_pgm_media(
    df: DataFrame,
    id_col: str,
    key_col: str,
    noise_col: str | None = None,
    height: int = 16,
) -> DataFrame:
    """Synthesize REAL binary-PGM (P5) grayscale rasters per row — the
    pixel-bearing input for the perceptual-hash path. Deterministic
    and engine-reproducible: row y's 16 pixels are the md5 bytes of
    ``key || ':' || y`` (md5 is identical in Spark and DuckDB, the
    make_fake_media convention), so rows sharing ``key_col`` get
    byte-identical images. ``noise_col`` (nullable int) perturbs ONE
    pixel — index ``noise % (16·height)`` gets ``+1 + noise % 9``
    mod 256 — producing true NEAR-duplicates of the same key's base
    image (a single pixel moves at most a couple of hash bits). Width
    is fixed at 16 (one md5 digest per row); all JVM-side
    string/hex ops, zero Python."""
    rows = F.concat_ws(
        "",
        F.expr(
            f"transform(sequence(0, {int(height) - 1}), y ->"
            f" md5(concat(cast({key_col} as string), ':',"
            " cast(y as string))))"
        ),
    )
    if noise_col is not None:
        pos = F.pmod(F.col(noise_col), F.lit(16 * int(height)))
        delta = F.pmod(F.col(noise_col), F.lit(9)) + F.lit(1)
        old_px = F.conv(F.substring(rows, pos * 2 + 1, 2), 16, 10).cast(
            "int"
        )
        new_hex = F.lpad(F.lower(F.hex(F.pmod(old_px + delta, 256))), 2, "0")
        rows = F.when(F.col(noise_col).isNull(), rows).otherwise(
            F.overlay(rows, new_hex, pos * 2 + 1, F.lit(2))
        )
    header = F.lit(f"P5\n16 {int(height)}\n255\n").cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.concat(header, F.unhex(rows)).alias("media_bytes"),
        F.lit("image").alias("media_type"),
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ahash", LongType()),
        StructField("dhash", LongType()),
    ]
)


#: past this pixel count the vectorized hasher's int64 cross-products
#: (s · npx) could overflow, so those rows take the arbitrary-
#: precision per-row Python path instead (same bits by construction)
_PHASH_VECTOR_NPX_CAP = 100_000_000

#: total-pixel budget per vectorized slice: the (N, h, w) int64 stack
#: plus its (N, h+1, w+1) prefix-sum stack cost ~16 bytes/pixel, so
#: 32M px bounds the hasher's working set at ~0.5 GB per task
#: regardless of Arrow batch size (r17, ADVICE — the previous code
#: decoded EVERY image in the batch to int64 up front, tens of GB for
#: a default 10k-row batch of megapixel images)
_PHASH_GROUP_PX_BUDGET = 32_000_000


def _phash_group(pxs, hash_size: int):
    """Vectorized aHash/dHash over a (N, h, w) int64 pixel stack —
    the batch form of :func:`_phash_one`'s per-image arithmetic
    (identical bits: same prefix sums, same floor block bounds, same
    cross-multiplied integer comparisons, evaluated per-image along
    axis 0; parity-pinned in tests/test_phash.py). Returns (ahash,
    dhash) int64 arrays of length N."""
    import numpy as np

    N, h, w = pxs.shape
    pre = np.zeros((N, h + 1, w + 1), dtype=np.int64)
    pre[:, 1:, 1:] = pxs.cumsum(axis=1).cumsum(axis=2)

    def block(r0, r1, c0, c1):
        return (
            pre[:, r1, c1]
            - pre[:, r0, c1]
            - pre[:, r1, c0]
            + pre[:, r0, c0]
        )

    rb = phash_block_bounds(h, hash_size)
    ca = phash_block_bounds(w, hash_size)
    cd = phash_block_bounds(w, hash_size + 1)
    total = pre[:, h, w]
    npx = w * h
    ah = np.zeros(N, dtype=np.uint64)
    dh = np.zeros(N, dtype=np.uint64)
    for i in range(hash_size):
        r0, r1 = rb[i], rb[i + 1]
        for j in range(hash_size):
            s = block(r0, r1, ca[j], ca[j + 1])
            n = (r1 - r0) * (ca[j + 1] - ca[j])
            ah |= (s * npx > total * n).astype(np.uint64) << np.uint64(
                i * hash_size + j
            )
        for j in range(hash_size):
            s1 = block(r0, r1, cd[j], cd[j + 1])
            n1 = (r1 - r0) * (cd[j + 1] - cd[j])
            s2 = block(r0, r1, cd[j + 1], cd[j + 2])
            n2 = (r1 - r0) * (cd[j + 2] - cd[j + 1])
            dh |= (s1 * n2 > s2 * n1).astype(np.uint64) << np.uint64(
                i * hash_size + j
            )
    return ah.view(np.int64), dh.view(np.int64)


def _phash_one(raw: bytes, hash_size: int) -> tuple:
    import numpy as np

    w, h, px = _decode_pgm_pixels(raw)
    # 2D prefix sums -> any block sum in O(1), all int64-exact
    pre = np.zeros((h + 1, w + 1), dtype=np.int64)
    pre[1:, 1:] = px.cumsum(axis=0).cumsum(axis=1)

    def block(r0, r1, c0, c1):
        return pre[r1, c1] - pre[r0, c1] - pre[r1, c0] + pre[r0, c0]

    rb = phash_block_bounds(h, hash_size)
    ca = phash_block_bounds(w, hash_size)
    cd = phash_block_bounds(w, hash_size + 1)
    total = int(pre[h, w])
    npx = w * h
    ah = 0
    for i in range(hash_size):
        for j in range(hash_size):
            s = int(block(rb[i], rb[i + 1], ca[j], ca[j + 1]))
            n = (rb[i + 1] - rb[i]) * (ca[j + 1] - ca[j])
            # mean_block > mean_image, cross-multiplied: exact ints
            if s * npx > total * n:
                ah |= 1 << (i * hash_size + j)
    dh = 0
    for i in range(hash_size):
        for j in range(hash_size):
            s1 = int(block(rb[i], rb[i + 1], cd[j], cd[j + 1]))
            n1 = (rb[i + 1] - rb[i]) * (cd[j + 1] - cd[j])
            s2 = int(block(rb[i], rb[i + 1], cd[j + 1], cd[j + 2]))
            n2 = (rb[i + 1] - rb[i]) * (cd[j + 2] - cd[j + 1])
            if s1 * n2 > s2 * n1:
                dh |= 1 << (i * hash_size + j)

    def signed64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    return w, h, signed64(ah), signed64(dh)


def phash_media(df: DataFrame, hash_size: int = 8) -> DataFrame:
    """64-bit perceptual hashes over a binary-PGM media column —
    (media_id, width, height, ahash, dhash), Arrow-batched via
    mapInPandas (the decode_media_meta shape: per-partition batch
    iterators, no shuffle, no driver collect).

    - ``ahash``: block-mean downsample to hash_size×hash_size; bit =
      block mean > image mean.
    - ``dhash``: hash_size×(hash_size+1) grid; bit = left block mean
      > right block mean (horizontal gradient sign).

    Every comparison is CROSS-MULTIPLIED integer arithmetic (no
    float division anywhere), so the bits are exactly reproducible
    from the pixel definition — the media_phash gate re-derives all
    128 bits per image in DuckDB. Bit order: bit i·hash_size+j =
    (row-block i, col-block j), LSB first; the packed value is the
    two's-complement int64 (hex renderings agree with DuckDB's
    UBIGINT view of the same bits). Uneven block grids (width/height
    not divisible) are handled by the floor boundaries of
    :func:`phash_block_bounds`; degenerate empty blocks (width <
    hash_size+1) compare 0 > 0 = unset bits. Hamming-LSH pairing over
    the result lives in ``operators.dedup.hash64_near_pairs``."""
    if not 1 <= int(hash_size) <= 8:
        raise ValueError("phash_media: hash_size must be 1..8 (64 bits)")
    hs = int(hash_size)

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r16 optimization (guide §4.2 — hand whole batches to
        # vectorized native code): decode per row (header parse +
        # frombuffer, cheap), then hash each same-shape group as ONE
        # numpy pass over the (N, h, w) stack instead of per-image
        # Python loops with per-image prefix-sum allocations. Bits
        # are identical (_phash_group mirrors _phash_one's integer
        # arithmetic; parity-pinned); oversized images fall back to
        # the arbitrary-precision per-row path.
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            mids = pdf["media_id"].to_numpy()
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            ah = np.zeros(n, dtype=np.int64)
            dh = np.zeros(n, dtype=np.int64)
            groups: dict = {}
            # pass 1: headers only (validation order preserved) —
            # pixels decode per SLICE below, so the 8×-inflated int64
            # stacks never exceed _PHASH_GROUP_PX_BUDGET at once
            # (r17, ADVICE — the old code held every decoded image of
            # the Arrow batch simultaneously)
            for idx, raw in enumerate(pdf["media_bytes"]):
                w, h, _ = _pgm_shape(raw)
                widths[idx], heights[idx] = w, h
                groups.setdefault((w, h), []).append(idx)
            for (w, h), idxs in groups.items():
                if w * h > _PHASH_VECTOR_NPX_CAP:
                    for i in idxs:
                        _, _, a, d = _phash_one(
                            pdf["media_bytes"].iloc[i], hs
                        )
                        ah[i], dh[i] = a, d
                    continue
                step = max(1, _PHASH_GROUP_PX_BUDGET // (w * h))
                for lo in range(0, len(idxs), step):
                    part = idxs[lo : lo + step]
                    stack = np.stack(
                        [
                            _decode_pgm_pixels(pdf["media_bytes"].iloc[i])[2]
                            for i in part
                        ]
                    )
                    ga, gd = _phash_group(stack, hs)
                    ah[part], dh[part] = ga, gd
                    del stack
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "width": widths,
                    "height": heights,
                    "ahash": ah,
                    "dhash": dh,
                }
            )

    return df.mapInPandas(hash_batches, PHASH_SCHEMA)
