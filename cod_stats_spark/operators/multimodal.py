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


CODECS: list = [_decode_fake, _decode_png]


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

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_one(mid, raw, mtype)
                for mid, raw, mtype in zip(
                    pdf["media_id"], pdf["media_bytes"], pdf["media_type"]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

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
