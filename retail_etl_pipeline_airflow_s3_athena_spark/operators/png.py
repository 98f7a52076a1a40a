"""Stdlib PNG codec: the one slice of the compressed-media gap
closable without PIL/ffmpeg (r7 verdict #5).

PNG's container is zlib (stdlib) plus five per-scanline byte filters
(None/Sub/Up/Average/Paeth, RFC 2083 §6) — all pure integer
arithmetic, so an 8-bit grayscale/RGB/RGBA decode is deterministic
bit-for-bit across engines, partitionings, and numpy versions.  This
module implements:

- ``decode_png``: chunk walk → IDAT concat → ``zlib.decompress`` →
  scanline defilter → (h, w, c) uint8.  Refuses (loudly) anything
  outside the deterministic-integer envelope: palette/16-bit/
  interlaced images and truncated/corrupt streams.
- ``encode_png``: the fixture-side inverse (filter + compress), with
  a per-row filter cycle so the decoder's Sub/Up/Average/Paeth paths
  are all exercised by every synthesized image.
- ``png_features``: the distributed operator — Arrow ``mapInPandas``
  over BINARY payload rows, emitting per-image integer stats + a
  decoded-pixel checksum.  A pure projection: no shuffle; memory
  bounded by Arrow's maxRecordsPerBatch × payload size, independent
  of corpus size (same scale shape as multimodal.resize_media).

Reference scope: the reference pipeline (scripts/transform.py) is
text/CSV only — this is extension coverage for the multimodal
training-data tier; JPEG/video stay behind the loud
``NotImplementedError`` swap-in point in operators/multimodal.py.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators.multimodal import MEDIA_SCHEMA

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> channels (8-bit, non-palette only)
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, exactly RFC 2083 §6.6 (ties: a, then b)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, filter_cycle: bool = True) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a valid 8-bit PNG.
    ``filter_cycle=True`` rotates the row filter through 0..4 so every
    defilter path gets exercised; False writes filter 0 everywhere."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c  # bytes per pixel at bit depth 8
    raw = img.astype(np.int64)
    out = bytearray()
    prev = np.zeros((w, c), dtype=np.int64)
    for y in range(h):
        row = raw[y]
        ft = (y % 5) if filter_cycle else 0
        flat = row.reshape(-1)
        prev_flat = prev.reshape(-1)
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), flat[:-bpp]])
        upleft = np.concatenate(
            [np.zeros(bpp, dtype=np.int64), prev_flat[:-bpp]]
        )
        if ft == 0:
            filt = flat
        elif ft == 1:
            filt = flat - left
        elif ft == 2:
            filt = flat - prev_flat
        elif ft == 3:
            filt = flat - (left + prev_flat) // 2
        else:
            pred = np.array(
                [
                    _paeth(int(a), int(b), int(cc))
                    for a, b, cc in zip(left, prev_flat, upleft)
                ],
                dtype=np.int64,
            )
            filt = flat - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale/gray+alpha/RGB/RGBA PNG to an
    (h, w, c) uint8 array.  Pure stdlib + integer defiltering —
    bit-deterministic.  Raises ``NotImplementedError`` for palette,
    16-bit, or interlaced images (outside the integer-exact envelope
    this container can guarantee) and ``ValueError`` for corrupt
    streams."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _COLOR_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color_type} requires "
            "imaging libraries not present in this environment; only "
            "8-bit grayscale/gray+alpha/RGB/RGBA decodes"
        )
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    c = _COLOR_CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.int64)
    bpp = c
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up — vectorizable
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth depend on the reconstructed left
            # neighbor — sequential along the row by construction
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, cc)
                rec[i] = (int(line[i]) + pred) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec
    return out.astype(np.uint8).reshape(h, w, c)


# ---------------------------------------------------------------------------
# Fixtures + the distributed operator
# ---------------------------------------------------------------------------

def make_png_image(media_id: int) -> bytes:
    """Deterministic PNG: gradient-ish integer pixels (same generator
    family as multimodal.make_raw_image), channel count cycling
    1/3/4 so all supported color types appear in every corpus."""
    c = (1, 3, 4)[media_id % 3]
    w = 16 + (media_id * 7) % 48
    h = 16 + (media_id * 11) % 48
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    img = ((media_id * 31 + yy * 7 + xx * 13 + cc * 97) % 256).astype(
        np.uint8
    )
    return encode_png(img)


def synthesize_png_images(spark: SparkSession, n: int = 40) -> DataFrame:
    rows = [(i, "image", make_png_image(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PNG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_c0_e2", T.LongType()),
        T.StructField("edge_energy", T.LongType()),
        T.StructField("pixel_checksum", T.StringType()),
    ]
)


def png_stats(payload: bytes) -> tuple:
    """Single-image feature row (shared by the operator and the
    locally-recomputed VALUES oracle): integer mean of channel 0 in
    e2 fixed point (truncating), total |horizontal gradient| of
    channel 0 (an exact integer edge-energy proxy), and a checksum of
    the DECODED pixel buffer (proves the full inflate+defilter ran)."""
    img = decode_png(payload)
    h, w, c = img.shape
    ch0 = img[:, :, 0].astype(np.int64)
    mean_e2 = int(100 * int(ch0.sum()) // (h * w))
    edge = int(np.abs(np.diff(ch0, axis=1)).sum())
    return (
        h,
        w,
        c,
        mean_e2,
        edge,
        hashlib.sha256(img.tobytes()).hexdigest()[:16],
    )


def png_features(media: DataFrame) -> DataFrame:
    """Distributed PNG decode + feature extraction: Arrow batches in,
    one integer-stats row per image out.  Pure projection (no
    shuffle); the decode is the real inflate + defilter, not a header
    peek."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h, w, c, mean_e2, edge, ck = png_stats(bytes(payload))
                rows.append((int(mid), w, h, c, mean_e2, edge, ck))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PNG_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, PNG_FEATURE_SCHEMA)
