"""BMP (Windows bitmap) codec — the uncompressed-raster leg of the
image ingest tier.

BMP is the simplest container real corpora still carry (clipboard
exports, legacy scans, screenshot dumps): BITMAPFILEHEADER +
BITMAPINFOHEADER + optional palette + bottom-up (or top-down)
4-byte-padded pixel rows.  Joins png.py / jpeg.py / gif.py as the
fourth image decoder; the public format reference is the Windows
BITMAPINFOHEADER layout (40-byte header, BI_RGB uncompressed).

Legal envelope (decoded fully, no shortcuts):
- 24-bit BGR888 truecolor,
- 8-bit palettized (BGRA quads, biClrUsed-aware),
- bottom-up AND top-down (negative biHeight) row orders,
- row padding to 4-byte boundaries (odd widths cycle in the
  fixture so the padding math is always exercised).

Loud-fail frontier (the codec-tier honesty discipline): RLE4/RLE8 /
bitfields compression, 1/4/16/32 bpp, and non-BITMAPINFOHEADER
header sizes raise ``NotImplementedError`` by name.

Correctness: the gate synthesizes deterministic payloads per
media_id (depth / row-order / odd-width cycles), decodes them
distributed (Arrow ``mapInPandas``, shuffle-free), and hashes
integer stats + a decoded-pixel checksum against a
locally-recomputed VALUES oracle — the resize_raw_images pattern
shared by the other decoders.

Scale: per-record decode inside a projection; memory bounded by
Arrow batch x image size; no shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators.multimodal import MEDIA_SCHEMA


def encode_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (BGR on the
    wire, rows padded to 4 bytes, bottom-up unless ``top_down``)."""
    h, w, _ = img.shape
    bgr = img[:, :, ::-1]
    row_len = (w * 3 + 3) & ~3
    rows = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bgr[y].tobytes()
        rows += row + b"\x00" * (row_len - len(row))
    pix_off = 14 + 40
    file_size = pix_off + len(rows)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, 24, 0, len(rows),
        2835, 2835, 0, 0,
    )
    return header + info + bytes(rows)


def encode_bmp_palette(
    idx: np.ndarray, palette: np.ndarray, top_down: bool = False
) -> bytes:
    """(h, w) uint8 indices + (n, 3) uint8 RGB palette -> 8-bit
    palettized BI_RGB BMP (BGRA quads, biClrUsed = n)."""
    h, w = idx.shape
    n = palette.shape[0]
    quads = bytearray()
    for r, g, b in palette:
        quads += bytes((int(b), int(g), int(r), 0))
    row_len = (w + 3) & ~3
    rows = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = idx[y].tobytes()
        rows += row + b"\x00" * (row_len - len(row))
    pix_off = 14 + 40 + len(quads)
    file_size = pix_off + len(rows)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, 8, 0, len(rows),
        2835, 2835, n, 0,
    )
    return header + info + bytes(quads) + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB.  24-bit and 8-bit-palette
    BI_RGB only; everything else loud-fails by name."""
    if payload[:2] != b"BM":
        raise NotImplementedError("not a BM bitmap")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size != 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} unsupported; "
            "BITMAPINFOHEADER (40) only"
        )
    w, h_raw, _planes, bpp, comp, _isz, _xp, _yp, clr_used, _imp = (
        struct.unpack_from("<iiHHIIiiII", payload, 18)
    )
    if comp != 0:
        raise NotImplementedError(
            f"BMP compression {comp} unsupported; BI_RGB only"
        )
    if bpp not in (8, 24):
        raise NotImplementedError(
            f"BMP bit depth {bpp} unsupported; 8/24 only"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if bpp == 8:
        n = clr_used or 256
        quads = np.frombuffer(
            payload, np.uint8, count=n * 4, offset=14 + 40
        ).reshape(n, 4)
        palette = quads[:, 2::-1]  # BGRA -> RGB
        row_len = (w + 3) & ~3
        data = np.frombuffer(
            payload, np.uint8, count=row_len * h, offset=pix_off
        ).reshape(h, row_len)[:, :w]
        img = palette[data]
    else:
        row_len = (w * 3 + 3) & ~3
        data = np.frombuffer(
            payload, np.uint8, count=row_len * h, offset=pix_off
        ).reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
        img = data[:, :, ::-1]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


BMP_FEATURE_SCHEMA = T.StructType(
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


def bmp_stats(payload: bytes) -> tuple:
    """Single-image feature row (shared by the operator and the
    locally-recomputed VALUES oracle) — same stats contract as the
    png/jpeg decoders."""
    img = decode_bmp(payload)
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


def bmp_features(media: DataFrame) -> DataFrame:
    """Distributed BMP decode + feature extraction: Arrow batches in,
    one integer-stats row per image out.  Pure projection."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h, w, c, mean_e2, edge, ck = bmp_stats(bytes(payload))
                rows.append((int(mid), w, h, c, mean_e2, edge, ck))
            yield pd.DataFrame(
                rows, columns=[f.name for f in BMP_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, BMP_FEATURE_SCHEMA)


def make_bmp_image(media_id: int) -> bytes:
    """Deterministic fixture payload: odd widths (padding legs),
    bottom-up/top-down alternation, 24-bit vs 8-bit-palette cycle."""
    w = 13 + media_id % 7
    h = 9 + media_id % 5
    top_down = media_id % 2 == 1
    if media_id % 3 == 0:
        n = 16 + media_id % 17
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        idx = ((media_id * 11 + yy * 5 + xx * 3) % n).astype(np.uint8)
        pal = np.stack(
            [
                (np.arange(n) * 29 + media_id * 7) % 256,
                (np.arange(n) * 53 + media_id * 13) % 256,
                (np.arange(n) * 97 + media_id * 3) % 256,
            ],
            axis=1,
        ).astype(np.uint8)
        return encode_bmp_palette(idx, pal, top_down)
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    img = ((media_id * 31 + yy * 7 + xx * 13 + cc * 97) % 256).astype(
        np.uint8
    )
    return encode_bmp(img, top_down)


def synthesize_bmp_images(spark: SparkSession, n: int = 40) -> DataFrame:
    rows = [(i, "image", make_bmp_image(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
