"""Unified media routing — ONE ingest surface over the whole codec
tier (the realistic shape: a 100 TB crawl lands as a single binary
column of MIXED formats, and the pipeline's first job is to find out
what it has).

``sniff_media`` classifies a payload by magic bytes alone (no decode):
raw MM02/MM03/MM04 buffers, PNG, baseline vs progressive JPEG, GIF,
RIFF WAVE, RIFF AVI, and the archive magics (gzip/bz2/xz).
``decode_any`` routes to the right decoder in operators/{multimodal,
png,jpeg,gif,wav,avi}.py and reduces every modality to one uniform
row: (media_type, units, checksum) where

- units = pixels for stills, summed frame-pixels for clips, samples
  for audio — the "how much signal" count a corpus census needs;
- checksum = sha256 of the DECODED canonical bytes (pixels/samples),
  truncated to 48 bits — proof the full decode ran, not a header peek.

``media_type_census`` aggregates the routed rows per type: item
count, total units, and an ORDER-INDEPENDENT checksum fold (sum of
the 48-bit per-item checksums in DECIMAL(38,0) — commutative, so no
partitioning or merge order can change it; the dedup-manifest trick).

Scale shape: sniff+decode is the codec tier's Arrow ``mapInPandas``
projection; the census is one tiny hash-aggregate (rows = #types).
Unknown formats are COUNTED, not dropped and not fatal — a census
must report the unknown tail, so ``decode_any`` maps them to
``unknown`` with units=0 and a checksum over the RAW bytes (the one
place raw bytes are the canonical content).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators import avi as avi_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import bmp as bmp_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import gif as gif_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import jpeg as jpeg_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import png as png_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import wav as wav_ops


def sniff_media(payload: bytes) -> str:
    """Magic-byte classification, no decoding."""
    if payload[:4] == b"MM02":
        return "raw_image"
    if payload[:4] == b"MM03":
        return "raw_audio"
    if payload[:4] == b"MM04":
        return "raw_video"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return (
            "jpeg_progressive"
            if jpeg_ops._is_progressive(payload)
            else "jpeg_baseline"
        )
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi_mjpeg"
    return "unknown"


def decode_any(payload: bytes) -> tuple[str, int, int]:
    """-> (media_type, units, checksum48) — full decode per type."""
    kind = sniff_media(payload)
    if kind == "raw_image":
        img = mm_ops._decode_raw(payload)
        units = img.shape[0] * img.shape[1]
        digest = hashlib.sha256(img.tobytes())
    elif kind == "raw_audio":
        _rate, x = mm_ops._decode_raw_audio(payload)
        units = len(x)
        digest = hashlib.sha256(x.astype("<i8").tobytes())
    elif kind == "raw_video":
        import struct as _struct

        w, h, c, nf = _struct.unpack_from("<IIII", payload, 4)
        body = np.frombuffer(
            payload, dtype="uint8", offset=mm_ops.VIDEO_HEADER_LEN
        )
        units = w * h * nf
        digest = hashlib.sha256(body.tobytes())
    elif kind == "png":
        img = png_ops.decode_png(payload)
        units = img.shape[0] * img.shape[1]
        digest = hashlib.sha256(img.tobytes())
    elif kind in ("jpeg_baseline", "jpeg_progressive"):
        img = jpeg_ops.decode_jpeg(payload)
        units = img.shape[0] * img.shape[1]
        digest = hashlib.sha256(img.tobytes())
    elif kind == "bmp":
        img = bmp_ops.decode_bmp(payload)
        units = img.shape[0] * img.shape[1]
        digest = hashlib.sha256(img.tobytes())
    elif kind == "gif":
        # the composited decoder (r11): identical pixels on full-canvas
        # clips, and partial/transparent/LCT animations decode instead
        # of loud-failing
        frames = gif_ops.decode_gif_animation(payload)
        units = sum(f.shape[0] * f.shape[1] for f in frames)
        digest = hashlib.sha256()
        for f in frames:
            digest.update(f.tobytes())
    elif kind == "wav":
        _rate, _codec, x = wav_ops.decode_wav(payload)
        units = len(x)
        digest = hashlib.sha256(x.astype("<i8").tobytes())
    elif kind == "avi_mjpeg":
        w, h, frames = avi_ops.parse_avi_mjpeg(payload)
        units = 0
        digest = hashlib.sha256()
        for fr in frames:
            img = jpeg_ops.decode_jpeg(fr)
            units += img.shape[0] * img.shape[1]
            digest.update(img.tobytes())
    else:
        units = 0
        digest = hashlib.sha256(payload)
    return kind, units, int(digest.hexdigest()[:12], 16)


ROUTED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("units", T.LongType()),
        T.StructField("checksum48", T.LongType()),
    ]
)


def route_media(media: DataFrame) -> DataFrame:
    """Mixed binary column -> one routed row per item (Arrow
    projection, no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, units, ck = decode_any(bytes(payload))
                rows.append((int(mid), kind, units, ck))
            yield pd.DataFrame(
                rows, columns=[f.name for f in ROUTED_SCHEMA.fields]
            )

    return media.mapInPandas(batches, ROUTED_SCHEMA)


def media_type_census(media: DataFrame) -> DataFrame:
    """Per-type census with an order-independent checksum fold."""
    return (
        route_media(media)
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("units").cast("decimal(38,0)"))
            .cast("long")
            .alias("total_units"),
            F.sum(F.col("checksum48").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum_fold"),
        )
        .orderBy("media_type")
    )


def synthesize_mixed_corpus(spark: SparkSession, n: int = 72) -> DataFrame:
    """Every format in one corpus, cycling deterministically, plus an
    unknown-format tail (content shared with the oracle twin via
    ``_mixed_payloads``)."""
    return spark.createDataFrame(
        [(i, "mixed", bytearray(p)) for i, p in _mixed_payloads(n)],
        mm_ops.MEDIA_SCHEMA,
    )


def _mixed_payloads(n: int = 72) -> list[tuple[int, bytes]]:
    """The synthesize_mixed_corpus content as plain bytes (shared by
    the fixture and the locally-recomputed VALUES oracle)."""
    rows = []
    for i in range(n):
        v = i % 10
        if v == 9:
            payload = bmp_ops.make_bmp_image(i)
        elif v == 0:
            payload = mm_ops.make_raw_image(i)
        elif v == 1:
            payload = mm_ops.make_raw_audio(i)
        elif v == 2:
            payload = mm_ops.make_raw_video(i)
        elif v == 3:
            payload = png_ops.make_png_image(i)
        elif v == 4:
            payload = jpeg_ops.make_jpeg_image(i if i % 5 != 4 else i + 1)
        elif v == 5:
            payload = jpeg_ops.encode_jpeg_progressive(
                jpeg_ops.decode_jpeg(jpeg_ops.make_jpeg_image(i))
            )
        elif v == 6:
            payload = gif_ops.make_gif_clip(i)
        elif v == 7:
            payload = wav_ops.make_wav_clip(i)
        else:
            payload = avi_ops.make_avi_mjpeg_clip(i)
        rows.append((i, payload))
    for i in range(n, n + 4):
        rows.append((i, f"not-media-{i}".encode() * 7))
    return rows


def local_census(n: int = 72) -> list[tuple[str, int, int, str]]:
    """Single-process census twin of ``media_type_census`` over the
    same corpus — the VALUES-oracle source."""
    agg: dict[str, list[int]] = {}
    for _mid, payload in _mixed_payloads(n):
        kind, units, ck = decode_any(bytes(payload))
        a = agg.setdefault(kind, [0, 0, 0])
        a[0] += 1
        a[1] += units
        a[2] += ck
    return [
        (k, a[0], a[1], str(a[2])) for k, a in sorted(agg.items())
    ]
