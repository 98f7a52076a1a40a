"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed through Arrow-batched pandas
iterators (mapInPandas).

The container has no image/audio codecs, so the *decode* step is
stubbed: payloads follow a tiny deterministic fake format
(``MM01`` magic + kind byte + width/height/duration header + body) that
``_parse_header`` reads; a real deployment swaps ``_parse_header`` for
PIL/ffmpeg behind the same batch interface.  Everything around the stub
— schema, batch iteration, partitioning, output contract — is real
Spark plumbing and is what actually matters at 100 TB:

- payloads never pass through Python row-at-a-time: mapInPandas gets
  Arrow record batches; memory is bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob size.
- feature extraction emits fixed-width vectors (array<float>), ready
  for operators/similarity.py's ANN path.
- frame sampling is a 1->N flatMap done inside the batch iterator, so
  a video row never materializes all frames at once.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"MM01"
# Full MM01 header: 4-byte magic + packed (kind, width, height, duration).
HEADER_LEN = len(MAGIC) + struct.calcsize("<BIII")
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def make_payload(media_id: int, kind_code: int) -> bytes:
    """Deterministic fake media blob: header + pseudo-random body."""
    width = 64 + (media_id * 17) % 512
    height = 64 + (media_id * 29) % 512
    duration = (media_id * 37) % 60000 if kind_code else 0
    body_len = 128 + (media_id * 13) % 256
    body = bytes((media_id * 7 + i * 31) % 256 for i in range(body_len))
    return (
        MAGIC
        + struct.pack("<BIII", kind_code, width, height, duration)
        + body
    )


def synthesize_media(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic fake media table (no fixture table carries binary
    payloads; tests and the rows-only contract query build their own)."""
    rows = [
        (i, KINDS[i % 3], make_payload(i, i % 3)) for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _parse_header(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode: reads the fake header.  A real build replaces this
    with PIL / soundfile / ffmpeg probing behind the same signature."""
    if payload[:4] != MAGIC:
        raise NotImplementedError(
            "real media decoding requires imaging/audio libraries not "
            "present in this environment; payload is not in MM01 stub format"
        )
    kind_code, width, height, duration = struct.unpack_from("<BIII", payload, 4)
    return kind_code, width, height, duration


def extract_metadata(media: DataFrame) -> DataFrame:
    """Decode headers + checksum payloads, batch-at-a-time via Arrow."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                _, width, height, duration = _parse_header(b)
                out.append(
                    (
                        int(mid),
                        kind,
                        width,
                        height,
                        duration,
                        len(b),
                        hashlib.sha256(b).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in META_SCHEMA.fields]
            )

    return media.mapInPandas(batches, META_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Fixed-width feature vectors from payload bytes (normalized
    16-bucket byte histogram — a deterministic stand-in for a real
    vision/audio encoder with the same batch shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)[HEADER_LEN:]  # body only, header excluded
                hist = [0] * FEATURE_DIM
                for byte in b:
                    hist[byte % FEATURE_DIM] += 1
                total = float(len(b)) or 1.0
                rows.append((int(mid), [h / total for h in hist]))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 10000) -> DataFrame:
    """1->N frame sampling for video rows (non-video rows emit nothing).
    Frames are described, not materialized — the real decode hook sits
    where frame_checksum is computed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                b = bytes(payload)
                _, _, _, duration = _parse_header(b)
                for idx, ms in enumerate(range(0, max(duration, 1), every_ms)):
                    frame_sig = hashlib.sha256(
                        b + ms.to_bytes(4, "little")
                    ).hexdigest()[:12]
                    rows.append((int(mid), idx, ms, frame_sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


F0_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("f0_e6", T.LongType()),
    ]
)


def extract_f0_e6(media: DataFrame) -> DataFrame:
    """Exact-integer twin of ``extract_features``' first histogram
    bucket: ``count(body bytes ≡ 0 mod FEATURE_DIM) * 10^6 // len(body)``.
    Pure 64-bit integer arithmetic end to end, so the value is
    bit-identical on any engine — this is what lets the pipeline query
    carry a locally-recomputed VALUES-literal oracle instead of the
    rows-only check (float32 Arrow round-trips in the feature vector
    are NOT canon-stable; scaled integers are — see
    tools/check_oracle.py's full-precision hash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)[HEADER_LEN:]
                hist0 = sum(1 for byte in b if byte % FEATURE_DIM == 0)
                rows.append((int(mid), hist0 * 10**6 // max(len(b), 1)))
            yield pd.DataFrame(rows, columns=["media_id", "f0_e6"])

    return media.mapInPandas(batches, F0_SCHEMA)


def media_pipeline(spark: SparkSession, n: int = 60) -> DataFrame:
    """End-to-end: synthesize -> metadata -> join exact-integer feature
    -> project.  All output columns are integers/strings computed
    deterministically from the payload bytes, so the gate checks this
    against a locally-recomputed VALUES-literal oracle
    (__spark_entry__.oracle_sql), value-hash-exact."""
    media = synthesize_media(spark, n)
    meta = extract_metadata(media)
    feats = extract_f0_e6(media)
    return (
        meta.join(feats, "media_id")
        .select(
            "media_id",
            "kind",
            "width",
            "height",
            "duration_ms",
            "n_bytes",
            "checksum",
            "f0_e6",
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# RAW image payloads (MM02): header + an ACTUAL pixel buffer.  Raw
# RGB needs no codec, so the resize step below is a REAL numpy
# implementation — only compressed formats (JPEG/PNG/...) still need
# the PIL/ffmpeg swap-in, and they fail loudly, not silently.
# ---------------------------------------------------------------------------

RAW_MAGIC = b"MM02"
RAW_HEADER_LEN = len(RAW_MAGIC) + struct.calcsize("<III")

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def make_raw_image(media_id: int, channels: int = 3) -> bytes:
    """Deterministic raw image: MM02 magic + (w, h, c) header + a real
    w*h*c uint8 pixel buffer."""
    import numpy as np

    w = 16 + (media_id * 7) % 48
    h = 16 + (media_id * 11) % 48
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(channels), indexing="ij"
    )
    buf = ((media_id * 31 + yy * 7 + xx * 13 + cc * 97) % 256).astype(
        "uint8"
    )
    return RAW_MAGIC + struct.pack("<III", w, h, channels) + buf.tobytes()


def synthesize_raw_images(spark: SparkSession, n: int = 40) -> DataFrame:
    rows = [(i, "image", make_raw_image(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_raw(payload: bytes):
    """Decode an MM02 raw buffer OR an 8-bit PNG to (h, w, c) uint8.
    PNG decodes via the stdlib codec in operators/png.py (zlib inflate
    + integer defilter — deterministic, r7 verdict #5); remaining
    compressed formats (JPEG/video) raise — the PIL/ffmpeg swap-in
    point."""
    import numpy as np

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from retail_etl_pipeline_airflow_s3_athena_spark.operators.png import decode_png

        img = decode_png(payload)
        if img.dtype == np.uint16:
            # the RAW processing tier is 8-bit by contract (MM02);
            # fold 16-bit channels to their high byte — the standard
            # deterministic depth reduction (PIL's I;16 -> L behavior)
            img = (img >> 8).astype(np.uint8)
        return img
    if payload[:2] == b"\xff\xd8":
        from retail_etl_pipeline_airflow_s3_athena_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] != RAW_MAGIC:
        raise NotImplementedError(
            "compressed media decoding requires imaging libraries not "
            "present in this environment; only MM02 raw buffers, PNG, "
            "and baseline JPEG decode"
        )
    w, h, c = struct.unpack_from("<III", payload, 4)
    buf = np.frombuffer(payload, dtype="uint8", offset=RAW_HEADER_LEN)
    return buf.reshape(h, w, c)


def resize_media(
    media: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """REAL image resize (nearest-neighbor) over raw-buffer payloads,
    Arrow batch at a time.  The resampling index math is pure integer
    (``(i * src) // dst``), so outputs are bit-deterministic across
    engines, partitionings, and numpy versions; output rows carry the
    resized MM02 payload + checksum, ready for a feature extractor.

    Scale shape: a pure mapInPandas projection — no shuffle; memory is
    bounded by Arrow's maxRecordsPerBatch x payload size, independent
    of corpus size."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_raw(bytes(payload))
                h, w, c = img.shape
                iy = (np.arange(out_h) * h) // out_h
                ix = (np.arange(out_w) * w) // out_w
                resized = img[iy][:, ix]
                out = (
                    RAW_MAGIC
                    + struct.pack("<III", out_w, out_h, c)
                    + resized.tobytes()
                )
                rows.append(
                    (
                        int(mid),
                        out_w,
                        out_h,
                        int(c),
                        out,
                        hashlib.sha256(out).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# RAW audio (MM03: PCM s16le) and RAW video (MM04: concatenated raw
# frames).  Like MM02, raw buffers need no codec — feature extraction
# and frame sampling below are REAL signal/pixel computations; only
# compressed formats still require the codec swap-in.
# ---------------------------------------------------------------------------

AUDIO_MAGIC = b"MM03"
AUDIO_HEADER_LEN = len(AUDIO_MAGIC) + struct.calcsize("<IIB")
VIDEO_MAGIC = b"MM04"
VIDEO_HEADER_LEN = len(VIDEO_MAGIC) + struct.calcsize("<IIII")

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms_e6", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)

FRAME_LUMA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("mean_luma_e4", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def make_raw_audio(media_id: int, sample_rate: int = 16000) -> bytes:
    """Deterministic PCM s16le clip: MM03 magic + (rate, n, channels)
    header + a real int16 sample buffer (integer triangle-ish wave —
    no float synthesis, so the buffer is platform-exact)."""
    import numpy as np

    n = 1000 + (media_id * 53) % 3000
    i = np.arange(n, dtype=np.int64)
    period = 50 + (media_id % 37)
    tri = np.abs((i % period) * 2 - period)  # 0..period triangle
    amp = 500 + (media_id * 97) % 20000
    samples = ((tri * amp) // period - amp // 2).astype("<i2")
    return (
        AUDIO_MAGIC
        + struct.pack("<IIB", sample_rate, n, 1)
        + samples.tobytes()
    )


def synthesize_raw_audio(spark: SparkSession, n: int = 40) -> DataFrame:
    rows = [(i, "audio", make_raw_audio(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_raw_audio(payload: bytes):
    import numpy as np

    if payload[:4] != AUDIO_MAGIC:
        raise NotImplementedError(
            "compressed audio decoding requires audio libraries not "
            "present in this environment; only MM03 PCM buffers decode"
        )
    rate, n, _ch = struct.unpack_from("<IIB", payload, 4)
    x = np.frombuffer(payload, dtype="<i2", offset=AUDIO_HEADER_LEN)
    return rate, x.astype(np.int64)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio features over PCM buffers, all in exact integer
    arithmetic (bit-deterministic): fixed-point RMS
    (isqrt(sum(x^2)*1e12 / n)), zero-crossing count, absolute peak."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, x = _decode_raw_audio(bytes(payload))
                n = len(x)
                sq = int((x * x).sum())
                rms_e6 = math.isqrt(sq * 10**12 // max(n, 1))
                zc = int(((x[:-1] >= 0) != (x[1:] >= 0)).sum())
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        n,
                        rms_e6,
                        zc,
                        int(abs(x).max()) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


def make_raw_video(media_id: int, w: int = 8, h: int = 8, c: int = 3) -> bytes:
    """Deterministic raw clip: MM04 magic + (w, h, c, n_frames) header
    + n real frames of w*h*c uint8."""
    import numpy as np

    n_frames = 3 + (media_id * 5) % 10
    ff, yy, xx, cc = np.meshgrid(
        np.arange(n_frames),
        np.arange(h),
        np.arange(w),
        np.arange(c),
        indexing="ij",
    )
    buf = (
        (media_id * 19 + ff * 41 + yy * 7 + xx * 13 + cc * 97) % 256
    ).astype("uint8")
    return (
        VIDEO_MAGIC + struct.pack("<IIII", w, h, c, n_frames) + buf.tobytes()
    )


def synthesize_raw_video(spark: SparkSession, n: int = 25) -> DataFrame:
    rows = [(i, "video", make_raw_video(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def sample_raw_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL 1->N frame sampling over raw clips: every ``every_n``-th
    frame is materialized (inside the batch iterator — never the whole
    clip at once per output row), checksummed, and reduced to an exact
    integer mean luma (sum * 1e4 // n_px over the REC-601-ish integer
    weights 299/587/114)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != VIDEO_MAGIC:
                    raise NotImplementedError(
                        "compressed video decoding requires ffmpeg-like "
                        "libraries not present; only MM04 raw clips decode"
                    )
                w, h, c, nf = struct.unpack_from("<IIII", b, 4)
                frame_len = w * h * c
                for idx in range(0, nf, every_n):
                    off = VIDEO_HEADER_LEN + idx * frame_len
                    frame = np.frombuffer(
                        b, dtype="uint8", count=frame_len, offset=off
                    ).reshape(h, w, c).astype(np.int64)
                    if c >= 3:
                        luma_sum = int(
                            (
                                frame[:, :, 0] * 299
                                + frame[:, :, 1] * 587
                                + frame[:, :, 2] * 114
                            ).sum()
                        ) // 1000
                    else:
                        luma_sum = int(frame.sum())
                    mean_e4 = luma_sum * 10**4 // (w * h)
                    rows.append(
                        (
                            int(mid),
                            idx,
                            mean_e4,
                            hashlib.sha256(
                                frame.astype("uint8").tobytes()
                            ).hexdigest()[:12],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_LUMA_SCHEMA.fields]
            )

    return media.mapInPandas(batches, FRAME_LUMA_SCHEMA)
