"""Video near-duplicate detection — clip-level perceptual dedup
across container formats, composing the codec tier (raw MM04,
AVI/MJPEG, animated GIF) with the banded-dedup machinery
(operators/imagehash.py).

The training-data reality: the same clip arrives as a raw buffer from
one source, an MJPEG transcode from another, and a GIF from a third
— byte checksums see three files, a dedup pipeline must see one.
Approach:

1. ``video_frame_hashes``: decode every frame of every clip (one
   Arrow ``mapInPandas`` pass, routed by magic like
   operators/router.py) and reduce each frame to the 60-bit dHash of
   operators/imagehash.py — brightness-shift invariant, robust to
   JPEG re-encode (the image_near_dup evidence).
2. Candidate pairs: the pigeonhole band join, EXTENDED with the frame
   index in the key — two clips collide only where the SAME frame
   position lands in the same (band, bits) bucket, so bucket
   occupancy stays O(n_clips/2^15) per position and the join never
   goes all-pairs.
3. Verify + vote: per candidate (a, b, frame_idx) check full Hamming
   ≤ max_hamming, then a clip pair is a near-dup when ≥ ``min_frames``
   positions match — a vote that makes the decision robust to a few
   codec-damaged frames.

Determinism: decode is the integer codec tier; dHash is integer; the
banding/bit_count verify is pure relational — the signature table is
hash-exact, so the oracle is the imagehash HYBRID shape (frame hashes
as a locally-recomputed VALUES literal, pairing semantics as REAL SQL
over them).

Scale: one decode pass (the only Python), then equi-joins keyed by
(frame_idx, band, bits).  Shuffle volume = n_frames × n_bands rows of
3 integers.  At 100 TB of video the frame hash table is ~1e4× smaller
than the corpus, and the pair space is bounded by bucket collisions,
not n².
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators import avi as avi_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import gif as gif_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import jpeg as jpeg_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators.imagehash import (
    DHASH_BITS,
)

MAX_HAMMING = 3
MIN_FRAMES = 3

FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def frame_dhash(img: np.ndarray) -> int:
    """dHash of one decoded frame with AREA-MEAN pooling (exact
    integer box means via an integral image) instead of imagehash's
    nearest-neighbor sampling: averaging the box absorbs codec noise
    (a transcoded JPEG frame perturbs single pixels by ±8 but box
    means by ~±2), which is what lets a lossy raw↔MJPEG pair stay
    within the Hamming budget.  Same 11×6 grid, same BT.601 integer
    luma, same bit layout as imagehash.dhash_of_image."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.imagehash import (
        GRID_H,
        GRID_W,
    )

    img = img.astype(np.int64)
    h, w, c = img.shape
    if c >= 3:
        luma = (299 * img[:, :, 0] + 587 * img[:, :, 1]
                + 114 * img[:, :, 2]) // 1000
    else:
        luma = img[:, :, 0]
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = np.cumsum(np.cumsum(luma, axis=0), axis=1)
    yb = (np.arange(GRID_H + 1) * h) // GRID_H
    xb = (np.arange(GRID_W + 1) * w) // GRID_W
    sig = 0
    means = np.zeros((GRID_H, GRID_W), dtype=np.int64)
    for y in range(GRID_H):
        for x in range(GRID_W):
            s = (
                ii[yb[y + 1], xb[x + 1]] - ii[yb[y], xb[x + 1]]
                - ii[yb[y + 1], xb[x]] + ii[yb[y], xb[x]]
            )
            area = (yb[y + 1] - yb[y]) * (xb[x + 1] - xb[x])
            means[y, x] = s // area
    for y in range(GRID_H):
        for x in range(GRID_W - 1):
            if means[y, x + 1] > means[y, x]:
                sig |= 1 << (y * (GRID_W - 1) + x)
    return sig


def clip_frame_hashes(payload: bytes) -> list[int]:
    """Decode ALL frames of one clip (raw MM04 / AVI-MJPEG / GIF) and
    dHash each — shared by the operator and the VALUES oracle."""
    import struct as _struct

    if payload[:4] == b"MM04":
        w, h, c, nf = _struct.unpack_from("<IIII", payload, 4)
        frame_len = w * h * c
        out = []
        for idx in range(nf):
            off = mm_ops.VIDEO_HEADER_LEN + idx * frame_len
            frame = np.frombuffer(
                payload, dtype="uint8", count=frame_len, offset=off
            ).reshape(h, w, c)
            out.append(frame_dhash(frame))
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        _w, _h, frames = avi_ops.parse_avi_mjpeg(payload)
        return [frame_dhash(jpeg_ops.decode_jpeg(f)) for f in frames]
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # composited canvases (r11): identical hashes on full-canvas
        # clips; partial/transparent animations hash what a viewer sees
        return [
            frame_dhash(f) for f in gif_ops.decode_gif_animation(payload)
        ]
    raise NotImplementedError(
        "video near-dup supports raw MM04, AVI/MJPEG, and GIF clips"
    )


def video_frame_hashes(media: DataFrame) -> DataFrame:
    """(media_id, frame_idx, dhash): one decode pass, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, sig in enumerate(clip_frame_hashes(bytes(payload))):
                    rows.append((int(mid), idx, sig))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_HASH_SCHEMA.fields]
            )

    return media.mapInPandas(batches, FRAME_HASH_SCHEMA)


def _band_cols(n_bands: int) -> list:
    base, rem = divmod(DHASH_BITS, n_bands)
    widths = [base + (1 if b < rem else 0) for b in range(n_bands)]
    offsets = [sum(widths[:b]) for b in range(n_bands)]
    return [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            F.shiftright("dhash", offsets[b])
            .bitwiseAND(F.lit((1 << widths[b]) - 1))
            .alias("bits"),
        )
        for b in range(n_bands)
    ]


def video_near_dup(
    media: DataFrame,
    max_hamming: int = MAX_HAMMING,
    min_frames: int = MIN_FRAMES,
) -> DataFrame:
    """(id_a, id_b, n_matching_frames): clip pairs where at least
    ``min_frames`` frame positions match within dHash Hamming
    ``max_hamming`` — candidates from the frame-position-keyed
    pigeonhole band join, exact bit_count verify, then the per-pair
    vote."""
    sig = video_frame_hashes(media)
    bands = sig.select(
        "media_id",
        "frame_idx",
        "dhash",
        F.explode(F.array(*_band_cols(max_hamming + 1))).alias("b"),
    ).select(
        "media_id", "frame_idx", "dhash",
        F.col("b.band").alias("band"), F.col("b.bits").alias("bits"),
    )
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bits") == F.col("r.bits"))
            & (F.col("l.frame_idx") == F.col("r.frame_idx"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("id_a"),
            F.col("r.media_id").alias("id_b"),
            F.col("l.frame_idx").alias("frame_idx"),
            F.col("l.dhash").alias("ha"),
            F.col("r.dhash").alias("hb"),
        )
        .distinct()
    )
    matched = cand.filter(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching_frames"))
        .filter(F.col("n_matching_frames") >= min_frames)
    )


# ---------------------------------------------------------------------------
# Fixture: cross-format planted duplicates
# ---------------------------------------------------------------------------

def _smooth_frames(seed: int, n_frames: int, w: int, h: int) -> list[np.ndarray]:
    """Smooth but HIGH-CONTRAST, seed-diverse gradients: the slope
    pair (a, b) varies with the seed so different seeds produce
    different dHash comparison patterns (not just phase shifts), and
    adjacent dHash grid cells differ by ~20+ luma so JPEG transcode
    noise (±3) can't flip comparisons except at fold points."""
    # Bilinear upsample of a seed-keyed pseudo-random 7x7 coarse grid:
    # smooth (JPEG-friendly), HIGH-ENTROPY (different seeds produce
    # genuinely different dHash patterns — plain gradients made every
    # negative pair collide), channel-equal RGB (chroma is where JPEG
    # spends its loss; dHash measures luma structure anyway).
    cg = 7
    out = []
    for f in range(n_frames):
        coarse = np.array(
            [
                [
                    (seed * 2654435761 + f * 97 + cy * 131 + cx * 197
                     + ((seed + cy * 7 + cx * 13 + f) ** 2) * 31) % 181
                    for cx in range(cg)
                ]
                for cy in range(cg)
            ],
            dtype=np.int64,
        ) + 30
        ys = (np.arange(h) * (cg - 1) * 256) // max(h - 1, 1)
        xs = (np.arange(w) * (cg - 1) * 256) // max(w - 1, 1)
        y0, fy = ys // 256, ys % 256
        x0, fx = xs // 256, xs % 256
        y0 = np.clip(y0, 0, cg - 2)
        x0 = np.clip(x0, 0, cg - 2)
        c00 = coarse[np.ix_(y0, x0)]
        c01 = coarse[np.ix_(y0, x0 + 1)]
        c10 = coarse[np.ix_(y0 + 1, x0)]
        c11 = coarse[np.ix_(y0 + 1, x0 + 1)]
        fyc = fy[:, None]
        fxc = fx[None, :]
        g = (
            c00 * (256 - fyc) * (256 - fxc)
            + c01 * (256 - fyc) * fxc
            + c10 * fyc * (256 - fxc)
            + c11 * fyc * fxc
        ) >> 16
        g = g.astype(np.uint8)
        out.append(np.stack([g, g, g], axis=-1))
    return out


def _raw_clip(frames: list[np.ndarray]) -> bytes:
    import struct as _struct

    h, w, c = frames[0].shape
    return (
        mm_ops.VIDEO_MAGIC
        + _struct.pack("<IIII", w, h, c, len(frames))
        + b"".join(f.tobytes() for f in frames)
    )


def _gif_clip(frames: list[np.ndarray], delay_cs: int) -> bytes:
    """Palettize smooth RGB frames through a shared 32-level gray ramp
    (content value -> index by the inverse map), so GIF decode
    reproduces luma to within one ramp step."""
    pal = np.stack([np.arange(32) * 8 + 4] * 3, axis=1).astype(np.uint8)
    idx_frames = [
        np.clip(
            (299 * f[:, :, 0].astype(np.int64)
             + 587 * f[:, :, 1].astype(np.int64)
             + 114 * f[:, :, 2].astype(np.int64)) // 1000 // 8,
            0, 31,
        ).astype(np.uint8)
        for f in frames
    ]
    return gif_ops.write_gif(idx_frames, pal, delay_cs=delay_cs)


def planted_payloads(n: int = 30) -> list[tuple[int, bytes]]:
    """n clips, 5 frames each: even/odd ids form PLANTED pairs sharing
    content — cross-format raw↔MJPEG (lossy transcode) and GIF↔GIF
    with different frame delays (byte-different, pixel-identical);
    every third pair is unique content (negatives).  Shared by the
    fixture and the VALUES oracle."""
    rows = []
    for i in range(n):
        pair_seed = i // 2
        planted = pair_seed % 3 != 2  # 2 of every 3 pairs are dups
        seed = pair_seed if planted else 1000 + i
        frames = _smooth_frames(seed, 5, 33, 27)
        kind = pair_seed % 3
        if not planted:
            payload = _raw_clip(frames)
        elif kind == 0:  # raw <-> MJPEG transcode
            payload = (
                _raw_clip(frames)
                if i % 2 == 0
                else avi_ops.write_avi_mjpeg(
                    [jpeg_ops.encode_jpeg(f) for f in frames], 33, 27
                )
            )
        else:  # GIF delay variants (metadata differs, pixels identical)
            payload = _gif_clip(frames, delay_cs=10 + (i % 2) * 5)
        rows.append((i, payload))
    return rows


def synthesize_video_corpus(spark: SparkSession, n: int = 30) -> DataFrame:
    return spark.createDataFrame(
        [(i, "video", bytearray(p)) for i, p in planted_payloads(n)],
        mm_ops.MEDIA_SCHEMA,
    )


def oracle_video_near_dup_values(
    n: int = 30,
    max_hamming: int = MAX_HAMMING,
    min_frames: int = MIN_FRAMES,
) -> str:
    """Hybrid oracle (the image_near_dup shape): locally-recomputed
    frame-hash VALUES + the pairing semantics as REAL SQL — same-index
    frames within Hamming ``max_hamming``, pair kept at >=
    ``min_frames`` matches.  The band join is Spark's physical
    strategy; the semantics are this query."""
    rows = []
    for i, payload in planted_payloads(n):
        for idx, sig in enumerate(clip_frame_hashes(bytes(payload))):
            rows.append(f"({i}, {idx}, {sig})")
    return f"""
        WITH fh(media_id, frame_idx, dhash) AS (VALUES {", ".join(rows)})
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_matching_frames
        FROM fh a JOIN fh b
          ON a.frame_idx = b.frame_idx AND a.media_id < b.media_id
        WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_frames}
        ORDER BY id_a, id_b
    """
