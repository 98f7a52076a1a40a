"""AVI container + MJPEG video decode (operators/avi.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import avi as A
from retail_etl_pipeline_airflow_s3_athena_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _frames(n=4, w=24, h=16):
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    out = []
    for f in range(n):
        img = ((np.abs(((f * 31 + yy * 2 + xx * 3 + cc * 40) % 400) - 200))
               + 25).astype(np.uint8)
        out.append(encode_jpeg(img))
    return out


def test_container_roundtrip_preserves_frame_bytes():
    frames = _frames()
    w, h, got = A.parse_avi_mjpeg(A.write_avi_mjpeg(frames, 24, 16))
    assert (w, h) == (24, 16)
    assert got == frames


def test_sampled_frames_decode_like_direct_jpeg():
    """Every sampled row equals a direct decode_jpeg of that frame's
    chunk — the container adds framing, never alters pixels."""
    frames = _frames(n=6)
    payload = A.write_avi_mjpeg(frames, 24, 16)
    rows = A.mjpeg_frame_stats(payload, every_n=2)
    assert [r[0] for r in rows] == [0, 2, 4]
    img0 = decode_jpeg(frames[0]).astype(np.int64)
    luma = int(
        (img0[:, :, 0] * 299 + img0[:, :, 1] * 587 + img0[:, :, 2] * 114)
        .sum()
    ) // 1000
    assert rows[0][3] == luma * 10**4 // (24 * 16)


def test_loud_fail_on_inter_coded_handlers():
    """An AVI whose vids stream is H.264 must fail loudly, not decode
    garbage — the honest codec frontier."""
    frames = _frames(n=2)
    payload = bytearray(A.write_avi_mjpeg(frames, 24, 16))
    i = payload.find(b"vids")
    assert i > 0 and payload[i + 4:i + 8] == b"MJPG"
    payload[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        A.parse_avi_mjpeg(bytes(payload))
    with pytest.raises(NotImplementedError):
        A.parse_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_distributed_matches_local(spark):
    media = A.synthesize_mjpeg_corpus(spark, n=10)
    got = {}
    for r in A.mjpeg_frame_luma(media).collect():
        got.setdefault(r["media_id"], []).append(tuple(r)[1:])
    for mid in range(10):
        assert got[mid] == A.mjpeg_frame_stats(A.make_avi_mjpeg_clip(mid))
