"""Multimodal binary-column plumbing (mapInPandas, stubbed decode)."""

from __future__ import annotations

import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthesize_media(spark, n=30)


def test_metadata_extraction(media):
    meta = mm.extract_metadata(media).collect()
    assert len(meta) == 30
    by_id = {r["media_id"]: r for r in meta}
    assert by_id[0]["kind"] == "image"
    assert by_id[0]["width"] >= 64 and by_id[0]["height"] >= 64
    assert by_id[0]["duration_ms"] == 0  # images have no duration
    assert by_id[2]["kind"] == "video" and by_id[2]["duration_ms"] > 0
    # checksums deterministic across runs
    again = {r["media_id"]: r["checksum"] for r in mm.extract_metadata(media).collect()}
    assert all(by_id[i]["checksum"] == again[i] for i in by_id)


def test_feature_vectors_fixed_width(media):
    feats = mm.extract_features(media).collect()
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in feats)
    # histogram features are normalized
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in feats)


def test_frame_sampling_video_only(media):
    frames = mm.sample_frames(media).collect()
    kinds = {r["media_id"] % 3 for r in frames}
    assert kinds == {2}  # only video rows emit frames
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per_media.values():
        assert idxs == sorted(idxs)


def test_decode_stub_rejects_real_payloads(spark):
    fake = spark.createDataFrame(
        [(99, "image", b"\x89PNG fake bytes")], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|MM01|decoding"):
        mm.extract_metadata(fake).collect()


def test_media_pipeline_end_to_end(spark):
    out = mm.media_pipeline(spark, n=30).collect()
    assert len(out) == 30
    assert all(r["n_bytes"] > 0 for r in out)


# Hard-coded golden outputs for media_ids 0/1/2 (one per kind): any
# regression in the payload format, header parsing, hashing, histogram
# or frame-sampling arithmetic shows up as a literal mismatch here.
_GOLD_META = {
    0: ("image", 64, 64, 0, 145, "6b7d035c99fcfef0"),
    1: ("audio", 81, 93, 37, 158, "297a090b481bcd89"),
    2: ("video", 98, 122, 74, 171, "8ca5713341b186b7"),
}
_GOLD_FEAT = {
    0: [0.0625] * 16,
    1: [0.06383] * 8 + [0.056738] * 3 + [0.06383] * 5,
    2: [0.058442] * 5 + [0.064935] * 10 + [0.058442],
}
_GOLD_FRAMES = [(2, 0, 0, "e82831e6df32")]  # video 2: 74 ms -> 1 frame


def test_metadata_golden(spark):
    media = mm.synthesize_media(spark, n=3)
    got = {
        r["media_id"]: (
            r["kind"], r["width"], r["height"], r["duration_ms"],
            r["n_bytes"], r["checksum"],
        )
        for r in mm.extract_metadata(media).collect()
    }
    assert got == _GOLD_META


def test_features_golden(spark):
    media = mm.synthesize_media(spark, n=3)
    got = {
        r["media_id"]: r["feature"]
        for r in mm.extract_features(media).collect()
    }
    assert set(got) == set(_GOLD_FEAT)
    for mid, want in _GOLD_FEAT.items():
        # feature is array<float>; compare at float32 precision
        assert got[mid] == pytest.approx(want, abs=1e-6)


def test_frames_golden(spark):
    media = mm.synthesize_media(spark, n=3)
    got = [
        (r["media_id"], r["frame_idx"], r["frame_ms"], r["frame_checksum"])
        for r in mm.sample_frames(media).collect()
    ]
    assert got == _GOLD_FRAMES


def test_resize_media_real_pixels(spark):
    """MM02 raw buffers resize for REAL (numpy nearest-neighbor): dims,
    pixel mapping, and determinism all verifiable without codecs."""
    import numpy as np

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm

    media = mm.synthesize_raw_images(spark, n=12)
    out = {r["media_id"]: r for r in mm.resize_media(media, 8, 8).collect()}
    assert len(out) == 12
    for mid, r in out.items():
        assert (r["width"], r["height"]) == (8, 8)
        src = mm._decode_raw(mm.make_raw_image(mid))
        got = mm._decode_raw(bytes(r["payload"]))
        h, w, _ = src.shape
        iy = (np.arange(8) * h) // 8
        ix = (np.arange(8) * w) // 8
        assert (got == src[iy][:, ix]).all()
    # determinism: a second run yields identical checksums
    again = {
        r["media_id"]: r["checksum"]
        for r in mm.resize_media(media, 8, 8).collect()
    }
    assert again == {m: r["checksum"] for m, r in out.items()}


def test_resize_media_compressed_fails_loudly(spark):
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm

    media = mm.synthesize_media(spark, n=3)  # MM01 = "compressed" stub
    import pytest as _pytest

    with _pytest.raises(Exception, match="imaging libraries|NotImplemented"):
        mm.resize_media(media).collect()


def test_audio_features_integer_exact(spark):
    """MM03 PCM features are pure integer math; verify against a local
    recompute and determinism across partitionings."""
    import math

    import numpy as np

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm

    media = mm.synthesize_raw_audio(spark, n=10)
    got = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    for mid in range(10):
        _, x = mm._decode_raw_audio(mm.make_raw_audio(mid))
        n = len(x)
        r = got[mid]
        assert r["n_samples"] == n
        assert r["rms_e6"] == math.isqrt(int((x * x).sum()) * 10**12 // n)
        assert r["zero_crossings"] == int(((x[:-1] >= 0) != (x[1:] >= 0)).sum())
        assert r["peak"] == int(np.abs(x).max())
    again = {
        r["media_id"]: tuple(r)
        for r in mm.audio_features(media.repartition(7)).collect()
    }
    assert again == {m: tuple(r) for m, r in got.items()}


def test_sample_raw_frames_real_pixels(spark):
    import hashlib as _hashlib

    import numpy as np

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm

    media = mm.synthesize_raw_video(spark, n=6)
    got = {}
    for r in mm.sample_raw_frames(media, every_n=2).collect():
        got[(r["media_id"], r["frame_idx"])] = (
            r["mean_luma_e4"], r["frame_checksum"]
        )
    for mid in range(6):
        b = mm.make_raw_video(mid)
        import struct as _struct

        w, h, c, nf = _struct.unpack_from("<IIII", b, 4)
        for idx in range(0, nf, 2):
            off = mm.VIDEO_HEADER_LEN + idx * w * h * c
            frame = np.frombuffer(
                b, dtype="uint8", count=w * h * c, offset=off
            ).reshape(h, w, c).astype(np.int64)
            luma_sum = int(
                (frame[:, :, 0] * 299 + frame[:, :, 1] * 587
                 + frame[:, :, 2] * 114).sum()
            ) // 1000
            want = (
                luma_sum * 10**4 // (w * h),
                _hashlib.sha256(
                    frame.astype("uint8").tobytes()
                ).hexdigest()[:12],
            )
            assert got[(mid, idx)] == want
    # every sampled index present, nothing extra
    expected_keys = set()
    for mid in range(6):
        nf = 3 + (mid * 5) % 10
        expected_keys |= {(mid, i) for i in range(0, nf, 2)}
    assert set(got) == expected_keys
