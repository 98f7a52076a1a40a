"""Cross-format video near-duplicate detection (operators/videodup.py)."""

from __future__ import annotations

import numpy as np
import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import videodup as V


def test_area_mean_dhash_absorbs_jpeg_transcode():
    """Under area-mean pooling, enough frames of a JPEG-transcoded
    clip stay within the Hamming budget for the >= MIN_FRAMES vote —
    individual frames MAY exceed it (that is exactly why the decision
    is a vote, not a single-frame test)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import jpeg as J

    for seed in range(5):
        frames = V._smooth_frames(seed, 5, 33, 27)
        within = sum(
            1
            for f in frames
            if bin(
                V.frame_dhash(f)
                ^ V.frame_dhash(J.decode_jpeg(J.encode_jpeg(f)))
            ).count("1")
            <= V.MAX_HAMMING
        )
        assert within >= V.MIN_FRAMES, seed


def test_clip_hashes_route_all_three_containers():
    payloads = dict(V.planted_payloads(30))
    kinds = set()
    for i, p in payloads.items():
        hs = V.clip_frame_hashes(bytes(p))
        assert len(hs) == 5
        kinds.add(bytes(p)[:4])
    assert kinds == {b"MM04", b"RIFF", b"GIF8"}
    with pytest.raises(NotImplementedError):
        V.clip_frame_hashes(b"\x89PNG1234")


def test_planted_pairs_exact_no_false_positives(spark):
    """Distributed banding finds EXACTLY the 10 planted pairs (raw vs
    MJPEG transcode, GIF delay variants) and nothing else — matching
    the local all-pairs ground truth."""
    media = V.synthesize_video_corpus(spark, n=30)
    got = sorted(
        (r["id_a"], r["id_b"]) for r in V.video_near_dup(media).collect()
    )
    expect = sorted(
        (2 * s, 2 * s + 1) for s in range(15) if s % 3 != 2
    )
    assert got == expect


def test_gif_delay_variants_are_byte_different():
    payloads = dict(V.planted_payloads(30))
    # pair_seed 1 -> kind 1 -> GIF pair (2, 3)
    assert bytes(payloads[2]) != bytes(payloads[3])
    assert V.clip_frame_hashes(bytes(payloads[2])) == V.clip_frame_hashes(
        bytes(payloads[3])
    )
