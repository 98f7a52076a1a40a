"""BMP codec tests: round-trips across depth/row-order/padding legs,
loud-fail frontier, and the distributed feature extraction."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import bmp as bmp_ops


def test_truecolor_roundtrip_both_orders():
    img = (np.arange(5 * 7 * 3).reshape(5, 7, 3) % 256).astype(np.uint8)
    for top_down in (False, True):
        payload = bmp_ops.encode_bmp(img, top_down)
        assert np.array_equal(bmp_ops.decode_bmp(payload), img)


def test_palette_roundtrip_and_clr_used():
    pal = np.array([[1, 2, 3], [200, 100, 50], [0, 255, 0]], np.uint8)
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 1]], np.uint8)
    for top_down in (False, True):
        payload = bmp_ops.encode_bmp_palette(idx, pal, top_down)
        assert np.array_equal(bmp_ops.decode_bmp(payload), pal[idx])
    # biClrUsed must bound the palette read (3 quads, not 256)
    (pix_off,) = struct.unpack_from(
        "<I", bmp_ops.encode_bmp_palette(idx, pal), 10
    )
    assert pix_off == 14 + 40 + 3 * 4


def test_padding_exercised_across_widths():
    for w in range(1, 9):
        img = ((np.arange(3 * w * 3)).reshape(3, w, 3) % 256).astype(
            np.uint8
        )
        assert np.array_equal(
            bmp_ops.decode_bmp(bmp_ops.encode_bmp(img)), img
        )


def test_loud_fail_frontier():
    img = np.zeros((2, 2, 3), np.uint8)
    good = bytearray(bmp_ops.encode_bmp(img))
    with pytest.raises(NotImplementedError, match="not a BM"):
        bmp_ops.decode_bmp(b"PNG?" + bytes(good))
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        bmp_ops.decode_bmp(bytes(rle))
    deep = bytearray(good)
    struct.pack_into("<H", deep, 28, 32)  # 32 bpp
    with pytest.raises(NotImplementedError, match="bit depth"):
        bmp_ops.decode_bmp(bytes(deep))
    v5 = bytearray(good)
    struct.pack_into("<I", v5, 14, 124)  # BITMAPV5HEADER
    with pytest.raises(NotImplementedError, match="header size"):
        bmp_ops.decode_bmp(bytes(v5))


def test_distributed_features_match_local(spark):
    media = bmp_ops.synthesize_bmp_images(spark, n=12)
    got = {
        r["media_id"]: (
            r["height"], r["width"], r["channels"],
            r["mean_c0_e2"], r["edge_energy"], r["pixel_checksum"],
        )
        for r in bmp_ops.bmp_features(media).collect()
    }
    want = {
        mid: bmp_ops.bmp_stats(bmp_ops.make_bmp_image(mid))
        for mid in range(12)
    }
    assert got == want
