"""Stdlib PNG codec: roundtrip across all five scanline filters,
hand-computed defilter vectors pinned to RFC 2083 §6 semantics,
loud-fail on unsupported/corrupt streams, and the distributed
png_features / resize-over-PNG paths.

Reference scope: none (the reference is text/CSV only) — extension
coverage for the multimodal tier (r7 verdict #5)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm
from retail_etl_pipeline_airflow_s3_athena_spark.operators import png


def _img(mid: int, c: int, h: int = 11, w: int = 13) -> np.ndarray:
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    return ((mid * 31 + yy * 7 + xx * 13 + cc * 97) % 256).astype(np.uint8)


def test_roundtrip_all_channel_counts_and_filters():
    for c in (1, 2, 3, 4):
        src = _img(5, c)
        for cycle in (True, False):
            back = png.decode_png(png.encode_png(src, filter_cycle=cycle))
            assert back.shape == src.shape
            assert np.array_equal(back, src)


def test_roundtrip_each_filter_in_isolation():
    # one-filter-per-image: h=6 with cycle puts every filter on some
    # row, but pin each type alone too via a single-row-pair image
    for ft in range(5):
        h = 2
        src = _img(ft + 1, 3, h=h, w=7)
        # craft a stream with the given filter on every row by
        # encoding filter-0 then re-filtering manually
        flat = src.astype(np.int64)
        stride = 7 * 3
        bpp = 3
        out = bytearray()
        for y in range(h):
            row = flat[y].reshape(-1)
            prev = flat[y - 1].reshape(-1) if y else np.zeros(
                stride, dtype=np.int64
            )
            left = np.concatenate(
                [np.zeros(bpp, dtype=np.int64), row[:-bpp]]
            )
            upleft = np.concatenate(
                [np.zeros(bpp, dtype=np.int64), prev[:-bpp]]
            )
            if ft == 0:
                filt = row
            elif ft == 1:
                filt = row - left
            elif ft == 2:
                filt = row - prev
            elif ft == 3:
                filt = row - (left + prev) // 2
            else:
                pred = np.array(
                    [
                        png._paeth(int(a), int(b), int(cc))
                        for a, b, cc in zip(left, prev, upleft)
                    ],
                    dtype=np.int64,
                )
                filt = row - pred
            out.append(ft)
            out.extend((filt % 256).astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", 7, h, 8, 2, 0, 0, 0)
        payload = (
            png.PNG_MAGIC
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(bytes(out)))
            + png._chunk(b"IEND", b"")
        )
        assert np.array_equal(png.decode_png(payload), src), f"filter {ft}"


def test_paeth_predictor_spec_vectors():
    # RFC 2083 §6.6: ties break a, then b
    assert png._paeth(0, 0, 0) == 0
    assert png._paeth(10, 20, 15) == 15  # p=15: pa=5 pb=5 pc=0 -> c
    assert png._paeth(10, 20, 5) == 20  # p=25: pa=15 pb=5 pc=20 -> b
    assert png._paeth(10, 10, 0) == 10  # pa=pb=10 pc=20: tie -> a
    assert png._paeth(100, 50, 200) == 50  # p=-50 clamps toward b
    assert png._paeth(3, 200, 150) == 3


def test_loud_fail_on_unsupported_and_corrupt():
    src = _img(2, 3)
    good = png.encode_png(src)
    with pytest.raises(ValueError):
        png.decode_png(b"JFIF" + good[4:])
    with pytest.raises(ValueError):
        png.decode_png(good[:40])  # truncated chunk
    # sub-byte RGB: depth 4 + color type 2 is ILLEGAL PNG (sub-byte
    # is legal only for grayscale and palette) — corrupt header, not
    # an unimplemented feature (r10 widened gray/palette sub-byte
    # into the envelope; r11 widened tRNS — png.py has no
    # NotImplementedError left)
    deep = bytearray(good)
    deep[16 + 8] = 4
    with pytest.raises(ValueError):
        png.decode_png(bytes(deep))
    # sub-byte palette is IN-envelope now — relabeling this 8-bit RGB
    # stream as 4-bit palette must fail as CORRUPT (stream-length
    # mismatch), not as unimplemented
    pal = bytearray(good)
    pal[16 + 8] = 4
    pal[16 + 9] = 3
    with pytest.raises(ValueError):
        png.decode_png(bytes(pal))
    # tRNS is IN-envelope now (r11) — but a malformed chunk length is
    # corrupt (RGB needs a 6-byte sample triple), and tRNS on an
    # alpha-bearing color type is illegal per §4.2.1
    trns = good[:33] + png._chunk(b"tRNS", b"\x00") + good[33:]
    with pytest.raises(ValueError):
        png.decode_png(trns)
    rgba = png.encode_png(np.zeros((2, 3, 4), dtype=np.uint8))
    bad_rgba = (
        rgba[:33] + png._chunk(b"tRNS", b"\x00\x01") + rgba[33:]
    )
    with pytest.raises(ValueError):
        png.decode_png(bad_rgba)
    # palette stream without its PLTE chunk
    src_idx = (_img(3, 1)[:, :, 0] % 64).astype(np.uint8)
    palette = (np.arange(64 * 3).reshape(64, 3) % 256).astype(np.uint8)
    pal_png = png.encode_png_palette(src_idx, palette)
    plte_start = pal_png.index(b"PLTE") - 4
    (plte_len,) = struct.unpack_from(">I", pal_png, plte_start)
    stripped = (
        pal_png[:plte_start] + pal_png[plte_start + 12 + plte_len :]
    )
    with pytest.raises(ValueError):
        png.decode_png(stripped)


def test_roundtrip_palette():
    for mid in (1, 4):
        h, w = 9 + mid, 14 - mid
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        idx = ((mid * 5 + yy * 3 + xx * 11) % 64).astype(np.uint8)
        palette = (
            (np.arange(64)[:, None] * np.array([3, 7, 11]) + mid) % 256
        ).astype(np.uint8)
        for cycle in (True, False):
            back = png.decode_png(
                png.encode_png_palette(idx, palette, filter_cycle=cycle)
            )
            assert back.shape == (h, w, 3)
            assert back.dtype == np.uint8
            assert np.array_equal(back, palette[idx])


def test_roundtrip_16bit_all_channel_counts():
    for c in (1, 2, 3, 4):
        h, w = 10, 13
        yy, xx, cc = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(c), indexing="ij"
        )
        src = ((yy * 65521 + xx * 257 + cc * 4099) % 65536).astype(
            np.uint16
        )
        for cycle in (True, False):
            back = png.decode_png(png.encode_png(src, filter_cycle=cycle))
            assert back.dtype == np.uint16
            assert back.shape == src.shape
            assert np.array_equal(back, src)


def test_png_features_distributed_matches_local(spark):
    media = png.synthesize_png_images(spark, n=12)
    rows = {
        r["media_id"]: r
        for r in png.png_features(media).collect()
    }
    assert len(rows) == 12
    for mid in range(12):
        h, w, c, mean_e2, edge, ck = png.png_stats(png.make_png_image(mid))
        r = rows[mid]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["mean_c0_e2"] == mean_e2
        assert r["edge_energy"] == edge
        assert r["pixel_checksum"] == ck


def test_resize_media_accepts_png_payloads(spark):
    # the MM02 resize path decodes PNG transparently now; a resized
    # PNG-sourced image equals the resize of the locally-decoded pixels
    media = png.synthesize_png_images(spark, n=6)
    out = {
        r["media_id"]: r
        for r in mm.resize_media(media, 8, 8).collect()
    }
    assert len(out) == 6
    for mid in range(6):
        # _decode_raw (not decode_png): the RAW tier folds 16-bit PNGs
        # to their high byte, and the fixture cycle includes one
        img = mm._decode_raw(png.make_png_image(mid))
        h, w, c = img.shape
        iy = (np.arange(8) * h) // 8
        ix = (np.arange(8) * w) // 8
        resized = img[iy][:, ix]
        expect = (
            mm.RAW_MAGIC + struct.pack("<III", 8, 8, c) + resized.tobytes()
        )
        import hashlib

        assert out[mid]["checksum"] == hashlib.sha256(expect).hexdigest()[:16]
        assert out[mid]["channels"] == c


def test_roundtrip_sub_byte_palette_and_adam7():
    """r9 verdict #4: 1/2/4-bit palette index unpacking and Adam7
    interlace, exact for every size including images smaller than one
    pass tile (empty passes contribute zero bytes)."""
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 2), (7, 9), (8, 8), (16, 19)]:
        for depth in (1, 2, 4, 8):
            idx = rng.integers(0, 1 << depth, size=(h, w)).astype(np.uint8)
            pal = rng.integers(0, 256, size=(1 << depth, 3)).astype(np.uint8)
            for inter in (False, True):
                payload = png.encode_png_palette(
                    idx, pal, depth=depth, interlace=inter
                )
                assert np.array_equal(png.decode_png(payload), pal[idx])
        src = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(
            png.decode_png(png.encode_png(src, interlace=True)), src
        )
        src16 = rng.integers(0, 65536, size=(h, w, 1)).astype(np.uint16)
        assert np.array_equal(
            png.decode_png(png.encode_png(src16, interlace=True)), src16
        )


def test_sub_byte_bit_packing_pinned():
    """Pin the §7.2 packing order: leftmost pixel in the HIGH bits.
    1-bit row [1,0,1,1,0,1,0,0,1] packs to 0b10110100, 0b10000000."""
    rows = np.array([[1, 0, 1, 1, 0, 1, 0, 0, 1]])
    packed = png._pack_sub_byte(rows, 1)
    assert packed.tolist() == [[0b10110100, 0b10000000]]
    back = png._unpack_sub_byte(packed, 9, 1)
    assert back.tolist() == rows.tolist()
    # 2-bit: [3,0,2,1,1] -> 0b11001001, 0b01000000
    rows2 = np.array([[3, 0, 2, 1, 1]])
    packed2 = png._pack_sub_byte(rows2, 2)
    assert packed2.tolist() == [[0b11001001, 0b01000000]]
    assert png._unpack_sub_byte(packed2, 5, 2).tolist() == rows2.tolist()


def test_fixture_cycle_covers_new_variants():
    """All fourteen fixture variants decode and the new ones really
    carry the advertised IHDR (depth/interlace bytes checked raw) and
    tRNS chunks."""
    seen = set()
    trns_seen = set()
    for mid in range(28):
        payload = png.make_png_image(mid)
        depth, ctype, _c, _f, inter = struct.unpack_from(
            ">BBBBB", payload, 16 + 8
        )
        seen.add((depth, ctype, inter))
        if b"tRNS" in payload:
            trns_seen.add((depth, ctype, inter))
        png.png_stats(payload)  # must decode
    assert (4, 3, 0) in seen  # 4-bit palette
    assert (1, 3, 0) in seen  # 1-bit palette
    assert (8, 2, 1) in seen  # interlaced RGB
    assert (2, 3, 1) in seen  # interlaced 2-bit palette
    # r11 tRNS variants: palette alpha table, gray-8/gray-16 key,
    # interlaced-RGB key
    assert (8, 3, 0) in trns_seen
    assert (8, 0, 0) in trns_seen
    assert (8, 2, 1) in trns_seen
    assert (16, 0, 0) in trns_seen


def test_roundtrip_trns_transparency():
    """r11: tRNS — palette alpha table (partial, tail defaults
    opaque), gray/RGB key matching at 8/16-bit and sub-byte depths,
    composing with Adam7."""
    rng = np.random.default_rng(11)
    # palette alpha table, shorter than the palette
    idx = rng.integers(0, 6, size=(9, 7)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(6, 3)).astype(np.uint8)
    alpha = np.array([0, 40, 255], dtype=np.uint8)
    for inter in (False, True):
        img = png.decode_png(
            png.encode_png_palette(
                idx, pal, trns_alpha=alpha, interlace=inter
            )
        )
        assert img.shape == (9, 7, 4)
        full = np.concatenate([alpha, [255, 255, 255]])
        assert (img[:, :, 3] == full[idx]).all()
        assert (img[:, :, :3] == pal[idx]).all()
    # gray-8 key
    g = rng.integers(0, 4, size=(5, 6)).astype(np.uint8)
    img = png.decode_png(png.encode_png(g, trns_key=2))
    assert (img[:, :, 1] == np.where(g == 2, 0, 255)).all()
    assert (img[:, :, 0] == g).all()
    # RGB key hits only exact triple matches
    rgb = rng.integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    key = tuple(int(v) for v in rgb[2, 2])
    img = png.decode_png(png.encode_png(rgb, interlace=True, trns_key=key))
    want = np.where(
        (rgb.astype(int) == np.array(key)).all(axis=2), 0, 255
    )
    assert (img[:, :, 3] == want).all()
    # 16-bit key -> uint16 alpha plane
    g16 = rng.integers(0, 65536, size=(3, 5)).astype(np.uint16)
    img = png.decode_png(png.encode_png(g16, trns_key=int(g16[1, 1])))
    assert img.dtype == np.uint16
    assert (
        img[:, :, 1] == np.where(g16 == g16[1, 1], 0, 65535)
    ).all()
    # sub-byte gray key compares in LEVEL space, scales the gray plane
    lv = rng.integers(0, 4, size=(6, 5)).astype(np.uint8)
    img = png.decode_png(png.encode_png(lv, gray_depth=2, trns_key=3))
    assert (img[:, :, 0] == lv * 85).all()
    assert (img[:, :, 1] == np.where(lv == 3, 0, 255)).all()


def test_roundtrip_sub_byte_grayscale():
    """r10: 1/2/4-bit grayscale — exact x255/x85/x17 sample scaling,
    progressive and Adam7, odd sizes."""
    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (5, 7), (8, 8), (11, 30)]:
        for depth in (1, 2, 4):
            levels = rng.integers(0, 1 << depth, size=(h, w)).astype(
                np.uint8
            )
            want = (levels * (255 // ((1 << depth) - 1)))[:, :, None]
            for inter in (False, True):
                got = png.decode_png(
                    png.encode_png(
                        levels, gray_depth=depth, interlace=inter
                    )
                )
                assert got.dtype == np.uint8
                assert np.array_equal(got, want)
