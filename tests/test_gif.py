"""GIF container + LZW codec (operators/gif.py)."""

from __future__ import annotations

import numpy as np
import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import gif as G


def test_lzw_roundtrip_all_code_sizes():
    rng = np.random.default_rng(11)
    for mcs, n in [(2, 300), (4, 4000), (8, 70000)]:
        data = rng.integers(0, 1 << mcs, n).astype(np.uint8).tobytes()
        assert G.lzw_decode(G.lzw_encode(data, mcs), mcs, n) == data


def test_lzw_table_reset_path():
    """70k bytes of 8-bit noise forces the 4096-entry table cap, so the
    mid-stream CLEAR/reset path runs on both sides."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 70000).astype(np.uint8).tobytes()
    enc = G.lzw_encode(data, 8)
    assert G.lzw_decode(enc, 8, len(data)) == data


def test_container_roundtrip_is_pixel_exact():
    """GIF is LOSSLESS for palettized content — unlike JPEG/ADPCM the
    roundtrip reproduces the exact index frames."""
    pal = np.arange(96, dtype=np.uint8).reshape(32, 3)
    yy, xx = np.meshgrid(np.arange(18), np.arange(26), indexing="ij")
    frames = [((f * 7 + yy * 3 + xx) % 32).astype(np.uint8) for f in range(4)]
    got_pal, got = G.parse_gif(G.write_gif(frames, pal))
    assert (got_pal[:32] == pal).all()
    assert len(got) == 4
    for a, b in zip(frames, got):
        assert (a == b).all()


def test_loud_fail_frontier():
    with pytest.raises(NotImplementedError):
        G.parse_gif(b"\x89PNG" + b"\x00" * 30)
    # transparency flag in the GCE
    p = bytearray(G.make_gif_clip(1))
    gce = bytes(p).index(b"\x21\xf9")
    p[gce + 3] |= 0x01
    with pytest.raises(NotImplementedError, match="transparency"):
        G.parse_gif(bytes(p))


def test_distributed_matches_local(spark):
    media = G.synthesize_gif_corpus(spark, n=10)
    got = {}
    for r in G.gif_frame_luma(media).collect():
        got.setdefault(r["media_id"], []).append(tuple(r)[1:])
    for mid in range(10):
        assert got[mid] == G.gif_frame_stats(G.make_gif_clip(mid))


def test_interlace_is_transport_blind():
    """r10: appendix-E interlace decodes to EXACTLY the progressive
    pixels — same frames, same stats — while the bytes differ (the
    four-pass row order really is on the wire)."""
    import numpy as np

    h, w = 13, 9  # odd sizes exercise ragged pass boundaries
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    frames = [((f * 5 + yy * 3 + xx) % 16).astype(np.uint8) for f in range(3)]
    pal = (np.arange(16 * 3).reshape(16, 3) % 256).astype(np.uint8)
    prog = G.write_gif(frames, pal)
    inter = G.write_gif(frames, pal, interlace=True)
    assert prog != inter
    _, got_p = G.parse_gif(prog)
    _, got_i = G.parse_gif(inter)
    for a, b, src in zip(got_p, got_i, frames):
        assert (a == src).all() and (b == src).all()
    # the fixture cycle really ships interlaced clips (flag 0x40)
    clip = G.make_gif_clip(1)  # 1 % 3 == 1 -> interlaced
    idx = clip.index(b"\x2c")
    assert clip[idx + 9] & 0x40
    G.gif_frame_stats(clip)  # decodes


def test_interlace_order_pinned():
    """Appendix E for h=10: rows 0,8 | 4 | 2,6 | 1,3,5,7,9."""
    assert G._interlace_order(10).tolist() == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
