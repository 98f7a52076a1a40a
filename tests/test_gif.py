"""GIF container + LZW codec (operators/gif.py)."""

from __future__ import annotations

import struct

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


def test_composited_decoder_matches_fast_path_on_legacy_envelope():
    """decode_gif_animation is pixel-identical to parse_gif +
    decode_gif_frame on full-canvas/opaque/GCT clips — so switching
    the census/stats/videodup GIF legs to it changed no legacy hash."""
    for mid in (0, 1, 5, 6):  # variants 0/1 of the widened cycle
        clip = G.make_gif_clip(mid)
        pal, idx_frames = G.parse_gif(clip)
        comp = G.decode_gif_animation(clip)
        assert len(comp) == len(idx_frames)
        for canvas, idx in zip(comp, idx_frames):
            assert (canvas == G.decode_gif_frame(pal, idx)).all()


def test_gif_compositing_semantics():
    """r11 compositing rules, each checked against a hand-computed
    canvas: partial placement, transparency holes, disposal 2
    (restore background) and 3 (restore previous), local color
    tables, interlace composition."""
    gp = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
        dtype=np.uint8,
    )
    base = np.full((4, 4), 1, dtype=np.uint8)
    patch = np.full((2, 2), 2, dtype=np.uint8)

    # partial placement composites onto the previous canvas
    fr = G.decode_gif_animation(
        G.write_gif_animation(
            4, 4, gp, [{"idx": base}, {"idx": patch, "left": 1, "top": 2}]
        )
    )
    want = gp[base].copy()
    want[2:4, 1:3] = gp[2]
    assert (fr[1] == want).all()

    # transparent pixels leave the underlying canvas untouched
    overlay = np.array([[3, 0], [0, 3]], dtype=np.uint8)
    fr = G.decode_gif_animation(
        G.write_gif_animation(
            4, 4, gp,
            [{"idx": base}, {"idx": overlay, "transparent": 0}],
        )
    )
    want = gp[base].copy()
    want[0, 0] = gp[3]
    want[1, 1] = gp[3]
    assert (fr[1] == want).all()

    # disposal 2 clears the frame rect to the background color
    fr = G.decode_gif_animation(
        G.write_gif_animation(
            4, 4, gp,
            [
                {"idx": patch, "disposal": 2},
                {"idx": patch, "left": 2, "top": 2, "transparent": 255},
            ],
            bg_index=1,
        )
    )
    want = np.empty((4, 4, 3), dtype=np.uint8)
    want[:, :] = gp[1]
    want[2:4, 2:4] = gp[2]
    assert (fr[1] == want).all()

    # disposal 3 restores the pre-frame canvas
    fr = G.decode_gif_animation(
        G.write_gif_animation(
            4, 4, gp,
            [
                {"idx": base},
                {"idx": patch, "left": 1, "top": 1, "disposal": 3},
                {
                    "idx": np.full((1, 1), 3, dtype=np.uint8),
                    "transparent": 255,
                },
            ],
        )
    )
    want = gp[base].copy()
    want[0, 0] = gp[3]
    assert (fr[2] == want).all()

    # a local color table overrides the global one for its frame
    lct = np.array([[9, 9, 9], [7, 7, 7]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    fr = G.decode_gif_animation(
        G.write_gif_animation(2, 2, gp, [{"idx": idx, "palette": lct}])
    )
    assert (fr[0] == lct[idx]).all()

    # interlace composes with the compositing path
    tall = (np.arange(64, dtype=np.uint8).reshape(8, 8)) % 4
    fr = G.decode_gif_animation(
        G.write_gif_animation(8, 8, gp, [{"idx": tall, "interlace": True}])
    )
    assert (fr[0] == gp[tall]).all()

    # a frame rect outside the canvas is corrupt
    import pytest

    with pytest.raises(ValueError):
        G.decode_gif_animation(
            G.write_gif_animation(
                2, 2, gp, [{"idx": patch, "left": 1, "top": 1}]
            )
        )


def test_widened_fixture_cycle_decodes_and_carries_new_features():
    """Variants 2/3/4 really ship partial frames, LCTs, transparency,
    and disposal codes (checked raw in the byte stream), and all
    decode through gif_frame_stats."""
    seen_partial = seen_lct = seen_trans = False
    seen_disposal = set()
    for mid in range(10):
        clip = G.make_gif_clip(mid)
        G.gif_frame_stats(clip)  # must decode
        w, h = struct.unpack_from("<HH", clip, 6)
        pos = 13 + (2 << (clip[10] & 7)) * 3
        while pos < len(clip) and clip[pos] != 0x3B:
            if clip[pos] == 0x21:
                if clip[pos + 1] == 0xF9:
                    flags = clip[pos + 3]
                    seen_disposal.add((flags >> 2) & 7)
                    if flags & 1:
                        seen_trans = True
                pos += 2
                while clip[pos] != 0:
                    pos += 1 + clip[pos]
                pos += 1
            elif clip[pos] == 0x2C:
                left, top, fw, fh, iflags = struct.unpack_from(
                    "<HHHHB", clip, pos + 1
                )
                if (left, top, fw, fh) != (0, 0, w, h):
                    seen_partial = True
                pos += 10
                if iflags & 0x80:
                    seen_lct = True
                    pos += (2 << (iflags & 7)) * 3
                pos += 1
                while clip[pos] != 0:
                    pos += 1 + clip[pos]
                pos += 1
            else:
                raise AssertionError(f"unknown block 0x{clip[pos]:02X}")
    assert seen_partial and seen_lct and seen_trans
    assert {1, 2, 3} <= seen_disposal
