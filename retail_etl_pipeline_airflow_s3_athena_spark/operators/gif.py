"""GIF decode + encode (LZW) — the fourth web image format joins the
codec tier (PNG, JPEG, WAV/ADPCM, AVI/MJPEG), and animated GIF gives
the corpus a second compressed-video container.

Everything is stdlib-implementable and integer-exact:

- GIF87a/89a container: logical screen descriptor, global/local color
  tables, image descriptors, Graphic Control Extensions (frame delays
  / disposal), trailer.
- LZW with variable code width (3-12 bits per the GIF flavor:
  little-endian bit packing, clear/EOI codes, width bump at table
  size 2^n, table cap at 4096) — decoder AND encoder, so fixtures are
  self-made like every other codec here.
- Animation, two tiers:
  - ``parse_gif``: the frame-INDEPENDENT fast path (full-canvas
    replacement, GCT only, no transparency) — every frame decodable
    in isolation, the MJPEG-style frame-granularity parallelism.
  - ``decode_gif_animation`` (r11): full GIF89a COMPOSITING — local
    color tables, partial-frame placement, transparency holes, and
    disposal methods 0..3 (keep / restore-background /
    restore-previous), with defined integer rules so composited
    canvases are value-hashable.  Canvases chain sequentially within
    a clip, so this tier parallelizes at CLIP granularity.

Loud-fail frontier: ``parse_gif`` keeps its fast-path guards
(``NotImplementedError`` routes callers to the compositing decoder);
a GIF with no color table at all is undecodable and loud-fails in
both tiers — the png.py/jpeg.py honesty discipline.

GIF is LOSSLESS for palettized content (unlike JPEG/ADPCM): the
encode→decode roundtrip is pixel-exact, pinned in tests.  Decode is
bit-deterministic (pure table lookups), so ``gif_frame_luma`` carries
a full VALUES value-hash oracle.

Scale shape: Arrow ``mapInPandas`` projection (the codec-tier shape):
no shuffle, memory bounded by Arrow batch size × payload size,
corpus-size independent.  Within a clip, frames decode independently
(full-frame replacement only), so a 100 TB GIF corpus parallelizes at
frame granularity like MJPEG.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators.multimodal import (
    MEDIA_SCHEMA,
)


# ---------------------------------------------------------------------------
# LZW (GIF flavor: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------

class _LZWWriter:
    def __init__(self, min_code_size: int) -> None:
        self.min = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emit CLEAR, greedily extend dictionary strings,
    bump code width when the NEXT code would not fit, reset at 4096."""
    wr = _LZWWriter(min_code_size)
    clear, eoi = wr.clear, wr.eoi

    def fresh() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    wr.put(clear, width)
    s = b""
    for byte in data:
        cand = s + bytes([byte])
        if cand in table:
            s = cand
            continue
        wr.put(table[s], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            wr.put(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        s = bytes([byte])
    if s:
        wr.put(table[s], width)
    wr.put(eoi, width)
    return wr.flush()


def lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """Inverse of :func:`lzw_encode`; stops after ``expect`` output
    bytes or EOI.  Width bumps when the next assignable code reaches
    the current width's capacity (the standard decoder-side rule)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    out = bytearray()

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < expect:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def write_gif(frames: list[np.ndarray], palette: np.ndarray,
              delay_cs: int = 10, interlace: bool = False) -> bytes:
    """Index frames (h, w) uint8 + palette (n, 3) uint8 -> a complete
    GIF89a: global color table, one GCE + full-canvas image descriptor
    per frame, LZW-compressed.  ``interlace`` transmits rows in the
    appendix-E four-pass order (descriptor flag 0x40)."""
    h, w = frames[0].shape
    n = len(palette)
    depth = max(2, (n - 1).bit_length())
    table_size = 1 << depth
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[:n] = palette
    out += pal.tobytes()
    if len(frames) > 1:
        # NETSCAPE looping extension (standard for animation)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all GIF frames must be full-canvas")
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0x04, delay_cs, 0
        ) + b"\x00"  # GCE: disposal=1 (keep), no transparency
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        mcs = max(2, depth)
        out += bytes([mcs])
        rows = frame[_interlace_order(h)] if interlace else frame
        out += _sub_blocks(lzw_encode(rows.reshape(-1).tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def _interlace_order(h: int) -> np.ndarray:
    """GIF 89a appendix E interlace: the four-pass row transmission
    order (rows 0::8, then 4::8, then 2::4, then 1::2)."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )


def parse_gif(payload: bytes) -> tuple[np.ndarray, list[np.ndarray]]:
    """-> (palette (n,3) uint8, [index frames (h,w) uint8]).
    Interlaced frames (the four-pass row order) are de-interlaced by
    the inverse row scatter — decoded pixels are identical to the
    progressive transport.  Loud-fails on non-GIF input, transparency,
    partial-frame placement, local color tables, and missing GCT —
    the frame-independent fast path; decode_gif_animation handles the
    full compositing envelope."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(
            "not a GIF payload; only GIF87a/89a decode here"
        )
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not flags & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_size = 2 << (flags & 7)
    palette = np.frombuffer(
        payload, dtype=np.uint8, count=gct_size * 3, offset=pos
    ).reshape(gct_size, 3)
    pos += gct_size * 3
    frames: list[np.ndarray] = []
    transparent = False
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:
                blk_len = payload[pos]
                gce_flags = payload[pos + 1]
                if gce_flags & 0x01:
                    transparent = True
                pos += 1 + blk_len
            # skip remaining sub-blocks (and the whole body for
            # non-GCE extensions)
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, iflags = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            if iflags & 0x80:
                raise NotImplementedError(
                    "GIF local color tables not supported"
                )
            if (left, top, fw, fh) != (0, 0, w, h):
                raise NotImplementedError(
                    "partial-frame GIF placement (compositing) not "
                    "supported; full-canvas frames only"
                )
            if transparent:
                raise NotImplementedError(
                    "GIF transparency compositing not supported"
                )
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                lzw_decode(bytes(data), mcs, w * h), dtype=np.uint8
            ).reshape(h, w)
            if iflags & 0x40:
                # interlaced: stream row k is image row order[k]
                out = np.empty_like(idx)
                out[_interlace_order(h)] = idx
                idx = out
            frames.append(idx)
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    if not frames:
        raise ValueError("GIF carries no image data")
    return palette, frames


def decode_gif_frame(palette: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Index frame -> (h, w, 3) uint8 RGB via the palette lookup (a
    join-free integer map, the PNG PLTE shape)."""
    return palette[idx]


def write_gif_animation(
    canvas_w: int,
    canvas_h: int,
    global_palette: np.ndarray,
    frames: list[dict],
    bg_index: int = 0,
) -> bytes:
    """General GIF89a encoder for the full compositing envelope (r11;
    the fixture-side inverse of decode_gif_animation).

    ``frames``: one dict per frame —
      ``idx``         (fh, fw) uint8 index array (required)
      ``left``/``top`` placement on the canvas (default 0, 0)
      ``palette``     optional (n, 3) local color table
      ``transparent`` optional transparent index
      ``disposal``    0..3 (default 1 = keep)
      ``interlace``   appendix-E row order (default False)
    """
    gp = np.asarray(global_palette, dtype=np.uint8)
    depth = max(2, (len(gp) - 1).bit_length())
    table_size = 1 << depth
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", canvas_w, canvas_h, 0x80 | ((depth - 1) & 7),
        bg_index, 0,
    )
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[: len(gp)] = gp
    out += pal.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        idx = np.asarray(f["idx"], dtype=np.uint8)
        fh, fw = idx.shape
        disposal = int(f.get("disposal", 1))
        trans = f.get("transparent")
        gce_flags = (disposal & 7) << 2
        tindex = 0
        if trans is not None:
            gce_flags |= 0x01
            tindex = int(trans)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gce_flags, 10, tindex
        ) + b"\x00"
        lct = f.get("palette")
        iflags = 0x40 if f.get("interlace") else 0
        if lct is not None:
            lct = np.asarray(lct, dtype=np.uint8)
            ldepth = max(2, (len(lct) - 1).bit_length())
            iflags |= 0x80 | ((ldepth - 1) & 7)
        out += b"\x2c" + struct.pack(
            "<HHHHB", int(f.get("left", 0)), int(f.get("top", 0)),
            fw, fh, iflags,
        )
        if lct is not None:
            lpal = np.zeros((1 << ldepth, 3), dtype=np.uint8)
            lpal[: len(lct)] = lct
            out += lpal.tobytes()
            mcs = max(2, ldepth)
        else:
            mcs = max(2, depth)
        rows = idx[_interlace_order(fh)] if f.get("interlace") else idx
        out += bytes([mcs])
        out += _sub_blocks(lzw_encode(rows.reshape(-1).tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif_animation(payload: bytes) -> list[np.ndarray]:
    """-> list of (canvas_h, canvas_w, 3) uint8 RGB CANVASES, one per
    frame, with full GIF89a compositing semantics (r11 — this closes
    the module's loud-fail frontier): local color tables, partial-
    frame placement, transparency, and disposal methods 0..3.  On the
    frame-independent envelope (full-canvas, opaque, GCT-only) the
    output is pixel-identical to parse_gif + decode_gif_frame, so the
    old fixtures hash unchanged through this path.

    Defined-integer compositing rules (the spec is the code, the
    detmath discipline — every rule below is what browsers do, made
    deterministic):
    - the canvas starts as the background color (GCT[background
      index]; zeros if the index is outside the GCT)
    - transparent pixels leave the underlying canvas untouched
    - disposal 0/1 keep the composited result for the next frame
    - disposal 2 restores the frame RECT to the background color
    - disposal 3 restores the frame RECT to the pre-frame canvas

    Scale: unlike the full-canvas fast path, composited frames form a
    SEQUENTIAL chain within one clip (each canvas depends on the
    previous) — so the parallelism unit is the CLIP, not the frame;
    the Arrow mapInPandas projection shape is unchanged and per-clip
    memory is one canvas + one frame rect."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(
            "not a GIF payload; only GIF87a/89a decode here"
        )
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct_size = 2 << (flags & 7)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=gct_size * 3, offset=pos
        ).reshape(gct_size, 3)
        pos += gct_size * 3
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb
    out_frames: list[np.ndarray] = []
    trans_idx: int | None = None
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:
                blk_len = payload[pos]
                gce_flags = payload[pos + 1]
                tindex = payload[pos + 4]
                disposal = (gce_flags >> 2) & 7
                trans_idx = tindex if gce_flags & 0x01 else None
                pos += 1 + blk_len
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, iflags = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            if left + fw > w or top + fh > h:
                raise ValueError("GIF frame rect exceeds the canvas")
            if iflags & 0x80:
                lct_size = 2 << (iflags & 7)
                palette = np.frombuffer(
                    payload, dtype=np.uint8, count=lct_size * 3,
                    offset=pos,
                ).reshape(lct_size, 3)
                pos += lct_size * 3
            else:
                if gct is None:
                    raise NotImplementedError(
                        "GIF frame without any color table"
                    )
                palette = gct
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                lzw_decode(bytes(data), mcs, fw * fh), dtype=np.uint8
            ).reshape(fh, fw)
            if iflags & 0x40:
                unrolled = np.empty_like(idx)
                unrolled[_interlace_order(fh)] = idx
                idx = unrolled
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("GIF index outside its color table")
            saved = None
            if disposal == 3:
                saved = canvas[top:top + fh, left:left + fw].copy()
            rect = canvas[top:top + fh, left:left + fw]
            rgb = palette[idx]
            if trans_idx is not None:
                opaque = idx != trans_idx
                rect[opaque] = rgb[opaque]
            else:
                rect[:, :] = rgb
            out_frames.append(canvas.copy())
            if disposal == 2:
                canvas[top:top + fh, left:left + fw] = bg_rgb
            elif disposal == 3:
                canvas[top:top + fh, left:left + fw] = saved
            trans_idx = None
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    if not out_frames:
        raise ValueError("GIF carries no image data")
    return out_frames


# ---------------------------------------------------------------------------
# Fixtures + the distributed operator
# ---------------------------------------------------------------------------

def make_gif_clip(media_id: int) -> bytes:
    """Deterministic animated GIF cycling through the full decode
    envelope: full-canvas progressive/interlaced (the legacy pair),
    and — r11, the compositing tier — partial-frame placement with
    transparency holes, a local-color-table frame with disposal 2
    (restore background), and a disposal-3 interlaced patch.  All
    content is banded integer over deterministic palettes."""
    n_frames = 2 + (media_id * 3) % 6
    w = 20 + (media_id * 7) % 30
    h = 20 + (media_id * 5) % 30
    pal = np.zeros((32, 3), dtype=np.uint8)
    for i in range(32):
        pal[i] = [
            (media_id * 31 + i * 8) % 256,
            (media_id * 17 + i * 5) % 256,
            (media_id * 23 + i * 11) % 256,
        ]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    frames = [
        ((media_id * 3 + f * 5 + yy + xx * 2) % 32).astype(np.uint8)
        for f in range(n_frames)
    ]
    variant = media_id % 5
    if variant < 2:
        # legacy full-canvas pair; interlace on variant 1 — decoded
        # pixels are identical, so the stats oracle is transport-blind
        # while the corpus exercises the de-interlace path
        return write_gif(frames, pal, interlace=(variant == 1))
    if variant == 2:
        # base frame + transparent partial patches (the real-web
        # animation shape: only the changed rect is retransmitted)
        pw, ph = max(2, w // 2), max(2, h // 2)
        patches = [
            {
                "idx": (frames[f][:ph, :pw] + f) % 32,
                "left": (f * 3) % (w - pw),
                "top": (f * 5) % (h - ph),
                "transparent": int((media_id + f) % 32),
            }
            for f in range(1, n_frames)
        ]
        return write_gif_animation(
            w, h, pal, [{"idx": frames[0]}] + patches
        )
    if variant == 3:
        # local-color-table frame + disposal 2 (restore background)
        lct = ((pal.astype(np.int64) * 3 + 11) % 256).astype(np.uint8)
        return write_gif_animation(
            w,
            h,
            pal,
            [
                {"idx": frames[0], "disposal": 2},
                {"idx": frames[1] % 32, "palette": lct},
            ],
            bg_index=int(media_id % 32),
        )
    # variant 4: disposal 3 (restore previous) + interlaced patch
    ph = max(8, h // 2)
    return write_gif_animation(
        w,
        h,
        pal,
        [
            {"idx": frames[0]},
            {
                "idx": frames[1][:ph, :],
                "top": (h - ph) // 2,
                "disposal": 3,
                "interlace": True,
            },
            {
                "idx": frames[1 % len(frames)],
                "transparent": int(media_id % 32),
            },
        ],
    )


def synthesize_gif_corpus(spark: SparkSession, n: int = 25) -> DataFrame:
    rows = [(i, "video", make_gif_clip(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_colors", T.IntegerType()),
        T.StructField("mean_luma_e4", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def gif_frame_stats(payload: bytes, every_n: int = 2) -> list[tuple]:
    """Per-sampled-frame rows (operator + VALUES-oracle twin): BT.601
    integer luma and a checksum over the COMPOSITED RGB canvas —
    proof the LZW + palette + compositing pipeline ran (r11: the
    general decoder replaced the full-canvas fast path here; output
    is bit-identical on the legacy envelope).  The container walk
    decodes ALL frames (composited canvases chain sequentially) but
    only sampled canvases are hashed.  n_colors reports the GLOBAL
    color table size (the clip-level property)."""
    frames = decode_gif_animation(payload)  # validates the container
    flags = payload[10]
    n_colors = int(2 << (flags & 7)) if flags & 0x80 else 0
    rows = []
    for i in range(0, len(frames), every_n):
        rgb = frames[i].astype(np.int64)
        fh, fw, _ = rgb.shape
        luma_sum = int(
            (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114)
            .sum()
        ) // 1000
        rows.append(
            (
                i,
                fw,
                fh,
                n_colors,
                luma_sum * 10**4 // (fw * fh),
                hashlib.sha256(
                    rgb.astype("uint8").tobytes()
                ).hexdigest()[:12],
            )
        )
    return rows


def gif_frame_luma(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Distributed animated-GIF frame sampling: LZW decode + palette
    expansion inside Arrow batches, integer luma + checksum out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for r in gif_frame_stats(bytes(payload), every_n):
                    rows.append((int(mid),) + r)
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(batches, GIF_FRAME_SCHEMA)
