"""Stdlib PNG codec: the one slice of the compressed-media gap
closable without PIL/ffmpeg (r7 verdict #5).

PNG's container is zlib (stdlib) plus five per-scanline byte filters
(None/Sub/Up/Average/Paeth, RFC 2083 §6) — all pure integer
arithmetic, so an 8-bit grayscale/RGB/RGBA decode is deterministic
bit-for-bit across engines, partitionings, and numpy versions.  This
module implements:

- ``decode_png``: chunk walk → IDAT concat → ``zlib.decompress`` →
  scanline defilter → (h, w, c) integer array.  Envelope (r8 verdict
  #7 widened it): 8-bit gray/GA/RGB/RGBA, 8-bit palette (PLTE lookup —
  a join-free integer map; 1/2/4-bit sub-byte index unpacking — r9
  verdict #4), 16-bit channels (big-endian byte-pair fold → uint16),
  Adam7 interlace (seven independently-filtered sub-images
  scattered back onto the pass grid), and tRNS transparency (r10
  verdict #3: palette alpha table as a second join-free map;
  gray/RGB key matching to a 0/opaque alpha channel — all integer).
  Refuses (loudly) truncated/corrupt streams and illegal
  depth/type/chunk combinations.
- ``encode_png`` / ``encode_png_palette``: the fixture-side inverses
  (filter + compress), with a per-row filter cycle so the decoder's
  Sub/Up/Average/Paeth paths are all exercised by every synthesized
  image.
- ``png_features``: the distributed operator — Arrow ``mapInPandas``
  over BINARY payload rows, emitting per-image integer stats + a
  decoded-pixel checksum.  A pure projection: no shuffle; memory
  bounded by Arrow's maxRecordsPerBatch × payload size, independent
  of corpus size (same scale shape as multimodal.resize_media).

Reference scope: the reference pipeline (scripts/transform.py) is
text/CSV only — this is extension coverage for the multimodal
training-data tier; JPEG/video stay behind the loud
``NotImplementedError`` swap-in point in operators/multimodal.py.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators.multimodal import MEDIA_SCHEMA

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> channels (8-bit, non-palette only)
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, exactly RFC 2083 §6.6 (ties: a, then b)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanlines(
    byte_rows: np.ndarray, bpp: int, filter_cycle: bool
) -> bytes:
    """RFC 2083 §6 byte-level row filtering shared by every encode
    variant: filters operate on raw scanline BYTES with the byte-pixel
    width ``bpp`` (channels × bytes-per-sample), which is what makes
    the same machinery serve 8-bit, palette-index, and 16-bit rows."""
    h, _stride = byte_rows.shape
    out = bytearray()
    prev_flat = np.zeros(byte_rows.shape[1], dtype=np.int64)
    for y in range(h):
        flat = byte_rows[y]
        ft = (y % 5) if filter_cycle else 0
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), flat[:-bpp]])
        upleft = np.concatenate(
            [np.zeros(bpp, dtype=np.int64), prev_flat[:-bpp]]
        )
        if ft == 0:
            filt = flat
        elif ft == 1:
            filt = flat - left
        elif ft == 2:
            filt = flat - prev_flat
        elif ft == 3:
            filt = flat - (left + prev_flat) // 2
        else:
            pred = np.array(
                [
                    _paeth(int(a), int(b), int(cc))
                    for a, b, cc in zip(left, prev_flat, upleft)
                ],
                dtype=np.int64,
            )
            filt = flat - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev_flat = flat
    return bytes(out)


# Adam7 pass grid (RFC 2083 §8.2): (x0, y0, dx, dy) per pass.  A pass
# whose sub-image is empty for the given (w, h) contributes zero bytes
# to the stream — both directions honor that.
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _pack_sub_byte(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, n) sample rows -> (h, ceil(n*depth/8)) byte rows: ``depth``
    bits per sample, leftmost sample in the HIGH bits of each byte
    (RFC 2083 §7.2 packing order)."""
    h, n = samples.shape
    per_byte = 8 // depth
    pad = (-n) % per_byte
    padded = np.pad(samples.astype(np.int64), ((0, 0), (0, pad)))
    grouped = padded.reshape(h, -1, per_byte)
    shifts = (np.arange(per_byte)[::-1] * depth).astype(np.int64)
    return (grouped << shifts).sum(axis=2)


def _unpack_sub_byte(byte_rows: np.ndarray, n: int, depth: int) -> np.ndarray:
    """Inverse of _pack_sub_byte: (h, stride) byte rows -> (h, n)
    samples (trailing pad bits of the last byte discarded)."""
    h = byte_rows.shape[0]
    per_byte = 8 // depth
    shifts = (np.arange(per_byte)[::-1] * depth).astype(np.int64)
    samples = (byte_rows.astype(np.int64)[:, :, None] >> shifts) & (
        (1 << depth) - 1
    )
    return samples.reshape(h, -1)[:, :n]


def _samples_to_byte_rows(
    samples: np.ndarray, depth: int
) -> tuple[np.ndarray, int]:
    """(h, w, cs) samples -> (filtered-stream byte rows, bpp) for the
    given bit depth.  bpp is the byte distance between corresponding
    bytes of adjacent pixels (min 1 — RFC 2083 §6.2)."""
    h, w, cs = samples.shape
    vals = samples.astype(np.int64)
    if depth == 16:
        rows = np.stack([vals >> 8, vals & 255], axis=-1).reshape(
            h, w * cs * 2
        )
        return rows, cs * 2
    if depth == 8:
        return vals.reshape(h, w * cs), cs
    if cs != 1:
        raise ValueError("sub-byte depths carry one channel per pixel")
    return _pack_sub_byte(vals.reshape(h, w), depth), 1


def _byte_rows_to_samples(
    rows: np.ndarray, w: int, cs: int, depth: int
) -> np.ndarray:
    """Inverse of _samples_to_byte_rows: defiltered byte rows ->
    (h, w, cs) integer samples (16-bit pairs folded, sub-byte bits
    unpacked)."""
    h = rows.shape[0]
    if depth == 16:
        pairs = rows.reshape(h, w, cs, 2)
        return pairs[..., 0] * 256 + pairs[..., 1]
    if depth == 8:
        return rows.reshape(h, w, cs)
    return _unpack_sub_byte(rows, w, depth).reshape(h, w, 1)


def _pass_dims(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Adam7 sub-image dimensions: (x0, y0, dx, dy, subw, subh)."""
    return [
        (x0, y0, dx, dy, (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
        for x0, y0, dx, dy in _ADAM7
    ]


def _filtered_body(
    samples: np.ndarray, depth: int, filter_cycle: bool, interlace: bool
) -> bytes:
    """Filter an (h, w, cs) sample image into the IDAT byte body —
    one filtered sub-image per Adam7 pass when ``interlace``."""
    if not interlace:
        rows, bpp = _samples_to_byte_rows(samples, depth)
        return _filter_scanlines(rows, bpp, filter_cycle)
    h, w, _cs = samples.shape
    body = bytearray()
    for x0, y0, dx, dy, subw, subh in _pass_dims(w, h):
        if subw == 0 or subh == 0:
            continue
        sub = samples[y0::dy, x0::dx, :]
        rows, bpp = _samples_to_byte_rows(sub, depth)
        body += _filter_scanlines(rows, bpp, filter_cycle)
    return bytes(body)


def encode_png(
    img: np.ndarray,
    filter_cycle: bool = True,
    interlace: bool = False,
    gray_depth: int | None = None,
    trns_key: int | tuple[int, int, int] | None = None,
) -> bytes:
    """Encode an (h, w) or (h, w, c) array as a valid PNG: uint8 input
    writes bit depth 8, uint16 input writes bit depth 16 (big-endian
    sample bytes, RFC 2083 §7.2).  ``filter_cycle=True`` rotates the
    row filter through 0..4 so every defilter path gets exercised;
    ``interlace`` writes the Adam7 seven-pass layout.  ``gray_depth``
    in {1, 2, 4} writes sub-byte grayscale — the input then holds
    LEVEL values below 2**gray_depth (one channel).  ``trns_key``
    writes a §4.2.1 tRNS chunk: one raw sample value (grayscale) or
    an (r, g, b) triple (RGB) that decodes to alpha 0."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if gray_depth is not None:
        if gray_depth not in (1, 2, 4) or c != 1:
            raise ValueError("gray_depth requires 1/2/4 and one channel")
        if int(img.max(initial=0)) >= (1 << gray_depth):
            raise ValueError(f"gray level exceeds bit depth {gray_depth}")
        depth = gray_depth
    else:
        depth = 16 if img.dtype == np.uint16 else 8
    body = _filtered_body(
        img.astype(np.int64), depth, filter_cycle, interlace
    )
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace)
    )
    trns_chunk = b""
    if trns_key is not None:
        if c == 1:
            trns_chunk = _chunk(b"tRNS", struct.pack(">H", int(trns_key)))
        elif c == 3:
            trns_chunk = _chunk(b"tRNS", struct.pack(">3H", *trns_key))
        else:
            raise ValueError("trns_key requires grayscale or RGB input")
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    idx: np.ndarray,
    palette: np.ndarray,
    filter_cycle: bool = True,
    depth: int = 8,
    interlace: bool = False,
    trns_alpha: np.ndarray | None = None,
) -> bytes:
    """Encode an (h, w) index array + (n, 3) uint8 palette as a
    color-type-3 PNG.  ``depth`` ∈ {1, 2, 4, 8} selects the index
    packing (sub-byte depths pack leftmost-pixel-high per RFC 2083
    §7.2); ``interlace`` writes Adam7; ``trns_alpha`` writes a tRNS
    per-palette-entry alpha table (may be shorter than the palette —
    the tail defaults to opaque on decode)."""
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"invalid palette bit depth {depth}")
    if int(idx.max(initial=0)) >= (1 << depth):
        raise ValueError(f"palette index exceeds bit depth {depth}")
    h, w = idx.shape
    body = _filtered_body(
        idx.astype(np.int64)[:, :, None], depth, filter_cycle, interlace
    )
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, 3, 0, 0, int(interlace)
    )
    trns_chunk = b""
    if trns_alpha is not None:
        if trns_alpha.shape[0] > palette.shape[0]:
            raise ValueError("tRNS alpha table longer than palette")
        trns_chunk = _chunk(
            b"tRNS", trns_alpha.astype(np.uint8).tobytes()
        )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, c) integer array.  Pure stdlib +
    integer defiltering — bit-deterministic.  Supported envelope:

    - 8-bit grayscale/gray+alpha/RGB/RGBA -> (h, w, c) uint8
    - 1/2/4/8-bit palette (color type 3, PLTE lookup; sub-byte
      indices unpacked high-bits-first) -> (h, w, 3) uint8
    - 1/2/4-bit grayscale (exact ×255/×85/×17 §7.2 sample scaling)
      -> (h, w, 1) uint8
    - 16-bit grayscale/gray+alpha/RGB/RGBA (big-endian byte-pair
      fold) -> (h, w, c) uint16
    - Adam7 interlace for every supported depth/type (seven
      independently-filtered sub-images scattered back, RFC 2083 §8.2)
    - tRNS transparency (§4.2.1): palette alpha table appends an
      alpha channel via a second join-free lookup -> (h, w, 4);
      gray/RGB key matching appends a 0-or-opaque alpha channel
      (uint16-scaled for 16-bit images)

    This is the complete LEGAL IHDR envelope (every valid bit-depth ×
    color-type combination) plus the tRNS ancillary chunk; corrupt
    streams and illegal depth/type/chunk combinations raise
    ``ValueError``."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            if length % 3 != 0:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = data
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    is_palette = color_type == 3
    is_subbyte_gray = color_type == 0 and depth in (1, 2, 4)
    if is_palette:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"invalid palette PNG bit depth {depth}")
    elif color_type not in _COLOR_CHANNELS or (
        depth not in (8, 16) and not is_subbyte_gray
    ):
        # sub-byte depths are only LEGAL for grayscale and palette
        # (RFC 2083 §4.1.1) — anything else is a corrupt header
        raise ValueError(
            f"invalid PNG bit depth {depth} / color type {color_type}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    # channels in the FILTERED byte stream (palette rows carry index
    # samples; 16-bit rows carry two bytes per sample)
    cs = 1 if is_palette else _COLOR_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        samples, offset = _read_subimage(raw, 0, w, h, cs, depth)
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the (x0 + i·dx, y0 + j·dy) grid; empty passes
        # contribute zero bytes
        samples = np.zeros((h, w, cs), dtype=np.int64)
        offset = 0
        for x0, y0, dx, dy, subw, subh in _pass_dims(w, h):
            if subw == 0 or subh == 0:
                continue
            sub, offset = _read_subimage(raw, offset, subw, subh, cs, depth)
            samples[y0::dy, x0::dx, :] = sub
    if offset != len(raw):
        raise ValueError("PNG pixel data length mismatch")
    if is_palette:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index out of PLTE range")
        rgb = plte[idx]  # (h, w, 3) uint8 — join-free integer map
        if trns is None:
            return rgb
        # tRNS §4.2.1: one alpha byte per palette entry (a shorter
        # table defaults the tail to opaque) — a second join-free map
        if len(trns) > plte.shape[0]:
            raise ValueError("tRNS longer than PLTE")
        alpha_tab = np.full(plte.shape[0], 255, dtype=np.uint8)
        alpha_tab[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        return np.concatenate(
            [rgb, alpha_tab[idx][:, :, None]], axis=2
        )  # (h, w, 4) uint8
    # tRNS §4.2.1 for non-palette: ONE raw sample value (gray) or
    # sample triple (RGB), 16-bit fields regardless of depth; matching
    # pixels get alpha 0, everything else full opacity
    alpha = None
    if trns is not None:
        if color_type not in (0, 2):
            raise ValueError(
                "tRNS chunk is illegal for alpha color types (4/6)"
            )
        n_key = 1 if color_type == 0 else 3
        if len(trns) != 2 * n_key:
            raise ValueError("bad tRNS chunk length")
        key = np.array(
            struct.unpack(f">{n_key}H", trns), dtype=np.int64
        )
        if int(key.max()) >= (1 << depth):
            raise ValueError("tRNS key exceeds bit depth")
        opaque = (1 << depth) - 1 if depth == 16 else 255
        alpha = np.where(
            (samples == key).all(axis=2), 0, opaque
        )[:, :, None]
    if is_subbyte_gray:
        # RFC 2083 §7.2 sample scaling: 255/(2^d − 1) is EXACTLY
        # 255/85/17 for d=1/2/4, so sub-byte gray stays integer-exact
        out = samples * (255 // ((1 << depth) - 1))
    else:
        out = samples
    if alpha is not None:
        out = np.concatenate([out, alpha], axis=2)
    return out.astype(np.uint16 if depth == 16 else np.uint8)


def _read_subimage(
    raw: bytes, offset: int, w: int, h: int, cs: int, depth: int
) -> tuple[np.ndarray, int]:
    """Defilter one (sub-)image of ``h`` scanlines starting at
    ``offset`` in the inflated stream; -> ((h, w, cs) samples, next
    offset)."""
    stride = (w * cs * depth + 7) // 8
    bpp = max(1, cs * (depth // 8))
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        base = offset + y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
        ).astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up — vectorizable
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth depend on the reconstructed left
            # neighbor — sequential along the row by construction
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, cc)
                rec[i] = (int(line[i]) + pred) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec
    return _byte_rows_to_samples(out, w, cs, depth), offset + need


# ---------------------------------------------------------------------------
# Fixtures + the distributed operator
# ---------------------------------------------------------------------------

def _palette_fixture(media_id: int, h: int, w: int, depth: int):
    """Deterministic (idx, palette) pair bounded to 2**depth colors."""
    n_colors = min(64, 1 << depth)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    idx = ((media_id * 31 + yy * 7 + xx * 13) % n_colors).astype(np.uint8)
    palette = (
        (
            np.arange(n_colors)[:, None] * np.array([3, 7, 11])
            + media_id * 29
        )
        % 256
    ).astype(np.uint8)
    return idx, palette


def make_png_image(media_id: int) -> bytes:
    """Deterministic PNG: gradient-ish integer pixels (same generator
    family as multimodal.make_raw_image), cycling through the full
    supported envelope — 8-bit gray/RGB/RGBA, 8/4/2/1-bit palette
    (PLTE), 16-bit grayscale, Adam7-interlaced RGB + 4-bit palette,
    and the four tRNS transparency shapes (palette alpha table,
    gray-8 key, interlaced-RGB key, gray-16 key) — so every corpus
    exercises every decode path (r9 verdict #4 widened the cycle with
    the sub-byte and interlaced variants; r11 with tRNS)."""
    variant = media_id % 14
    w = 16 + (media_id * 7) % 48
    h = 16 + (media_id * 11) % 48
    if variant == 9:  # interlaced 2-bit grayscale (levels 0..3)
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        levels = ((media_id + yy * 3 + xx) % 4).astype(np.uint8)
        return encode_png(levels, gray_depth=2, interlace=True)
    if variant == 3:  # 8-bit palette
        idx, palette = _palette_fixture(media_id, h, w, 8)
        return encode_png_palette(idx, palette)
    if variant == 4:  # 16-bit grayscale
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img16 = (
            (media_id * 131 + yy * 257 + xx * 523) % 65536
        ).astype(np.uint16)
        return encode_png(img16)
    if variant == 5:  # 4-bit palette (sub-byte index packing)
        idx, palette = _palette_fixture(media_id, h, w, 4)
        return encode_png_palette(idx, palette, depth=4)
    if variant == 6:  # 1-bit palette, non-byte-aligned rows
        idx, palette = _palette_fixture(media_id, h, w + 3, 1)
        return encode_png_palette(idx, palette, depth=1)
    if variant == 7:  # Adam7-interlaced RGB
        yy, xx, cc = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        img = (
            (media_id * 31 + yy * 7 + xx * 13 + cc * 97) % 256
        ).astype(np.uint8)
        return encode_png(img, interlace=True)
    if variant == 8:  # Adam7-interlaced 2-bit palette
        idx, palette = _palette_fixture(media_id, h, w, 2)
        return encode_png_palette(idx, palette, depth=2, interlace=True)
    if variant == 10:  # 8-bit palette + partial tRNS alpha table
        idx, palette = _palette_fixture(media_id, h, w, 8)
        n_colors = palette.shape[0]
        alpha = (
            (np.arange(n_colors // 2 + 1) * 37 + media_id * 11) % 256
        ).astype(np.uint8)
        return encode_png_palette(idx, palette, trns_alpha=alpha)
    if variant == 11:  # 8-bit grayscale + tRNS key (hits real pixels)
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        gray = ((media_id * 31 + yy * 7 + xx * 13) % 256).astype(
            np.uint8
        )
        return encode_png(gray, trns_key=int(gray[0, 0]))
    if variant == 12:  # Adam7-interlaced RGB + tRNS color key
        yy, xx, cc = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        img = (
            (media_id * 31 + yy * 7 + xx * 13 + cc * 97) % 256
        ).astype(np.uint8)
        key = tuple(int(v) for v in img[0, 0])
        return encode_png(img, interlace=True, trns_key=key)
    if variant == 13:  # 16-bit grayscale + tRNS key
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img16 = (
            (media_id * 131 + yy * 257 + xx * 523) % 65536
        ).astype(np.uint16)
        return encode_png(img16, trns_key=int(img16[0, 0]))
    c = (1, 3, 4)[variant]
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    img = ((media_id * 31 + yy * 7 + xx * 13 + cc * 97) % 256).astype(
        np.uint8
    )
    return encode_png(img)


def synthesize_png_images(spark: SparkSession, n: int = 40) -> DataFrame:
    rows = [(i, "image", make_png_image(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PNG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_c0_e2", T.LongType()),
        T.StructField("edge_energy", T.LongType()),
        T.StructField("pixel_checksum", T.StringType()),
    ]
)


def png_stats(payload: bytes) -> tuple:
    """Single-image feature row (shared by the operator and the
    locally-recomputed VALUES oracle): integer mean of channel 0 in
    e2 fixed point (truncating), total |horizontal gradient| of
    channel 0 (an exact integer edge-energy proxy), and a checksum of
    the DECODED pixel buffer (proves the full inflate+defilter ran)."""
    img = decode_png(payload)
    h, w, c = img.shape
    ch0 = img[:, :, 0].astype(np.int64)
    mean_e2 = int(100 * int(ch0.sum()) // (h * w))
    edge = int(np.abs(np.diff(ch0, axis=1)).sum())
    return (
        h,
        w,
        c,
        mean_e2,
        edge,
        hashlib.sha256(img.tobytes()).hexdigest()[:16],
    )


def png_features(media: DataFrame) -> DataFrame:
    """Distributed PNG decode + feature extraction: Arrow batches in,
    one integer-stats row per image out.  Pure projection (no
    shuffle); the decode is the real inflate + defilter, not a header
    peek."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h, w, c, mean_e2, edge, ck = png_stats(bytes(payload))
                rows.append((int(mid), w, h, c, mean_e2, edge, ck))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PNG_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, PNG_FEATURE_SCHEMA)
