"""Stdlib baseline JPEG codec — the last slice of the compressed-media
frontier closable without imaging libraries (r8 verdict #2 named it:
"baseline JPEG (Huffman + integer IDCT) is possible stdlib but big").

Scope: BASELINE sequential DCT (SOF0), 8-bit, grayscale and YCbCr in
4:4:4 / 4:2:0 (the dominant web profile: 2x2-sampled luma,
box-mean-downsampled chroma, replicated back up at decode) / 4:2:2 /
4:4:0, standard Annex-K quantization and Huffman tables, with restart
intervals (DRI/RSTn — lossless resync points real encoders default
on) supported on both sides; PLUS progressive (SOF2) at 4:4:4 /
grayscale with spectral selection and DC successive approximation on
both sides (coefficient accumulation across scans, general EOBn run
decoding, raw-bit DC refinement per T.81 G.1.2.1) — the progressive
encoder reuses the exact baseline quantization, so progressive and
baseline transports of the same image decode BIT-IDENTICALLY (pinned
in tests).  Arithmetic coding, AC successive approximation,
progressive subsampling, and 4:1:1 stay behind loud
``NotImplementedError`` — the same honest-frontier discipline as
``operators/png.py``.

Determinism is the design constraint (the repo's gate hashes decoded
pixels): every stage is 64-bit integer arithmetic —

- the 8-point DCT basis is a LITERAL Q14 integer matrix (no libm at
  import or run time); FDCT/IDCT are two 1-D integer matrix passes
  with a fixed +8192 >> 14 rounding per pass;
- color conversion uses the JFIF integer approximations in Q8;
- Huffman tables are built canonically from Annex-K BITS/HUFFVAL
  literals (encoder and decoder share them);
- the bit reader honors 0xFF00 byte stuffing exactly.

JPEG is lossy, so encode→decode is NOT pixel-identical to the source
(tests bound the reconstruction error); what IS exact is the decode:
the same bytes decode to the same pixels on every executor, engine,
and platform — which is what makes ``jpeg_features`` value-hashable.

Plan shape: ``jpeg_features`` is the png_features shape — an Arrow
``mapInPandas`` projection, no shuffle, memory bounded by Arrow batch
size × payload size, corpus-size independent.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators.multimodal import MEDIA_SCHEMA

# Q14 DCT-II basis: M[u][x] = 0.5*c(u)*cos((2x+1)u*pi/16), c(0)=1/sqrt2.
# LITERALS (generated offline) — no libm anywhere in the codec.
_DCT_Q14 = np.array(
    [
        [5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793],
        [8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035],
        [7568, 3135, -3135, -7568, -7568, -3135, 3135, 7568],
        [6811, -1598, -8035, -4551, 4551, 8035, 1598, -6811],
        [5793, -5793, -5793, 5793, 5793, -5793, -5793, 5793],
        [4551, -8035, 1598, 6811, -6811, -1598, 8035, -4551],
        [3135, -7568, 7568, -3135, -3135, 7568, -7568, 3135],
        [1598, -4551, 6811, -8035, 8035, -6811, 4551, -1598],
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 quantization tables (quality-50 reference)
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Encoder quality (IJG convention): scale = 200 - 2q for q >= 50.
# 75 is the common default; the decoder always reads tables from the
# stream's DQT segment, so any quality decodes.
JPEG_QUALITY = 75


def _scaled_qt(qt: np.ndarray, quality: int = JPEG_QUALITY) -> np.ndarray:
    scale = (
        200 - 2 * quality if quality >= 50 else 5000 // max(quality, 1)
    )
    return np.maximum(1, (qt * scale + 50) // 100).astype(np.int64)


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C canonical code assignment: val -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    return {
        (ln, code): v for v, (code, ln) in _canonical_codes(bits, vals).items()
    }


def _fdct(block: np.ndarray) -> np.ndarray:
    """8x8 integer DCT-II: two Q14 matrix passes, +8192>>14 rounding."""
    t = (_DCT_Q14 @ block.astype(np.int64) + 8192) >> 14
    return (t @ _DCT_Q14.T + 8192) >> 14


def _idct(coef: np.ndarray) -> np.ndarray:
    """8x8 integer inverse DCT: the transposed passes."""
    t = (_DCT_Q14.T @ coef.astype(np.int64) + 8192) >> 14
    return (t @ _DCT_Q14 + 8192) >> 14


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        """Pad the current byte with 1-bits (spec fill) — required
        before emitting a restart marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def emit_marker(self, byte2: int) -> None:
        """Append a raw 0xFF <byte2> marker — NOT entropy data, so it
        bypasses byte stuffing (markers are how decoders resync)."""
        self.byte_align()
        self.out.append(0xFF)
        self.out.append(byte2)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # a restart marker reached mid-entropy-decode: the
                # stream and the declared restart interval disagree
                raise ValueError(
                    "unexpected RSTn inside an MCU (restart interval "
                    "mismatch or corrupt scan)"
                )
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def sync_restart(self, n: int) -> None:
        """Consume the byte-aligned RSTn marker at a restart boundary
        (the fill bits already read into ``acc`` are discarded)."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG scan truncated at restart boundary")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != (
            0xD0 + (n & 7)
        ):
            raise ValueError(
                f"expected RST{n & 7} at restart boundary, found "
                f"0x{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in JPEG scan")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF integer Q8 approximation (h, w, 3) uint8 -> int64 planes."""
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = ((-43 * r - 85 * g + 128 * b + 128) >> 8) + 128
    cr = ((128 * r - 107 * g - 21 * b + 128) >> 8) + 128
    return np.stack(
        [np.clip(y, 0, 255), np.clip(cb, 0, 255), np.clip(cr, 0, 255)],
        axis=-1,
    )


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y = planes[:, :, 0].astype(np.int64)
    cb = planes[:, :, 1].astype(np.int64) - 128
    cr = planes[:, :, 2].astype(np.int64) - 128
    r = y + ((359 * cr + 128) >> 8)
    g = y - ((88 * cb + 183 * cr + 128) >> 8)
    b = y + ((454 * cb + 128) >> 8)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _encode_component(
    plane: np.ndarray,
    qt: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    writer: _BitWriter,
    pred: int,
) -> int:
    """Encode one component's blocks for ONE MCU position is handled by
    the caller; this encodes a single 8x8 block and returns the new DC
    predictor."""
    coef = _fdct(plane.astype(np.int64) - 128)
    q = np.zeros(64, dtype=np.int64)
    flat = coef.reshape(-1)
    qflat = qt.reshape(-1)
    for i in range(64):
        z = _ZIGZAG[i]
        c = int(flat[z])
        d = int(qflat[z])
        # symmetric rounding toward nearest, ties away from zero —
        # pure integer, mirrored nowhere (encode-only; decode just
        # multiplies back)
        q[i] = (c + (d // 2 if c >= 0 else -(d // 2))) // d
    diff = int(q[0]) - pred
    size, bits = _magnitude(diff)
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if q[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return int(q[0])


def _pad_plane(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate ``plane`` (h, w) to (ph, pw)."""
    h, w = plane.shape
    out = np.zeros((ph, pw), dtype=np.int64)
    out[:h, :w] = plane
    if ph > h:
        out[h:, :w] = plane[h - 1 : h, :]
    if pw > w:
        out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg(
    img: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    qt_16bit: bool = False,
) -> bytes:
    """Encode (h, w) or (h, w, 1|3) uint8 as a baseline JPEG with
    Annex-K tables: 4:4:4 by default, 4:2:0 (the dominant web
    profile — luma 2x2, chroma 2x2-box-mean downsampled) when
    ``subsample=True`` on 3-channel input.  ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (the
    error-resilience feature real encoders default on) — restart
    coding is LOSSLESS, so decoded pixels are identical either way.
    ``qt_16bit`` writes the quantization tables in Pq=1 16-bit form
    (r11) — the same values in the wider container encoding, so
    decoded pixels are identical to the Pq=0 stream while the 16-bit
    DQT parse path is exercised.  Pure integer; deterministic."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError(f"JPEG supports 1 or 3 channels, got {c}")
    full = _rgb_to_ycbcr(img) if c == 3 else img.astype(np.int64)
    # subsample: False/True ('420'), or one of '420'/'422' explicitly
    if subsample and c == 3:
        luma = (2, 1) if subsample == "422" else (2, 2)
        sampling = [luma, (1, 1), (1, 1)]
    else:
        sampling = [(1, 1)] * c
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for ci, (hi, vi) in enumerate(sampling):
        p = full[:, :, ci]
        if (hi, vi) != (hmax, vmax):
            # (fy x fx) integer box mean (round-half-up) after padding
            # the FULL plane to factor multiples — fx/fy in {1, 2}
            fx, fy = hmax // hi, vmax // vi
            pe = _pad_plane(
                p, (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
            )
            acc = np.zeros(
                (pe.shape[0] // fy, pe.shape[1] // fx), dtype=np.int64
            )
            for dy in range(fy):
                for dx in range(fx):
                    acc += pe[dy::fy, dx::fx]
            p = (acc + (fx * fy) // 2) // (fx * fy)
        planes.append(
            _pad_plane(p, mcus_y * 8 * vi, mcus_x * 8 * hi)
        )

    qt_luma = _scaled_qt(_QT_LUMA)
    qt_chroma = _scaled_qt(_QT_CHROMA)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (Pq=0 one-byte or Pq=1 big-endian two-byte entries)
    for tid, qt in ([(0, qt_luma)] + ([(1, qt_chroma)] if c == 3 else [])):
        zz = [int(qt.reshape(-1)[_ZIGZAG[i]]) for i in range(64)]
        if qt_16bit:
            z = b"".join(struct.pack(">H", v) for v in zz)
            out += (
                b"\xff\xdb" + struct.pack(">H", 131)
                + bytes([0x10 | tid]) + z
            )
        else:
            out += (
                b"\xff\xdb" + struct.pack(">H", 67)
                + bytes([tid]) + bytes(zz)
            )
    # SOF0
    comps = b""
    for cid in range(1, c + 1):
        hi, vi = sampling[cid - 1]
        qtid = 0 if cid == 1 else 1
        comps += bytes([cid, (hi << 4) | vi, qtid])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * c, 8, h, w, c) + comps
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if c == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tclass, (bits, vals) in tables:
        body = bytes([tclass]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # DRI (before SOS, per spec ordering)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([c])
    for cid in range(1, c + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    writer = _BitWriter()
    preds = [0] * c
    mcus_done = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                writer.emit_marker(0xD0 + rst_n)
                rst_n = (rst_n + 1) & 7
                preds = [0] * c
            mcus_done += 1
            for ci, (hi, vi) in enumerate(sampling):
                qt = qt_luma if ci == 0 else qt_chroma
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_component(
                            block, qt, dc, ac, writer, preds[ci]
                        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _quant_zigzag(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """FDCT + quantize one 8x8 spatial block -> 64 zigzag-ordered
    coefficients (the _encode_component arithmetic, exposed for the
    progressive encoder's two-pass scan script)."""
    coef = _fdct(block.astype(np.int64) - 128)
    q = np.zeros(64, dtype=np.int64)
    flat = coef.reshape(-1)
    qflat = qt.reshape(-1)
    for i in range(64):
        z = _ZIGZAG[i]
        c = int(flat[z])
        d = int(qflat[z])
        q[i] = (c + (d // 2 if c >= 0 else -(d // 2))) // d
    return q


def _encode_band(
    q: np.ndarray, ss: int, se: int, ac_codes: dict, writer: _BitWriter
) -> None:
    """Progressive AC band [ss..se] with Al=0: baseline run/size
    coding within the band, EOB (0x00) for the zero tail.  Annex-K
    tables carry no EOBn codes with r>0, so every EOB is a run of
    exactly one block — valid progressive (eobrun=1), decodable by any
    reader; our decoder still implements general EOBn."""
    last = ss - 1
    for i in range(se, ss - 1, -1):
        if q[i] != 0:
            last = i
            break
    run = 0
    for i in range(ss, last + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(bits, size)
        run = 0
    if last < se:
        code, ln = ac_codes[0x00]
        writer.write(code, ln)


def encode_jpeg_progressive(img: np.ndarray) -> bytes:
    """Encode (h, w) or (h, w, 1|3) uint8 as a PROGRESSIVE JPEG (SOF2,
    4:4:4 / grayscale) with the scan script real encoders use as their
    skeleton:

    1. DC scan, interleaved, successive approximation Al=1 (the
       point-transformed coarse image every progressive render shows
       first);
    2. DC refinement scan (Ah=1, Al=0 — one raw bit per block, no
       Huffman, per T.81 G.1.2.1);
    3. per component, AC spectral-selection scans 1-5 then 6-63.

    Same Annex-K tables and integer arithmetic as ``encode_jpeg``;
    the quantized coefficients are IDENTICAL to the baseline
    encoder's, so progressive-vs-baseline decode equality is a
    testable invariant (the transport differs, the math doesn't)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError(f"JPEG supports 1 or 3 channels, got {c}")
    full = _rgb_to_ycbcr(img) if c == 3 else img.astype(np.int64)
    bx_n = (w + 7) // 8
    by_n = (h + 7) // 8
    qt_luma = _scaled_qt(_QT_LUMA)
    qt_chroma = _scaled_qt(_QT_CHROMA)
    # pass 1: quantize every block of every component (zigzag order)
    qcoefs = []
    for ci in range(c):
        plane = _pad_plane(full[:, :, ci], by_n * 8, bx_n * 8)
        qt = qt_luma if ci == 0 else qt_chroma
        qc = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                qc[by, bx] = _quant_zigzag(
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qt
                )
        qcoefs.append(qc)

    out = bytearray(b"\xff\xd8")
    for tid, qt in ([(0, qt_luma)] + ([(1, qt_chroma)] if c == 3 else [])):
        z = bytes(int(qt.reshape(-1)[_ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + z
    comps = b""
    for cid in range(1, c + 1):
        comps += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * c, 8, h, w, c) + comps
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if c == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tclass, (bits, vals) in tables:
        body = bytes([tclass]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def _sos(comp_ids: list[int], tab_bytes: list[int], ss: int, se: int,
             ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, tb in zip(comp_ids, tab_bytes):
            body += bytes([cid, tb])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    dc_codes = [_canonical_codes(*(_DC_LUMA if ci == 0 else _DC_CHROMA))
                for ci in range(c)]
    ac_codes = [_canonical_codes(*(_AC_LUMA if ci == 0 else _AC_CHROMA))
                for ci in range(c)]

    # scan 1: DC first pass, Al=1, interleaved
    out += _sos(list(range(1, c + 1)),
                [0x00 if ci == 0 else 0x11 for ci in range(c)], 0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * c
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(c):
                tdc = int(qcoefs[ci][by, bx, 0]) >> 1
                diff = tdc - preds[ci]
                preds[ci] = tdc
                size, bits = _magnitude(diff)
                code, ln = dc_codes[ci][size]
                writer.write(code, ln)
                if size:
                    writer.write(bits, size)
    out += writer.flush()

    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    out += _sos(list(range(1, c + 1)), [0x00] * c, 0, 0, 1, 0)
    writer = _BitWriter()
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(c):
                writer.write(int(qcoefs[ci][by, bx, 0]) & 1, 1)
    out += writer.flush()

    # per-component AC spectral-selection scans
    for ci in range(c):
        for ss, se in ((1, 5), (6, 63)):
            out += _sos([ci + 1], [0x00 if ci == 0 else 0x11], ss, se, 0, 0)
            writer = _BitWriter()
            for by in range(by_n):
                for bx in range(bx_n):
                    _encode_band(
                        qcoefs[ci][by, bx], ss, se, ac_codes[ci], writer
                    )
            out += writer.flush()

    out += b"\xff\xd9"
    return bytes(out)


def _parse_dqt(seg: bytes, qts: dict[int, "np.ndarray"]) -> None:
    """One DQT segment -> quantization tables, both precisions
    (T.81 B.2.4.1): Pq=0 packs 64 one-byte entries, Pq=1 (r11 -
    previously loud-failed) packs 64 big-endian two-byte entries.
    Values land in the same int64 tables, so 16-bit quantizers flow
    through dequant/IDCT unchanged."""
    p = 0
    while p < len(seg):
        prec_id = seg[p]
        pq = prec_id >> 4
        tid = prec_id & 0x0F
        if pq not in (0, 1):
            raise ValueError(f"invalid DQT precision {pq}")
        width = 1 + pq
        z = seg[p + 1 : p + 1 + 64 * width]
        if len(z) != 64 * width:
            raise ValueError("truncated JPEG DQT segment")
        qt = np.zeros(64, dtype=np.int64)
        for i in range(64):
            if pq:
                qt[_ZIGZAG[i]] = (z[2 * i] << 8) | z[2 * i + 1]
            else:
                qt[_ZIGZAG[i]] = z[i]
        qts[tid] = qt.reshape(8, 8)
        p += 1 + 64 * width


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive (SOF2) decode: coefficient accumulation across
    scans, then one dequant + integer IDCT pass.  Supported envelope:
    4:4:4 / grayscale, spectral selection, DC successive approximation
    (first + refinement scans), general EOBn run decoding.  AC
    successive approximation (Ah>0 on an AC band) and subsampled
    progressive stay behind loud ``NotImplementedError`` — the honest
    frontier, matching the module docstring."""
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    comps: list[tuple] = []
    coefs: list[np.ndarray] = []
    bx_n = by_n = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected JPEG marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            _parse_dqt(seg, qts)
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tclass = seg[p]
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                tab = _decode_table(bits, vals)
                if tclass >> 4 == 0:
                    dc_tabs[tclass & 0x0F] = tab
                else:
                    ac_tabs[tclass & 0x0F] = tab
                p += 17 + n
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, qtid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, qtid))
            if not all(hi == vi == 1 for _c, hi, vi, _q in comps):
                raise NotImplementedError(
                    "progressive JPEG with subsampling not supported; "
                    "4:4:4 / grayscale only"
                )
            sof = (h, w, nc)
            bx_n = (w + 7) // 8
            by_n = (h + 7) // 8
            coefs = [
                np.zeros((by_n, bx_n, 64), dtype=np.int64) for _ in range(nc)
            ]
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", seg, 0)
            if ri:
                raise NotImplementedError(
                    "restart intervals in progressive scans not supported"
                )
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("progressive SOS before SOF2")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    j for j, (c_id, *_r) in enumerate(comps) if c_id == cid
                )
                scomps.append((ci, tsel >> 4, tsel & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            scan_start = pos + 2 + seglen
            reader = _BitReader(payload[scan_start:])
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                if ah == 0:
                    preds = [0] * len(scomps)
                    for by in range(by_n):
                        for bx in range(bx_n):
                            for si, (ci, dsel, _a) in enumerate(scomps):
                                size = reader.huff(dc_tabs[dsel])
                                diff = _extend(reader.bits(size), size)
                                preds[si] += diff
                                coefs[ci][by, bx, 0] = preds[si] << al
                else:
                    # refinement: one raw correction bit per block
                    # (bitwise OR is exact on two's-complement int64)
                    for by in range(by_n):
                        for bx in range(bx_n):
                            for ci, _d, _a in scomps:
                                coefs[ci][by, bx, 0] |= reader.bit() << al
            else:
                if ns != 1:
                    raise ValueError("progressive AC scan must be "
                                     "non-interleaved")
                if ah != 0:
                    raise NotImplementedError(
                        "AC successive approximation not supported"
                    )
                ci, _dsel, asel = scomps[0]
                ac_t = ac_tabs[asel]
                eobrun = 0
                for by in range(by_n):
                    for bx in range(bx_n):
                        if eobrun:
                            eobrun -= 1
                            continue
                        q = coefs[ci][by, bx]
                        k = ss
                        while k <= se:
                            rs = reader.huff(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.bits(r)
                                break
                            k += r
                            if k > se:
                                raise ValueError(
                                    "AC coefficient outside scan band"
                                )
                            q[k] = _extend(reader.bits(s), s) << al
                            k += 1
            # resume marker parsing at the next true marker after the
            # consumed entropy bytes (fill bits may leave a partial
            # final byte before it)
            p2 = scan_start + reader.pos
            while p2 + 1 < len(payload) and not (
                payload[p2] == 0xFF and payload[p2 + 1] not in (0x00,)
                and not (0xD0 <= payload[p2 + 1] <= 0xD7)
            ):
                p2 += 1
            pos = p2
            continue
        pos += 2 + seglen
    if sof is None or not coefs:
        raise ValueError("progressive JPEG missing SOF2/SOS")
    h, w, nc = sof
    qt_by_comp = [qts[qtid] for _cid, _h, _v, qtid in comps]
    planes = np.zeros((h, w, nc), dtype=np.int64)
    for ci in range(nc):
        plane = np.zeros((by_n * 8, bx_n * 8), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                coef = np.zeros(64, dtype=np.int64)
                for i in range(64):
                    coef[_ZIGZAG[i]] = coefs[ci][by, bx, i]
                block = _idct(coef.reshape(8, 8) * qt_by_comp[ci]) + 128
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    block, 0, 255
                )
        planes[:, :, ci] = plane[:h, :w]
    if nc == 3:
        return _ycbcr_to_rgb(planes)
    return planes.astype(np.uint8)


def _is_progressive(payload: bytes) -> bool:
    """Marker pre-walk: does the stream carry SOF2 before its first
    scan?  (Cheap offset arithmetic; segment bodies are skipped.)"""
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return False
        marker = payload[pos + 1]
        if marker in (0xC2, 0xDA, 0xD9):
            return marker == 0xC2
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        pos += 2 + seglen
    return False


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a JPEG to (h, w, c) uint8: baseline SOF0 (4:4:4 /
    grayscale / 4:2:0 / 4:2:2 / 4:4:0, DRI/RSTn) or progressive SOF2
    (spectral selection + DC successive approximation, 4:4:4 /
    grayscale).  Pure integer Huffman + dequant + IDCT —
    bit-deterministic.  Raises ``NotImplementedError`` for
    arithmetic coding, AC successive approximation, and unsupported
    sampling; ``ValueError`` for corrupt streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    if _is_progressive(payload):
        return _decode_progressive(payload)
    return _decode_baseline(payload)


def _decode_baseline(payload: bytes) -> np.ndarray:
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    comps = []
    scan = None
    scan_comps = []
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected JPEG marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qts)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass = seg[p]
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                tab = _decode_table(bits, vals)
                if tclass >> 4 == 0:
                    dc_tabs[tclass & 0x0F] = tab
                else:
                    ac_tabs[tclass & 0x0F] = tab
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, qtid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, qtid))
            samps = [(hi, vi) for _c, hi, vi, _q in comps]
            # supported profiles: all-1x1 (4:4:4 / grayscale), 4:2:0
            # (luma 2x2), and 4:2:2 / 4:4:0 (luma 2x1 / 1x2) — the MCU
            # machinery is general; these are the layouts whose
            # replication upsample is exact
            if not (
                all(s == (1, 1) for s in samps)
                or (
                    nc == 3
                    and samps[0] in ((2, 2), (2, 1), (1, 2))
                    and samps[1] == samps[2] == (1, 1)
                )
            ):
                raise NotImplementedError(
                    f"JPEG sampling {samps} requires imaging libraries; "
                    "4:4:4/grayscale, 4:2:0, 4:2:2, and 4:4:0 decode"
                )
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/extended/"
                "arithmetic) not supported; baseline SOF0 only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tsel >> 4, tsel & 0x0F))
            scan = payload[pos + 2 + seglen :]
            break
        pos += 2 + seglen
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, nc = sof
    sampling = [(hi, vi) for _c, hi, vi, _q in comps]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    reader = _BitReader(scan)
    comp_planes = [
        np.zeros((mcus_y * 8 * vi, mcus_x * 8 * hi), dtype=np.int64)
        for hi, vi in sampling
    ]
    preds = [0] * nc
    qt_by_comp = [qts[qtid] for _cid, _h, _v, qtid in comps]

    def _decode_block(ci: int) -> np.ndarray:
        _cid, dsel, asel = scan_comps[ci]
        dc_t, ac_t = dc_tabs[dsel], ac_tabs[asel]
        q = np.zeros(64, dtype=np.int64)
        size = reader.huff(dc_t)
        diff = _extend(reader.bits(size), size)
        preds[ci] += diff
        q[0] = preds[ci]
        k = 1
        while k < 64:
            rs = reader.huff(ac_t)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            size = rs & 0x0F
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            q[k] = _extend(reader.bits(size), size)
            k += 1
        coef = np.zeros(64, dtype=np.int64)
        for i in range(64):
            coef[_ZIGZAG[i]] = q[i]
        block = _idct(coef.reshape(8, 8) * qt_by_comp[ci]) + 128
        return np.clip(block, 0, 255)

    mcus_done = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                reader.sync_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds[:] = [0] * nc  # DC predictors reset per spec
            for ci, (hi, vi) in enumerate(sampling):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        comp_planes[ci][
                            y0 : y0 + 8, x0 : x0 + 8
                        ] = _decode_block(ci)
            mcus_done += 1
    # upsample subsampled components by pixel replication (integer,
    # deterministic) and assemble to (h, w, nc)
    planes = np.zeros((h, w, nc), dtype=np.int64)
    for ci, (hi, vi) in enumerate(sampling):
        p = comp_planes[ci]
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        planes[:, :, ci] = p[:h, :w]
    if nc == 3:
        return _ycbcr_to_rgb(planes)
    return planes.astype(np.uint8)


# ---------------------------------------------------------------------------
# Fixtures + the distributed operator (the png_features shape)
# ---------------------------------------------------------------------------


def make_jpeg_image(media_id: int) -> bytes:
    """Deterministic JPEG: smooth integer gradients (block-friendly —
    the content JPEG is FOR), cycling grayscale / RGB 4:4:4 (+DRI) /
    RGB 4:2:0 / RGB 4:2:2 / PROGRESSIVE / 16-bit-DQT 4:4:4 (r11) so
    every supported profile appears in every corpus."""
    variant = media_id % 6
    c = 1 if variant == 0 else 3
    w = 24 + (media_id * 7) % 40
    h = 24 + (media_id * 11) % 40
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    # triangular wave: continuous (no sawtooth wrap) — the smooth
    # content JPEG's DCT model is built for
    v = media_id * 17 + yy * 2 + xx * 3 + cc * 40
    img = (np.abs((v % 400) - 200) + 25).astype(np.uint8)
    if variant == 4:
        return encode_jpeg_progressive(img)
    # variant 1 also carries restart markers so every corpus exercises
    # the RSTn resync path end-to-end; variant 5 writes its quant
    # tables in Pq=1 16-bit form (identical values, wider encoding)
    subsample = {0: False, 1: False, 2: True, 3: "422", 5: False}[variant]
    return encode_jpeg(
        img,
        subsample=subsample,
        restart_interval=2 if variant == 1 else 0,
        qt_16bit=(variant == 5),
    )


def synthesize_jpeg_images(spark: SparkSession, n: int = 40) -> DataFrame:
    rows = [(i, "image", make_jpeg_image(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


JPEG_FEATURE_SCHEMA = T.StructType(
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


def jpeg_stats(payload: bytes) -> tuple:
    """Single-image feature row (shared by the operator and the
    locally-recomputed VALUES oracle) — the png_stats quantities over
    the DECODED pixels, proving the full Huffman+IDCT pipeline ran."""
    img = decode_jpeg(payload)
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


def jpeg_features(media: DataFrame) -> DataFrame:
    """Distributed JPEG decode + feature extraction: Arrow batches in,
    one integer-stats row per image out.  Pure projection (no
    shuffle); the decode is the real Huffman + dequant + integer IDCT,
    not a header peek."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h, w, c, mean_e2, edge, ck = jpeg_stats(bytes(payload))
                rows.append((int(mid), w, h, c, mean_e2, edge, ck))
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, JPEG_FEATURE_SCHEMA)
