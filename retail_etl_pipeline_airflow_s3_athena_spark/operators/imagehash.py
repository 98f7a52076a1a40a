"""Image near-duplicate detection via perceptual difference hash
(dHash), banded like SimHash for sub-quadratic pairing (r7 verdict
#8 — closes the dedup × multimodal cell).

dHash (Krawetz 2013, "Kind of Like That"): downscale to a fixed tiny
luma grid and record, for each horizontally adjacent pair, whether
brightness increases.  Every step is integer arithmetic —
nearest-neighbor index math ``(i·src) div dst``, the BT.601 integer
luma ``(299·R + 587·G + 114·B) div 1000``, and comparisons — so the
60-bit signature is hash-exact across engines, partitionings, and
numpy versions, and invariant to global brightness shifts (a constant
offset cancels in every adjacent comparison — the property that makes
it a PERCEPTUAL hash rather than a byte checksum).

Grid: 11×6 luma → 10 comparisons × 6 rows = 60 bits, matching the
SimHash discipline (BIGINT-safe, 4×15-bit pigeonhole bands at the
default max_hamming=3: d bit flips can dirty at most d of d+1 bands,
so any pair within distance d agrees exactly on ≥1 band and candidate
generation is an equi-join on (band, bits) — 2^15 buckets/band keeps
occupancy O(n/32768), never all-pairs).

Scale shape: one decode pass (Arrow mapInPandas — the only Python,
justified: inflate/defilter needs byte loops), then pure relational
banding/join/bit_count.  Decode accepts MM02 raw buffers, real PNG
payloads (operators/png.py), AND real baseline JPEG payloads
(operators/jpeg.py) through multimodal._decode_raw — one hash space
across all three containers.

Oracle: hybrid (the BPE pattern) — signatures are supplied as a
locally-recomputed VALUES literal (DuckDB can't inflate PNG), and the
banding semantics' ground truth — all-pairs bit_count(xor) ≤ d — runs
as REAL SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_etl_pipeline_airflow_s3_athena_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_raw,
    make_raw_image,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.png import encode_png

GRID_W = 11  # luma columns -> GRID_W - 1 = 10 bits per row
GRID_H = 6   # rows -> 60 bits total (BIGINT-safe, SimHash discipline)
DHASH_BITS = (GRID_W - 1) * GRID_H
MAX_HAMMING = 3

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def dhash_of_image(img: np.ndarray) -> int:
    """The 60-bit dHash of one decoded (h, w, c) image array — the
    grid/luma/comparison core, shared with the video-frame hasher
    (operators/videodup.py)."""
    img = img.astype(np.int64)
    h, w, c = img.shape
    if c >= 3:
        luma = (299 * img[:, :, 0] + 587 * img[:, :, 1]
                + 114 * img[:, :, 2]) // 1000
    else:
        luma = img[:, :, 0]
    iy = (np.arange(GRID_H) * h) // GRID_H
    ix = (np.arange(GRID_W) * w) // GRID_W
    g = luma[iy][:, ix]
    sig = 0
    for y in range(GRID_H):
        for x in range(GRID_W - 1):
            if g[y, x + 1] > g[y, x]:
                sig |= 1 << (y * (GRID_W - 1) + x)
    return sig


def dhash64(payload: bytes) -> int:
    """The 60-bit dHash of one image payload (MM02 raw or PNG).
    Shared by the distributed operator and the VALUES oracle."""
    return dhash_of_image(_decode_raw(payload))


def dhash_signatures(media: DataFrame) -> DataFrame:
    """(media_id, dhash): one decode pass, Arrow batch at a time —
    pure projection, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (int(mid), dhash64(bytes(payload)))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in DHASH_SCHEMA.fields]
            )

    return media.mapInPandas(batches, DHASH_SCHEMA)


def image_near_dup(
    media: DataFrame, max_hamming: int = MAX_HAMMING
) -> DataFrame:
    """(id_a, id_b, hamming): image pairs within dHash Hamming
    distance ``max_hamming``, via the pigeonhole band join (the
    ``simhash_near_dup`` plan restated over the decoded-image
    signature)."""
    n_bands = max_hamming + 1
    base, rem = divmod(DHASH_BITS, n_bands)
    widths = [base + (1 if b < rem else 0) for b in range(n_bands)]
    offsets = [sum(widths[:b]) for b in range(n_bands)]
    sig = dhash_signatures(media)
    bands = sig.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("dhash", offsets[b])
                        .bitwiseAND(F.lit((1 << widths[b]) - 1))
                        .alias("bits"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("media_id", "dhash", "b.band", "b.bits")
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.bit_count(
        F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Fixtures: a mixed raw/PNG/JPEG corpus with PLANTED near-duplicates
# ---------------------------------------------------------------------------

def make_image_payload(media_id: int) -> bytes:
    """Deterministic mixed-format corpus: every 4th image is a
    near-duplicate of its predecessor (same pixels +8 brightness,
    clipped — dHash-invariant except at clip saturation), and formats
    cycle raw-MM02 / PNG / baseline JPEG so all three decode paths
    feed one hash space.  Pair bases are JPEG (lossy), variants are
    lossless re-encodes of the DECODED base — the realistic shape of
    web-scraped duplicates."""
    if media_id % 4 == 3:
        base = _decode_raw(make_image_payload(media_id - 1)).astype(
            np.int64
        )
        if media_id % 8 == 7:
            # every other planted pair also takes a LOCAL edit (a
            # darkened patch) so the corpus exercises nonzero-but-
            # small Hamming distances, not just exact perceptual
            # matches
            h, w, _ = base.shape
            base[h // 3 : h // 2, w // 2 :] -= 60
            base = np.maximum(base, 0)
        bright = np.minimum(base + 8, 255).astype(np.uint8)
        if (media_id // 4) % 2 == 0:
            return encode_png(bright)  # cross-format near-dup pair
        import struct as _struct

        from retail_etl_pipeline_airflow_s3_athena_spark.operators.multimodal import RAW_MAGIC

        h, w, c = bright.shape
        return RAW_MAGIC + _struct.pack("<III", w, h, c) + bright.tobytes()
    if media_id % 4 == 2:
        # JPEG leg (lossy, 3-channel): every planted pair therefore has
        # a JPEG base with a LOSSLESS +8 variant derived from the
        # DECODED jpeg pixels — cross-format, cross-codec dedup.  The
        # hash space stays one space because dhash64 runs on decoded
        # pixels regardless of container.
        from retail_etl_pipeline_airflow_s3_athena_spark.operators.jpeg import encode_jpeg

        return encode_jpeg(_decode_raw(make_raw_image(media_id)))
    if media_id % 2 == 1:
        # PNG leg: force 3 channels so brightness variants keep shape
        img = _decode_raw(make_raw_image(media_id))
        return encode_png(img)
    return make_raw_image(media_id)


def synthesize_image_corpus(spark: SparkSession, n: int = 48) -> DataFrame:
    rows = [(i, "image", make_image_payload(i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def oracle_image_near_dup_values(
    n: int = 48, max_hamming: int = MAX_HAMMING
) -> str:
    """Hybrid oracle: locally-recomputed signature VALUES + the
    all-pairs ground truth (banding is Spark's physical strategy; the
    SEMANTICS are bit_count(xor) <= d, exactly the simhash twin)."""
    sig_rows = ", ".join(
        f"({i}, {dhash64(make_image_payload(i))})" for i in range(n)
    )
    return f"""
        WITH sig(media_id, dhash) AS (VALUES {sig_rows})
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
    """
