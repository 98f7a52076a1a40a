"""Perceptual image dedup: dHash brightness invariance, the planted
cross-format duplicate pairs, banding recall vs all-pairs truth, and
the DuckDB hybrid oracle.

Reference scope: none — extension coverage closing the dedup ×
multimodal cell (r7 verdict #8)."""

from __future__ import annotations

import duckdb
import numpy as np

from retail_etl_pipeline_airflow_s3_athena_spark.operators import imagehash as ih
from retail_etl_pipeline_airflow_s3_athena_spark.operators import multimodal as mm
from retail_etl_pipeline_airflow_s3_athena_spark.operators import png


def test_dhash_brightness_invariance_and_locality():
    img = mm._decode_raw(mm.make_raw_image(5)).astype(np.int64)
    base = ih.dhash64(mm.make_raw_image(5))
    # +20 global brightness (clipped) leaves the hash unchanged
    bright = np.minimum(img + 20, 255).astype(np.uint8)
    assert ih.dhash64(png.encode_png(bright)) == base
    # an unrelated image is FAR (> max_hamming)
    other = ih.dhash64(mm.make_raw_image(6))
    assert bin(base ^ other).count("1") > ih.MAX_HAMMING
    assert 0 <= base < (1 << ih.DHASH_BITS)


def test_same_pixels_hash_equal_across_formats():
    """The multimodal-dedup story: one image stored as raw MM02 and
    as PNG must collide exactly."""
    raw = mm.make_raw_image(9)
    as_png = png.encode_png(mm._decode_raw(raw))
    assert ih.dhash64(raw) == ih.dhash64(as_png)


def test_banded_join_finds_exactly_the_planted_pairs(spark):
    media = ih.synthesize_image_corpus(spark, n=48)
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in ih.image_near_dup(media).collect()
    )
    # ground truth: all-pairs over locally-computed signatures.
    # Pigeonhole banding is EXACT for d <= max_hamming (not
    # probabilistic like MinHash), so got == truth, not just superset.
    sigs = {i: ih.dhash64(ih.make_image_payload(i)) for i in range(48)}
    want = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in range(48)
        for b in range(a + 1, 48)
        if bin(sigs[a] ^ sigs[b]).count("1") <= ih.MAX_HAMMING
    )
    assert got == want
    assert len(got) == 12  # the planted pairs, nothing else
    hams = {h for _, _, h in got}
    # exact perceptual matches AND nonzero (locally-edited / JPEG-base)
    # distances both present, all within the band guarantee
    assert 0 in hams and max(hams) <= ih.MAX_HAMMING
    assert any(h > 0 for h in hams)


def test_oracle_values_twin_matches_duckdb():
    sql = ih.oracle_image_near_dup_values(n=48)
    rows = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    sigs = {i: ih.dhash64(ih.make_image_payload(i)) for i in range(48)}
    want = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in range(48)
        for b in range(a + 1, 48)
        if bin(sigs[a] ^ sigs[b]).count("1") <= ih.MAX_HAMMING
    )
    assert rows == want
