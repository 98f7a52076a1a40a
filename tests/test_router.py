"""Unified media routing (operators/router.py)."""

from __future__ import annotations

from retail_etl_pipeline_airflow_s3_athena_spark.operators import router as R


def test_sniff_classifies_every_class():
    kinds = {R.sniff_media(bytes(p)) for _i, p in R._mixed_payloads(72)}
    assert kinds == {
        "raw_image", "raw_audio", "raw_video", "png", "jpeg_baseline",
        "jpeg_progressive", "gif", "bmp", "wav", "avi_mjpeg", "unknown",
    }


def test_checksum_proves_decode_not_header_peek():
    """Corrupting ONE payload byte past the header changes the routed
    checksum for a compressed format (the decode really ran)."""
    payload = bytearray(R._mixed_payloads(10)[3][1])  # a PNG
    assert R.sniff_media(bytes(payload)) == "png"
    k0, u0, c0 = R.decode_any(bytes(payload))
    # flip a bit deep in the zlib stream: decode either changes pixels
    # or fails loudly — never returns the same checksum silently
    try:
        payload[len(payload) // 2] ^= 0x40
        k1, u1, c1 = R.decode_any(bytes(payload))
        assert (k1, u1) == (k0, u0)
        assert c1 != c0
    except Exception:
        pass  # loud failure is equally acceptable


def test_unknown_tail_is_counted_not_fatal():
    kind, units, ck = R.decode_any(b"certainly not a media payload")
    assert kind == "unknown" and units == 0 and ck > 0


def test_distributed_census_matches_local(spark):
    media = R.synthesize_mixed_corpus(spark, n=72)
    got = [tuple(r) for r in R.media_type_census(media).collect()]
    want = [(k, n, u, fold) for k, n, u, fold in R.local_census(72)]
    assert got == want
    assert len(got) == 11
