"""WAV container + IMA-ADPCM codec (operators/wav.py)."""

from __future__ import annotations

import numpy as np
import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import wav as W


def _wave(n=3001, period=47, amp=9000):
    i = np.arange(n, dtype=np.int64)
    return (np.abs((i % period) * 2 - period) * amp) // period - amp // 2


def test_pcm_container_roundtrip_exact():
    x = _wave()
    r, c, y = W.decode_wav(W.write_wav(x, 16000, "pcm16"))
    assert (r, c) == (16000, "pcm16")
    assert (x == y).all()


def test_adpcm_roundtrip_bounded_error_and_compression():
    """ADPCM is lossy by spec: reconstruction error stays bounded
    (attack transients adapt within the step table) and the payload is
    ~4x smaller than PCM16 (4-bit nibbles + block headers)."""
    x = _wave()
    pcm = W.write_wav(x, 16000, "pcm16")
    adp = W.write_wav(x, 16000, "ima_adpcm")
    assert len(adp) < 0.3 * len(pcm)
    r, c, y = W.decode_wav(adp)
    assert (r, c) == (16000, "ima_adpcm") and len(y) == len(x)
    err = np.abs(x - y)
    assert int(err.max()) < 2000
    assert float(err.mean()) < 100


def test_adpcm_decode_deterministic():
    p = W.write_wav(_wave(1777, 31, 12000), 8000, "ima_adpcm")
    a = W.decode_wav(p)[2]
    b = W.decode_wav(p)[2]
    assert a.tobytes() == b.tobytes()


def test_blocks_are_independent():
    """Decoding a block never needs prior-block state: re-decoding any
    single block in isolation reproduces its slice of the full decode
    — the property that makes ADPCM decode parallel at block
    granularity at 100 TB."""
    x = _wave(2600, 39, 15000)
    w = W.parse_wav(W.write_wav(x, 16000, "ima_adpcm"))
    full = W._decode_ima_blocks(w["data"], w["block_align"], w["n_samples"])
    spb = 1 + (w["block_align"] - 4) * 2
    blk = 2
    block = w["data"][blk * w["block_align"]:(blk + 1) * w["block_align"]]
    alone = W._decode_ima_block(block, spb)
    assert (full[blk * spb:(blk + 1) * spb] == alone).all()


def test_loud_fail_frontier():
    with pytest.raises(NotImplementedError):
        W.parse_wav(b"OggS" + b"\x00" * 64)
    # an unimplemented format tag (MP3 = 85) must fail loudly
    import struct
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 2) + b"\x00\x00"
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        W.parse_wav(payload)


def test_distributed_matches_local(spark):
    """The mapInPandas operator reproduces the local single-process
    decode bit-for-bit on a mixed PCM/ADPCM corpus."""
    media = W.synthesize_wav_corpus(spark, n=24)
    got = {
        r["media_id"]: tuple(r)[1:]
        for r in W.wav_features(media).collect()
    }
    for mid in range(24):
        assert got[mid] == W.wav_stats(W.make_wav_clip(mid))


def test_goertzel_detects_the_right_band():
    """A pure tone at m/64 cycles/sample concentrates energy in band m
    — the Goertzel filter really is frequency-selective, not just a
    deterministic scrambler."""
    import math

    n = 2048
    x = [int(10000 * math.sin(2 * math.pi * 4 * i / 64)) for i in range(n)]
    energies = {m: W.band_energy(x, c) for m, c in W.GOERTZEL_BANDS}
    assert energies[4] > 100 * max(e for m, e in energies.items() if m != 4)


def test_band_energy_deterministic_and_distributed(spark):
    media = W.synthesize_wav_corpus(spark, n=12)
    got = {}
    for r in W.wav_band_energy(media).collect():
        got.setdefault(r["media_id"], []).append(
            (r["codec"], r["channel"], r["band_m"], r["energy"])
        )
    for mid in range(12):
        assert sorted(got[mid]) == sorted(
            W.wav_band_stats(W.make_wav_clip(mid))
        )
        # stereo fixture variants carry both channels
        expect_rows = 8 if mid % 4 >= 2 else 4
        assert len(got[mid]) == expect_rows


def test_audio_fingerprint_survives_adpcm_transcode():
    """The dominant-band fingerprint of a clip and its lossy ADPCM
    transcode agree within the Hamming budget (here: exactly — ADPCM
    perturbs magnitudes, not the >2x dominant-band ordering), while
    the payload BYTES differ."""
    import numpy as np

    x = np.zeros(W.FP_WINDOW * 32, dtype=np.int64)
    t = np.arange(W.FP_WINDOW)
    for wi in range(32):
        m = (1, 2, 4, 8)[(wi * 3 + 1) % 4]
        period = 64 // m
        tri = np.abs(((t + wi) % period) * 2 - period)
        x[wi * W.FP_WINDOW:(wi + 1) * W.FP_WINDOW] = (tri * 9000) // period - 4500
    pcm = W.write_wav(x, 16000, "pcm16")
    adp = W.write_wav(x, 16000, "ima_adpcm")
    assert pcm != adp
    d = bin(W.audio_fingerprint(pcm) ^ W.audio_fingerprint(adp)).count("1")
    assert d <= W.AUDIO_MAX_HAMMING


def test_audio_near_dup_finds_exactly_planted_pairs(spark):
    media = W.synthesize_audio_dup_corpus(spark, n=30)
    got = sorted((r["id_a"], r["id_b"]) for r in W.audio_near_dup(media).collect())
    expect = sorted((2 * s, 2 * s + 1) for s in range(15) if s % 3 != 2)
    assert got == expect


def test_stereo_roundtrips_and_downmix_rule():
    """r11: interleaved stereo — PCM16 exact round-trip, ADPCM
    bounded-error round-trip with independent per-channel recurrences,
    and decode_wav's exact integer downmix (identity on duplicated
    channels)."""
    import numpy as np

    n = 2600
    i = np.arange(n, dtype=np.int64)
    period = 52
    tri = np.abs((i % period) * 2 - period)
    left = (tri * 11000) // period - 5500
    right = ((np.abs(((i + 17) % period) * 2 - period)) * 8000) // period - 4000
    st = np.stack([left, right], axis=1)

    _, codec, fr = W.decode_wav_frames(W.write_wav(st, 16000, "pcm16"))
    assert codec == "pcm16" and fr.shape == (n, 2) and (fr == st).all()

    _, codec, fa = W.decode_wav_frames(W.write_wav(st, 16000, "ima_adpcm"))
    assert codec == "ima_adpcm" and fa.shape == (n, 2)
    assert int(np.abs(fa - st).max()) < 2000
    # channel independence: a mono encode of each channel with the
    # SAME samples-per-block (stereo 256-byte blocks carry 249 frames
    # per channel = mono 128-byte blocks) reproduces the stereo
    # channel decode exactly — same quantizer, same per-channel state
    for c in range(2):
        _, _, ym = W.decode_wav(
            W.write_wav(st[:, c], 16000, "ima_adpcm", block_align=128)
        )
        assert (ym == fa[:, c]).all()

    _, _, dm = W.decode_wav(W.write_wav(st, 16000, "pcm16"))
    assert (dm == st.sum(axis=1) // 2).all()
    dup = np.stack([left, left], axis=1)
    _, _, dmx = W.decode_wav(W.write_wav(dup, 16000, "pcm16"))
    assert (dmx == left).all()


def test_stereo_remaster_lands_in_near_dup_budget():
    """A mono clip and its stereo re-master (attenuated right channel)
    fingerprint within the Hamming budget via the downmix — the
    mono-vs-stereo transcode case audio_near_dup now covers."""
    # pair_seed 1, 3 are the stereo-remaster planted pairs in the
    # fixture corpus (planted and pair_seed odd)
    for ps in (1, 3):
        a, b = 2 * ps, 2 * ps + 1
        pa = W.make_audio_dup_corpus_clip(a)
        pb = W.make_audio_dup_corpus_clip(b)
        assert W.parse_wav(pa)["channels"] == 1
        assert W.parse_wav(pb)["channels"] == 2
        d = bin(W.audio_fingerprint(pa) ^ W.audio_fingerprint(pb)).count("1")
        assert d <= W.AUDIO_MAX_HAMMING
