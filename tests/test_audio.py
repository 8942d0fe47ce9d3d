"""G.711 µ-law/A-law and IMA-ADPCM WAV codecs: table properties, exact
round trips at the formats' fixed points, lossy-tracking bounds,
rejection surfaces, and the Spark synth -> features chain (the
multimodal_audio oracle covers corpus-level value parity)."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_minhash_lsh_spark.multimodal import audio as A
from mapreduce_minhash_lsh_spark.multimodal import binary as B

RNG = np.random.RandomState(20262)


def test_mulaw_table_roundtrip_with_two_zeros_alias():
    for c in range(256):
        if c == 127:
            continue
        assert A.mulaw_encode(A.mulaw_decode(c)) == c
    # the classic µ-law quirk: two codes decode to 0; re-encode is canonical
    assert A.mulaw_decode(127) == 0 and A.mulaw_decode(255) == 0
    assert A.mulaw_encode(0) == 255


def test_alaw_table_roundtrip_complete():
    for c in range(256):
        assert A.alaw_encode(A.alaw_decode(c)) == c


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_symmetric_negatives(law):
    table = A.MULAW_DECODE if law == "mulaw" else A.ALAW_DECODE
    for c in range(256):
        assert table[c ^ 0x80] == -table[c]


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_wav_roundtrip_exact_at_decode_points(law):
    table = A.MULAW_DECODE if law == "mulaw" else A.ALAW_DECODE
    vals = np.array([table[c] for c in RNG.randint(0, 256, 500)], dtype=np.int16)
    rate, ch, out = A.wav_samples(A.make_wav_g711(vals, 8000, law))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out, vals)


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_quantization_error_is_logarithmic(law):
    sig = RNG.randint(-30000, 30000, 2000).astype(np.int16)
    _, _, dec = A.wav_samples(A.make_wav_g711(sig, 8000, law))
    err = np.abs(dec.astype(np.int64) - sig.astype(np.int64))
    rel = err / np.maximum(np.abs(sig.astype(np.int64)), 1)
    # G.711 segments quantize at ~1/16 relative resolution
    assert float(np.median(rel)) < 0.04
    assert float(err.max()) <= 2048  # top-segment step ceiling


def test_adpcm_constant_is_fixed_point():
    const = np.full(1500, 1234, dtype=np.int16)
    rate, ch, out = A.wav_samples(A.make_wav_adpcm(const, 8000))
    assert (rate, ch) == (8000, 1)
    assert len(out) == 1500  # fact chunk trims block padding
    assert np.all(out == 1234)
    assert A.decode_wav_ex(A.make_wav_adpcm(const, 8000))[3] == 1234.0


def test_adpcm_tracks_a_sine():
    sig = (3000 * np.sin(np.arange(2000) * 0.05)).astype(np.int16)
    _, _, dec = A.wav_samples(A.make_wav_adpcm(sig, 8000))
    err = np.abs(dec[: len(sig)].astype(np.int64) - sig.astype(np.int64))
    assert float(err.mean()) < 50  # adaptive step keeps up with the slope


def test_adpcm_multiblock_lengths():
    # spb = (256-4)*2 + 1 = 505; cross several block boundaries
    sig = RNG.randint(-500, 500, 505 * 3 + 17).astype(np.int16)
    _, _, dec = A.wav_samples(A.make_wav_adpcm(sig, 8000))
    assert len(dec) == len(sig)
    # block headers restart the predictor at the true sample
    assert dec[0] == sig[0] and dec[505] == sig[505] and dec[1010] == sig[1010]


def test_pcm_parity_with_legacy_decoder():
    blob = B.make_wav(np.array([100, -100] * 50, dtype=np.int16), 8000)
    assert A.decode_wav_ex(blob) == B.decode_wav(blob)


def test_rejection_surfaces():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        A.wav_samples(b"ID3\x03mp3 frames pretend to live here")
    # foreign format tag (e.g. 0x0055 = MPEG layer 3 in WAV)
    import struct

    fmt = struct.pack("<HHIIHHH", 0x0055, 1, 8000, 8000, 1, 0, 0)
    blob = A._wav_wrap(fmt, b"\x00" * 8, None)
    with pytest.raises(NotImplementedError, match="0x0055"):
        A.wav_samples(blob)
    # stereo ADPCM out of scope
    fmt = struct.pack("<HHIIHHHH", A.WAVE_IMA_ADPCM, 2, 8000, 8000, 256, 4, 2, 505)
    blob = A._wav_wrap(fmt, b"\x00" * 256, 100)
    with pytest.raises(ValueError, match="mono"):
        A.wav_samples(blob)


def test_spark_audio_chain(spark):
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    rows = {
        r["id"]: r
        for r in B.extract_media_features(B.synth_audio_media(docs)).collect()
    }
    assert len(rows) == 8
    for did, r in rows.items():
        assert r["media_type"] == "audio/wav"
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == 1000 + (did % 50) * 8
    assert rows[0]["rms"] == 1.0          # PCM amp 1
    assert rows[3]["rms"] == 4.0          # ADPCM const 1 + 3 % 2000
    assert rows[1]["rms"] == abs(A.MULAW_DECODE[16 + 1])
    assert rows[2]["rms"] == abs(A.ALAW_DECODE[16 + 2])


# ---------------------------------------------------------------------------
# AIFF + Sun AU containers (round 10, session 4)
# ---------------------------------------------------------------------------


def test_f80_roundtrip_common_rates():
    from mapreduce_minhash_lsh_spark.multimodal.audio import _f80_decode, _f80_encode

    for rate in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 1):
        assert _f80_decode(_f80_encode(rate)) == rate


def test_aiff_pcm_roundtrip():
    from mapreduce_minhash_lsh_spark.multimodal.audio import aiff_samples, make_aiff

    x = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    rate, ch, y = aiff_samples(make_aiff(x, 44100))
    assert (rate, ch) == (44100, 1)
    assert np.array_equal(x, y)


def test_au_pcm_and_mulaw_roundtrip():
    from mapreduce_minhash_lsh_spark.multimodal.audio import (
        MULAW_DECODE,
        au_samples,
        make_au,
    )

    x = np.array([0, 5000, -5000, 123], dtype=np.int16)
    rate, ch, y = au_samples(make_au(x, 8000, "pcm16"))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(x, y)
    # mu-law: decode points survive the lossy trip exactly
    pts = np.array([MULAW_DECODE[16], MULAW_DECODE[16 ^ 0x80]], dtype=np.int16)
    _, _, z = au_samples(make_au(pts, 8000, "mulaw"))
    assert np.array_equal(pts, z)


def test_aiff_au_reject_foreign_bytes():
    import pytest

    from mapreduce_minhash_lsh_spark.multimodal.audio import aiff_samples, au_samples

    with pytest.raises(ValueError, match="FORM/AIFF"):
        aiff_samples(b"RIFF0000WAVE")
    with pytest.raises(ValueError, match="snd magic"):
        au_samples(b"FORM0000AIFF")
    with pytest.raises(NotImplementedError, match="AU encoding"):
        # encoding 27 = A-law AU variant we don't ship
        import struct
        au_samples(b".snd" + struct.pack(">IIIII", 24, 4, 27, 8000, 1) + b"\0\0\0\0")
