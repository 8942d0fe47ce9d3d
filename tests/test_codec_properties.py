"""Hypothesis property tests for the round-10 codecs: VP8L, G.711,
IMA-ADPCM, FLAC, MP4 and BPE — randomized round-trip/invariant checks
on top of the deterministic fixtures in their per-codec test files."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_minhash_lsh_spark.functions import bpe
from mapreduce_minhash_lsh_spark.multimodal import audio as A
from mapreduce_minhash_lsh_spark.multimodal import flac as FL
from mapreduce_minhash_lsh_spark.multimodal import mp4 as M
from mapreduce_minhash_lsh_spark.multimodal import webp as W

FAST = settings(max_examples=20, deadline=None)


@FAST
@given(
    st.integers(1, 9), st.integers(1, 9), st.integers(0, 3),
    st.randoms(use_true_random=False),
)
def test_vp8l_roundtrip_random_images(h, w, mode, rnd):
    arr = np.array(
        [[[rnd.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)],
        dtype=np.uint8,
    )
    kw = [{}, {"subtract_green": True}, {"cache_bits": 3},
          {"predictor": rnd.randrange(14)}][mode]
    assert np.array_equal(W.webp_pixels(W.encode_vp8l(arr, **kw)), arr)


@FAST
@given(st.integers(1, 4), st.integers(1, 40), st.randoms(use_true_random=False))
def test_vp8l_palette_roundtrip(h, w, rnd):
    ncol = rnd.randrange(1, 17)
    vals = np.array(
        [[rnd.randrange(256) for _ in range(3)] for _ in range(ncol)], dtype=np.uint8
    )
    arr = vals[np.array([[rnd.randrange(ncol) for _ in range(w)] for _ in range(h)])]
    assert np.array_equal(W.webp_pixels(W.encode_vp8l(arr, palette=True)), arr)


@FAST
@given(st.integers(-32768, 32767))
def test_g711_quantizes_within_segment(x):
    for enc, dec in ((A.mulaw_encode, A.mulaw_decode), (A.alaw_encode, A.alaw_decode)):
        y = dec(enc(x))
        # logarithmic companding: error bounded by the top-segment step
        assert abs(y - x) <= 1024 + abs(x) / 16


@FAST
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=600))
def test_adpcm_decode_matches_encoder_state(samples):
    """The decoder must reproduce the encoder's internal reconstruction
    exactly (ADPCM is lossy vs the INPUT, lossless vs the state
    machine)."""
    sig = np.array(samples, dtype=np.int16)
    _, _, out = A.wav_samples(A.make_wav_adpcm(sig, 8000, block_align=64))
    assert len(out) == len(sig)
    pred, idx = int(sig[0]), 0
    expect = [pred]
    for x in sig[1:]:
        n, pred, idx = A._ima_encode_sample(int(x), pred, idx)
        expect.append(pred)
        if len(expect) == (64 - 4) * 2 + 1:  # block restart
            break
    assert out[: len(expect)].tolist() == expect


@FAST
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=2000))
def test_flac_roundtrip_any_signal(samples):
    sig = np.array(samples, dtype=np.int16)
    _, _, out = FL.flac_samples(FL.encode_flac(sig, 8000, block_size=256))
    assert np.array_equal(out, sig)


@FAST
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=20))
def test_mp4_frames_roundtrip(frames):
    blob = M.make_mp4(frames)
    assert M.mp4_frames(blob) == frames
    assert M.probe_mp4(blob)["tracks"][0]["n_samples"] == len(frames)


@FAST
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=24))
def test_bpe_encode_lossless_any_word(word):
    assert "".join(bpe.encode_word(word, bpe.BPE_MERGES)) == word
