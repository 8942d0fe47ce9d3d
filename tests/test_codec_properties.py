"""Hypothesis property tests for the round-10 codecs: VP8L, G.711,
IMA-ADPCM, FLAC, MP4 and BPE — randomized round-trip/invariant checks
on top of the deterministic fixtures in their per-codec test files."""

from __future__ import annotations

import os

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_minhash_lsh_spark.functions import bpe
from mapreduce_minhash_lsh_spark.multimodal import audio as A
from mapreduce_minhash_lsh_spark.multimodal import flac as FL
from mapreduce_minhash_lsh_spark.multimodal import mp4 as M
from mapreduce_minhash_lsh_spark.multimodal import webp as W

# default is a fast CI budget; CODEC_PROP_MAX_EXAMPLES elevates it for
# the per-round deep fuzz run recorded in experiments/results_r*.json
FAST = settings(
    max_examples=int(os.environ.get("CODEC_PROP_MAX_EXAMPLES", "20")),
    deadline=None,
)


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
    # full palette-size range: covers every bundling width (8/4/2 px per
    # byte and the 8-bit no-bundling path) — the r10 bug hid at ncol>=4
    # on narrow images, where all bundled symbols were equiprobable and
    # the code-length code collapsed to a single symbol
    ncol = rnd.randrange(1, 257)
    vals = np.array(
        [[rnd.randrange(256) for _ in range(3)] for _ in range(ncol)], dtype=np.uint8
    )
    arr = vals[np.array([[rnd.randrange(ncol) for _ in range(w)] for _ in range(h)])]
    assert np.array_equal(W.webp_pixels(W.encode_vp8l(arr, palette=True)), arr)


def _palette_img(h, w, ncol):
    """Deterministic image with exactly min(ncol, h*w) distinct colors,
    indices cycling — makes bundled symbols equiprobable, the shape that
    collapses the code-length code to a single symbol."""
    ncol = min(ncol, h * w)
    colors = np.stack(
        [(np.arange(ncol) * 37) % 256, (np.arange(ncol) * 91) % 256,
         (np.arange(ncol) * 53) % 256], axis=1,
    ).astype(np.uint8)
    return colors[(np.arange(h * w) % ncol).reshape(h, w)]


def test_vp8l_palette_regression_matrix():
    """Fixed repro matrix for the r10 single-CL-symbol desync: w=1 with
    >=4 palette colors, and 8-bit palettes (ncol=32) at w=8/9 — every
    cell raised 'VP8L: bitstream truncated' before the fix."""
    cases = [(4, 1, n) for n in (4, 5, 16, 17, 32, 64, 128, 256)]
    cases += [(4, w, 32) for w in (8, 9)]
    cases += [(4, 1, 2), (4, 1, 3), (1, 1, 1)]  # never-broken edges
    for h, w, ncol in cases:
        arr = _palette_img(h, w, ncol)
        out = W.webp_pixels(W.encode_vp8l(arr, palette=True))
        assert np.array_equal(out, arr), (h, w, ncol)


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
