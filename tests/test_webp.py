"""VP8L (lossless WebP) codec: exact round trips across every encoder
mode, plus handcrafted foreign bitstreams for the decode-only paths the
fixture encoder never emits (LZ77 backrefs, cross-color transform,
meta-Huffman groups, RLE code lengths), the libwebp distance-map pin,
and the Spark-side synth -> resize -> features chain."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_minhash_lsh_spark.multimodal import binary as B
from mapreduce_minhash_lsh_spark.multimodal import webp as W


RNG = np.random.RandomState(20261)


# ---------------------------------------------------------------------------
# Round trips (every encoder mode is lossless)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("modes", list(W.WEBP_SYNTH_CLASSES))
def test_constant_roundtrip_every_mode(modes):
    arr = np.full((5, 7, 3), 143, dtype=np.uint8)
    assert np.array_equal(W.webp_pixels(W.encode_vp8l(arr, **modes)), arr)


@pytest.mark.parametrize(
    "modes",
    [{}, {"subtract_green": True}, {"cache_bits": 6},
     {"subtract_green": True, "cache_bits": 3}],
)
def test_random_rgb_roundtrip(modes):
    arr = RNG.randint(0, 256, (9, 13, 3)).astype(np.uint8)
    assert np.array_equal(W.webp_pixels(W.encode_vp8l(arr, **modes)), arr)


@pytest.mark.parametrize("mode", range(14))
def test_all_predictor_modes_roundtrip(mode):
    arr = RNG.randint(0, 256, (8, 11, 3)).astype(np.uint8)
    blob = W.encode_vp8l(arr, predictor=mode, subtract_green=(mode % 2 == 0))
    assert np.array_equal(W.webp_pixels(blob), arr)


@pytest.mark.parametrize("ncol", [2, 3, 4, 9, 16, 17, 200])
def test_palette_roundtrip_every_bundling_width(ncol):
    vals = RNG.randint(0, 256, (ncol, 3)).astype(np.uint8)
    arr = vals[RNG.randint(0, ncol, (11, 10))]
    assert np.array_equal(W.webp_pixels(W.encode_vp8l(arr, palette=True)), arr)


def test_rgba_alpha_survives():
    arr = RNG.randint(0, 256, (4, 5, 4)).astype(np.uint8)
    blob = W.encode_vp8l(arr)
    payload = blob[20:]  # RIFF(12) + 'VP8L' + size(4)
    w, h, rgba = W.vp8l_argb(payload)
    assert (w, h) == (5, 4)
    assert np.array_equal(rgba, arr)


def test_one_by_one_image():
    arr = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert np.array_equal(W.webp_pixels(W.encode_vp8l(arr)), arr)


# ---------------------------------------------------------------------------
# Distance map: pinned against libwebp's packed kDistanceMapTable
# ---------------------------------------------------------------------------

def test_distance_map_matches_libwebp():
    libwebp_first = [0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16,
                     0x1A, 0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B,
                     0x36, 0x3A, 0x25, 0x2B]
    packed = [(dy << 4) | (8 - dx) for dx, dy in W._DIST_MAP]
    assert packed[: len(libwebp_first)] == libwebp_first
    assert len(W._DIST_MAP) == 120
    assert len(set(W._DIST_MAP)) == 120


def test_plane_code_beyond_table_is_linear():
    assert W._plane_code_to_dist(10, 121) == 1
    assert W._plane_code_to_dist(10, 125) == 5
    # (0, 1) -> one row up; clamped to >= 1
    assert W._plane_code_to_dist(10, 1) == 10
    assert W._plane_code_to_dist(10, 2) == 1


# ---------------------------------------------------------------------------
# Handcrafted foreign streams: the paths the fixture encoder never emits
# ---------------------------------------------------------------------------

def _header(bw, w, h):
    bw.put_bits(0x2F, 8)
    bw.put_bits(w - 1, 14)
    bw.put_bits(h - 1, 14)
    bw.put_bits(0, 1)  # alpha hint
    bw.put_bits(0, 3)  # version


def _simple1(bw, sym):
    """Simple Huffman header for a single symbol (0 bits per read)."""
    bw.put_bits(1, 1)
    bw.put_bits(0, 1)  # one symbol
    if sym > 1:
        bw.put_bits(1, 1)
        bw.put_bits(sym, 8)
    else:
        bw.put_bits(0, 1)
        bw.put_bits(sym, 1)


def _simple2(bw, sym0, sym1):
    bw.put_bits(1, 1)
    bw.put_bits(1, 1)  # two symbols
    if sym0 > 1:
        bw.put_bits(1, 1)
        bw.put_bits(sym0, 8)
    else:
        bw.put_bits(0, 1)
        bw.put_bits(sym0, 1)
    bw.put_bits(sym1, 8)


def _wrap(payload: bytes) -> bytes:
    import struct

    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff


def test_lz77_backward_reference_decodes():
    """One literal then a length-3 distance-1 copy fills a 2x2 image.
    The green tree carries a symbol >= 256, so it exercises the normal
    (code-length-coded) header with RLE zeros (codes 17/18) too."""
    bw = W._BitWriter()
    _header(bw, 2, 2)
    bw.put_bits(0, 1)  # no transforms
    bw.put_bits(0, 1)  # no color cache
    bw.put_bits(0, 1)  # no meta-Huffman
    # green: normal code over alphabet 280, syms {10, 258} both length 1
    bw.put_bits(0, 1)  # not simple
    bw.put_bits(9 - 4, 4)  # CLC lengths for order prefix [17,18,0,1,2,3,4,5,16]
    for cl_len in (2, 2, 0, 1, 0, 0, 0, 0, 0):  # 17:2, 18:2, 1:1
        bw.put_bits(cl_len, 3)
    bw.put_bits(1, 1)  # bound the reads (slots 259..279 default to 0)
    bw.put_bits(0, 3)  # length_nbits = 2
    bw.put_bits(5 - 2, 2)  # five CLC symbol reads
    # canonical CLC: sym1 -> 0 (len 1), sym17 -> 10, sym18 -> 11
    bw.put_code(0b10, 2); bw.put_bits(10 - 3, 3)       # 17: ten zeros
    bw.put_code(0b0, 1)                                 # slot 10 -> len 1
    bw.put_code(0b11, 2); bw.put_bits(127, 7)           # 18: 138 zeros
    bw.put_code(0b11, 2); bw.put_bits(109 - 11, 7)      # 18: 109 zeros
    bw.put_code(0b0, 1)                                 # slot 258 -> len 1
    _simple1(bw, 20)   # red
    _simple1(bw, 30)   # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 1)    # distance: prefix code 1 -> value 2 -> (1,0) -> dist 1
    # pixels: literal green=10 (code 0), then backref sym 258 (code 1):
    # length prefix 2 -> 3, distance from the 0-bit tree
    bw.put_code(0, 1)
    bw.put_code(1, 1)
    w, h, rgba = W.vp8l_argb(bw.bytes())
    assert (w, h) == (2, 2)
    assert np.array_equal(rgba.reshape(4, 4), np.tile([20, 10, 30, 255], (4, 1)))


def test_cross_color_transform_decodes():
    """1x1 image under a cross-color transform with green_to_red=2:
    r_out = r + ((int8)2 * (int8)g >> 5)."""
    bw = W._BitWriter()
    _header(bw, 1, 1)
    bw.put_bits(1, 1)            # a transform follows
    bw.put_bits(W._T_COLOR, 2)
    bw.put_bits(3 - 2, 3)        # size_bits 3 -> one 8x8 tile
    # tile sub-image (1x1): cte green_to_red=2 lives in the BLUE channel
    bw.put_bits(0, 1)            # no color cache (sub-images have no meta bit)
    _simple1(bw, 0)              # green = green_to_blue = 0
    _simple1(bw, 0)              # red = red_to_blue = 0
    _simple1(bw, 2)              # blue = green_to_red = 2
    _simple1(bw, 255)            # alpha
    _simple1(bw, 0)              # distance (unused)
    bw.put_bits(0, 1)            # end of transforms
    # main image: one literal pixel r=100 g=16 b=50
    bw.put_bits(0, 1)            # no cache
    bw.put_bits(0, 1)            # no meta
    _simple1(bw, 16)             # green
    _simple1(bw, 100)            # red
    _simple1(bw, 50)             # blue
    _simple1(bw, 255)            # alpha
    _simple1(bw, 0)              # distance
    w, h, rgba = W.vp8l_argb(bw.bytes())
    assert (w, h) == (1, 1)
    r, g, b, a = rgba[0, 0]
    assert g == 16 and a == 255
    assert r == (100 + ((2 * 16) >> 5)) & 0xFF == 101
    assert b == 50  # both blue deltas are zero


def test_meta_huffman_groups_decode():
    """8x1 image, huffman_bits=2 -> two 4-pixel tiles with different
    green codes (group 0 emits 5s, group 1 emits 9s)."""
    bw = W._BitWriter()
    _header(bw, 8, 1)
    bw.put_bits(0, 1)  # no transforms
    bw.put_bits(0, 1)  # no color cache
    bw.put_bits(1, 1)  # meta-Huffman present
    bw.put_bits(0, 3)  # huffman_bits = 2 -> hw = 2
    # meta image (2x1): group ids 0 and 1 in (r<<8)|green
    bw.put_bits(0, 1)       # no cache in the sub-image
    _simple2(bw, 0, 1)      # green: ids
    _simple1(bw, 0)         # red
    _simple1(bw, 0)         # blue
    _simple1(bw, 255)       # alpha
    _simple1(bw, 0)         # distance
    bw.put_code(0, 1)       # tile 0 -> group 0
    bw.put_code(1, 1)       # tile 1 -> group 1
    # group 0 codes: green always 5
    _simple1(bw, 5); _simple1(bw, 1); _simple1(bw, 2); _simple1(bw, 255)
    _simple1(bw, 0)
    # group 1 codes: green always 9
    _simple1(bw, 9); _simple1(bw, 3); _simple1(bw, 4); _simple1(bw, 255)
    _simple1(bw, 0)
    # eight pixels, zero data bits each
    w, h, rgba = W.vp8l_argb(bw.bytes())
    assert (w, h) == (8, 1)
    assert rgba[0, :, 1].tolist() == [5, 5, 5, 5, 9, 9, 9, 9]
    assert rgba[0, :, 0].tolist() == [1, 1, 1, 1, 3, 3, 3, 3]


def test_rle_repeat_previous_code_length():
    """Green tree built with RLE code 16 (repeat previous length):
    emit length 2 then 16 -> symbols 0..3 all get length 2."""
    bw = W._BitWriter()
    _header(bw, 4, 1)
    bw.put_bits(0, 1); bw.put_bits(0, 1); bw.put_bits(0, 1)
    bw.put_bits(0, 1)  # green: normal code
    bw.put_bits(9 - 4, 4)  # covers order prefix through symbol 16
    for cl_len in (0, 0, 0, 0, 1, 0, 0, 0, 1):  # 2:1 (idx 5... ) 16:1
        bw.put_bits(cl_len, 3)
    # CLC canonical over {2, 16}, both len 1: sym2 -> 0, sym16 -> 1
    bw.put_bits(1, 1)      # bound the reads
    bw.put_bits(0, 3)      # length_nbits = 2
    bw.put_bits(0, 2)      # max_reads = 2
    bw.put_code(0, 1)      # slot 0: length 2
    bw.put_code(1, 1); bw.put_bits(0, 2)  # 16: repeat 3 -> slots 1..3
    _simple1(bw, 7)    # red
    _simple1(bw, 8)    # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 0)    # distance
    for code in (0b00, 0b01, 0b10, 0b11):  # greens 0, 1, 2, 3
        bw.put_code(code, 2)
    w, h, rgba = W.vp8l_argb(bw.bytes())
    assert rgba[0, :, 1].tolist() == [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# Rejection surfaces
# ---------------------------------------------------------------------------

def test_lossy_vp8_raises_not_implemented():
    import struct

    payload = b"\x00" * 10
    riff = b"VP8 " + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
    with pytest.raises(NotImplementedError, match="VP8L decodes for real"):
        W.webp_pixels(blob)


def test_not_a_webp_container():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        W.webp_pixels(b"GIF89a densely packed nonsense")


def test_truncated_stream_raises():
    blob = W.encode_vp8l(RNG.randint(0, 256, (6, 6, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        W.webp_pixels(blob[:-4] + b"\x00" * 0)


def test_corrupt_code_lengths_rejected():
    # over-subscribed lengths (three symbols of length 1) must raise
    with pytest.raises(ValueError):
        W._HuffDecoder([1, 1, 1])


def test_palette_with_other_transform_raises():
    bw = W._BitWriter()
    _header(bw, 2, 1)
    bw.put_bits(1, 1)
    bw.put_bits(W._T_SUBTRACT_GREEN, 2)
    bw.put_bits(1, 1)
    bw.put_bits(W._T_PALETTE, 2)
    bw.put_bits(0, 8)  # 1 color
    bw.put_bits(0, 1)  # palette sub-image: no cache
    _simple1(bw, 9); _simple1(bw, 9); _simple1(bw, 9); _simple1(bw, 255)
    _simple1(bw, 0)
    bw.put_bits(0, 1)  # end transforms
    with pytest.raises(NotImplementedError, match="color-indexing"):
        W.vp8l_argb(bw.bytes())


# ---------------------------------------------------------------------------
# Spark plumbing: synth -> resize -> features (the multimodal_webp chain)
# ---------------------------------------------------------------------------

def test_spark_webp_chain(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    media = B.resize_images(B.synth_webp_media(docs), 8, 5)
    rows = {r["id"]: r for r in B.extract_media_features(media).collect()}
    assert len(rows) == 10
    for did, r in rows.items():
        assert r["media_type"] == "image/webp"
        assert (r["width"], r["height"]) == (8, 5)
        assert r["mean_pixel"] == float(did % 256)
