"""FLAC codec: lossless round trips across signal shapes, handcrafted
foreign streams for the decode-only paths the fixture encoder never
emits (LPC subframes, escape partitions, partition orders > 0, rice
method 1, wasted bits, independent stereo), CRC enforcement, and
rejection surfaces.  Corpus-level value parity of multimodal_flac is
covered by the oracle sweep."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mapreduce_minhash_lsh_spark.multimodal import flac as FL

RNG = np.random.RandomState(20263)


# ---------------------------------------------------------------------------
# Encoder round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("signal", [
    np.full(5000, 1234, dtype=np.int16),                       # constant
    np.tile(np.array([500, -500], np.int16), 2500),            # square
    RNG.randint(-32768, 32767, 10000).astype(np.int16),        # noise
    (3000 * np.sin(np.arange(12000) * 0.01)).astype(np.int16), # sine
    RNG.randint(-100, 100, 4096 * 2 + 37).astype(np.int16),    # remainder
])
def test_roundtrip_exact(signal):
    rate, ch, out = FL.flac_samples(FL.encode_flac(signal, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out, signal)


def test_many_frames_utf8_numbers():
    sig = RNG.randint(-100, 100, 256 * 200).astype(np.int16)  # 200 frames
    _, _, out = FL.flac_samples(FL.encode_flac(sig, 8000, block_size=256))
    assert np.array_equal(out, sig)


def test_sine_compresses():
    sine = (3000 * np.sin(np.arange(12000) * 0.01)).astype(np.int16)
    blob = FL.encode_flac(sine, 8000)
    assert len(blob) < 0.2 * sine.nbytes  # fixed predictor earns its keep


def test_square_rms_exact():
    sq = np.tile(np.array([500, -500], np.int16), 2500)
    assert FL.decode_flac(FL.encode_flac(sq, 8000)) == (8000, 5000, 1, 500.0)


# ---------------------------------------------------------------------------
# Handcrafted foreign streams
# ---------------------------------------------------------------------------

def _streaminfo(total: int, channels: int = 1) -> bytes:
    w = FL._Writer()
    w.bits(16, 16); w.bits(65535, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(8000, 20); w.bits(channels - 1, 3); w.bits(15, 5); w.bits(total, 36)
    info = w.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info


def _frame_header(n: int, chan_code: int = 0) -> FL._Writer:
    w = FL._Writer()
    w.bits(0b11111111111110, 14)
    w.bits(0, 1); w.bits(0, 1)
    w.bits(0b0111, 4)       # 16-bit block size at end
    w.bits(0, 4)            # rate from STREAMINFO
    w.bits(chan_code, 4)
    w.bits(0b100, 3)        # 16 bps
    w.bits(0, 1)
    w.bits(0, 8)            # frame 0
    w.bits(n - 1, 16)
    w.bits(FL._crc8(bytes(w.out)), 8)
    return w


def _finish(w: FL._Writer) -> bytes:
    w.align()
    frame = bytes(w.out)
    return frame + struct.pack(">H", FL._crc16(frame))


def test_lpc_subframe_decodes():
    """LPC order 1 with coefficient 32 at shift 5 == 'predict previous';
    warmup 10 then residuals +1 -> 10, 11, 12, 13."""
    w = _frame_header(4)
    w.bits(0, 1); w.bits(32 + 0, 6); w.bits(0, 1)   # LPC order 1
    w.bits(10 & 0xFFFF, 16)                          # warmup
    w.bits(14, 4)                                    # precision 15
    w.bits(5, 5)                                     # shift 5
    w.bits(32, 15)                                   # coefficient
    w.bits(0, 2); w.bits(0, 4)                       # rice0, porder 0
    w.bits(0, 4)                                     # param 0
    for _ in range(3):
        w.unary(FL._zigzag(1))                       # residual +1
    blob = _streaminfo(4) + _finish(w)
    _, _, out = FL.flac_samples(blob)
    assert out.tolist() == [10, 11, 12, 13]


def test_escape_partition_decodes():
    """Rice param 15 escapes to raw 6-bit residuals."""
    w = _frame_header(3)
    w.bits(0, 1); w.bits(8, 6); w.bits(0, 1)         # FIXED order 0
    w.bits(0, 2); w.bits(0, 4)
    w.bits(15, 4)                                    # escape
    w.bits(6, 5)                                     # 6 raw bits
    for v in (7, -8, 21):
        w.bits(v & 0x3F, 6)
    blob = _streaminfo(3) + _finish(w)
    _, _, out = FL.flac_samples(blob)
    assert out.tolist() == [7, -8, 21]


def test_partition_order_and_rice2():
    """Method 1 (5-bit params), partition order 1: two partitions with
    different parameters over a FIXED-0 subframe of 4 samples."""
    w = _frame_header(4)
    w.bits(0, 1); w.bits(8, 6); w.bits(0, 1)
    w.bits(1, 2)                                     # rice2
    w.bits(1, 4)                                     # porder 1 -> 2 partitions
    w.bits(0, 5)                                     # param 0
    w.unary(FL._zigzag(1)); w.unary(FL._zigzag(-1))
    w.bits(2, 5)                                     # param 2
    for v in (5, -6):
        u = FL._zigzag(v)
        w.unary(u >> 2); w.bits(u & 3, 2)
    blob = _streaminfo(4) + _finish(w)
    _, _, out = FL.flac_samples(blob)
    assert out.tolist() == [1, -1, 5, -6]


def test_wasted_bits_decode():
    """CONSTANT subframe with 2 wasted bits: stored at 14 bits,
    reconstructed << 2."""
    w = _frame_header(2)
    w.bits(0, 1); w.bits(0, 6)
    w.bits(1, 1)          # wasted-bits flag
    w.unary(1)            # 1 + unary(1) = 2 wasted bits
    w.bits(300 & 0x3FFF, 14)
    blob = _streaminfo(2) + _finish(w)
    _, _, out = FL.flac_samples(blob)
    assert out.tolist() == [1200, 1200]


def test_independent_stereo_decodes():
    w = _frame_header(2, chan_code=1)
    for val in (100, -200):   # one CONSTANT subframe per channel
        w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)
        w.bits(val & 0xFFFF, 16)
    blob = _streaminfo(2, channels=2) + _finish(w)
    rate, ch, out = FL.flac_samples(blob)
    assert ch == 2
    assert out.tolist() == [100, -200, 100, -200]


def test_midside_stereo_raises():
    w = _frame_header(2, chan_code=0b1001)  # left/side
    blob = _streaminfo(2, channels=2) + _finish(w)
    with pytest.raises(ValueError, match="mid-side"):
        FL.flac_samples(blob)


def test_crc_enforced():
    sig = np.arange(100, dtype=np.int16)
    blob = bytearray(FL.encode_flac(sig, 8000))
    blob[-1] ^= 0xFF  # corrupt the frame CRC-16 itself
    with pytest.raises(ValueError, match="CRC"):
        FL.flac_samples(bytes(blob))
    # corrupting payload bytes also fails loudly (rice desync or CRC)
    blob2 = bytearray(FL.encode_flac(sig, 8000))
    blob2[-10] ^= 0xFF
    with pytest.raises(ValueError):
        FL.flac_samples(bytes(blob2))


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="fLaC"):
        FL.flac_samples(b"ID3 this is an mp3 actually")
