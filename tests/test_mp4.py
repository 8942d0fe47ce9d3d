"""ISO-BMFF (MP4) container layer: probe metadata, real frame-boundary
slicing through the sample tables, encode round trips for both
handlers, rejection surfaces, and the Spark frame-sampling upgrade.
The multimodal_video_meta oracle covers corpus-level value parity."""

from __future__ import annotations

import struct

import pytest

from mapreduce_minhash_lsh_spark.multimodal import binary as B
from mapreduce_minhash_lsh_spark.multimodal import mp4 as M


FRAMES = [bytes([i]) * (10 + i) for i in range(7)]


def test_probe_round_trip():
    blob = M.make_mp4(FRAMES, timescale=600, sample_duration=25)
    info = M.probe_mp4(blob)
    assert info["brand"] == "isom"
    assert info["timescale"] == 600
    assert info["duration"] == 7 * 25
    assert info["duration_us"] == 7 * 25 * 1_000_000 // 600
    assert info["n_tracks"] == 1
    assert info["tracks"][0] == {"handler": "vide", "codec": "mp4v", "n_samples": 7}


def test_frames_slice_at_true_boundaries():
    blob = M.make_mp4(FRAMES)
    assert M.mp4_frames(blob) == FRAMES


def test_audio_handler_variant():
    blob = M.make_mp4(FRAMES[:3], handler=b"soun", codec=b"mp4a")
    info = M.probe_mp4(blob)
    assert info["tracks"][0]["handler"] == "soun"
    assert info["tracks"][0]["codec"] == "mp4a"
    assert M.mp4_frames(blob) == FRAMES[:3]


def test_fixed_size_stsz_and_co64():
    """Foreign-file shapes the encoder never emits: a fixed sample size
    (stsz with sample_size != 0) and 64-bit chunk offsets (co64)."""
    frames = [b"abcd"] * 5
    blob = bytearray(M.make_mp4(frames))
    # rewrite stsz to the fixed-size form in place: find the stsz box
    i = bytes(blob).index(b"stsz")
    size = struct.unpack(">I", blob[i - 4 : i])[0]
    fixed = struct.pack(">I", 8 + 4 + 8) + b"stsz" + b"\x00" * 4 + struct.pack(">II", 4, 5)
    rest_pad = size - len(fixed)
    assert rest_pad >= 0
    blob[i - 4 : i - 4 + size] = fixed + _free(rest_pad)
    assert M.mp4_frames(bytes(blob)) == frames


def _free(n: int) -> bytes:
    """A filler 'free' box of exactly n bytes (n == 0 or n >= 8)."""
    if n == 0:
        return b""
    assert n >= 8
    return struct.pack(">I", n) + b"free" + b"\x00" * (n - 8)


def test_rejections():
    with pytest.raises(ValueError):
        M.probe_mp4(b"\x00\x00\x00\x18ftyp")  # truncated
    with pytest.raises(ValueError):
        M.probe_mp4(b"RIFF\x00\x00\x00\x00WAVEdata")  # not ISO-BMFF
    # moov without mvhd
    blob = M.make_mp4(FRAMES[:1])
    no_mvhd = blob.replace(b"mvhd", b"xxxx")
    with pytest.raises(ValueError, match="mvhd"):
        M.probe_mp4(no_mvhd)


def test_decode_media_returns_container_features():
    blob = M.make_mp4(FRAMES)
    feats = B.decode_media(blob, "video/mp4")
    assert feats == (None, None, None, None, 7, 7 * 25 * 1_000_000 // 600, None)


def test_frame_sample_uses_real_mp4_boundaries(spark):
    rows = [(1, M.make_mp4(FRAMES), "video/mp4")]
    media = spark.createDataFrame(rows, "id long, media binary, media_type string")
    out = sorted(
        B.frame_sample(media, every_k=3).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in out] == [0, 3, 6]
    assert all(r.n_frames == 7 for r in out)
    assert [bytes(r.frame) for r in out] == [FRAMES[0], FRAMES[3], FRAMES[6]]


def test_frame_sample_falls_back_to_byte_chunks(spark):
    blob = b"x" * 100
    media = spark.createDataFrame(
        [(1, blob, "application/octet-stream")],
        "id long, media binary, media_type string",
    )
    out = B.frame_sample(media, every_k=1).collect()
    assert len(out) == (100 + B.FRAME_SIZE - 1) // B.FRAME_SIZE
