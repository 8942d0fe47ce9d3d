"""Compressed-audio WAV codecs — stdlib + numpy only (round 10).

G.711 µ-law and A-law (the telephony codecs, WAVE format tags 7 and 6)
and IMA ADPCM (tag 0x11) are all pure integer transforms — fully
expressible without external libs; with them real, the
``decode_audio`` stub shrinks to the genuinely environmental codecs
(MP3/AAC/Opus — psychoacoustic transforms + entropy coders).

Scope:

* decode: RIFF/WAVE parse (manual chunk walk — stdlib ``wave`` rejects
  non-PCM), formats 1 (16-bit PCM), 6 (A-law), 7 (µ-law) and 0x11
  (IMA ADPCM, mono, any block align); returns int16 samples.
* encode: the same four formats, for fixtures and round trips.  The
  G.711 coders are the classic CCITT reference algorithm (segment
  search + mantissa); ADPCM is the standard step/index state machine.
  Every G.711 DECODE POINT survives a round trip exactly
  (encode(decode(c)) == c — asserted for all 256 codes of both laws,
  modulo µ-law's two-zeros alias: codes 127 and 255 both decode to 0,
  which re-encodes canonically as 255),
  and an ADPCM-encoded CONSTANT signal decodes to exactly that
  constant (nibble 0 at step index 0 is a fixed point) — the
  oracle-exactness hooks the multimodal_audio query stands on.

Sample loops are Python/numpy — the usual stance: a correctness
surface, Arrow-batched around (multimodal/binary.py).
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_PCM = 0x0001
WAVE_ALAW = 0x0006
WAVE_MULAW = 0x0007
WAVE_IMA_ADPCM = 0x0011

_BIAS = 0x84
_CLIP = 8159
_SEG_UEND = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def _seg_search(val: int, table: tuple[int, ...]) -> int:
    for i, end in enumerate(table):
        if val <= end:
            return i
    return len(table)


def mulaw_encode(pcm: int) -> int:
    """16-bit linear -> µ-law byte (CCITT G.711)."""
    pcm >>= 2
    if pcm < 0:
        pcm = -pcm
        mask = 0x7F
    else:
        mask = 0xFF
    if pcm > _CLIP:
        pcm = _CLIP
    pcm += _BIAS >> 2
    seg = _seg_search(pcm, _SEG_UEND)
    if seg >= 8:  # clipped full-scale lands past the last segment end
        return 0x7F ^ mask
    uval = (seg << 4) | ((pcm >> (seg + 1)) & 0xF)
    return uval ^ mask


def mulaw_decode(code: int) -> int:
    """µ-law byte -> 16-bit linear."""
    code = ~code & 0xFF
    t = ((code & 0xF) << 3) + _BIAS
    t <<= (code & 0x70) >> 4
    return (_BIAS - t) if (code & 0x80) else (t - _BIAS)


def alaw_encode(pcm: int) -> int:
    """16-bit linear -> A-law byte (CCITT G.711)."""
    pcm >>= 3
    if pcm >= 0:
        mask = 0xD5  # sign bit (1 = positive) + the 0x55 toggle
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = _seg_search(pcm, _SEG_AEND)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    if seg < 2:
        aval |= (pcm >> 1) & 0xF
    else:
        aval |= (pcm >> seg) & 0xF
    return aval ^ mask


def alaw_decode(code: int) -> int:
    """A-law byte -> 16-bit linear."""
    code ^= 0x55
    t = (code & 0xF) << 4
    seg = (code & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if (code & 0x80) else -t


MULAW_DECODE = [mulaw_decode(c) for c in range(256)]
ALAW_DECODE = [alaw_decode(c) for c in range(256)]

# IMA ADPCM step/index tables (IMA ADPCM reference, also in RFC 3551 app.)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_decode_nibble(n: int, pred: int, idx: int) -> tuple[int, int]:
    step = _IMA_STEP[idx]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if (n & 8) else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[n]))
    return pred, idx


def _ima_encode_sample(x: int, pred: int, idx: int) -> tuple[int, int, int]:
    step = _IMA_STEP[idx]
    delta = x - pred
    n = 8 if delta < 0 else 0
    if delta < 0:
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    pred, idx = _ima_decode_nibble(n, pred, idx)
    return n, pred, idx


# ---------------------------------------------------------------------------
# WAV container
# ---------------------------------------------------------------------------


def _wav_wrap(fmt_chunk: bytes, data: bytes, fact_samples: int | None) -> bytes:
    chunks = b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    if len(fmt_chunk) & 1:
        chunks += b"\x00"
    if fact_samples is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact_samples)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_wav_g711(samples: np.ndarray, rate: int, law: str = "mulaw") -> bytes:
    """Mono G.711 WAV (format tag 7 µ-law / 6 A-law) from int16 samples."""
    enc = mulaw_encode if law == "mulaw" else alaw_encode
    tag = WAVE_MULAW if law == "mulaw" else WAVE_ALAW
    data = bytes(enc(int(x)) for x in np.asarray(samples, dtype=np.int16))
    fmt = struct.pack("<HHIIHHH", tag, 1, rate, rate, 1, 8, 0)
    return _wav_wrap(fmt, data, len(data))


def make_wav_adpcm(samples: np.ndarray, rate: int, block_align: int = 256) -> bytes:
    """Mono IMA-ADPCM WAV (format tag 0x11): 4-byte block header
    (predictor int16, step index, reserved) + low-nibble-first codes."""
    samples = np.asarray(samples, dtype=np.int16)
    spb = (block_align - 4) * 2 + 1  # samples per block
    data = bytearray()
    idx = 0
    for start in range(0, len(samples), spb):
        block = samples[start : start + spb]
        pred = int(block[0])
        data += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for x in block[1:]:
            n, pred, idx = _ima_encode_sample(int(x), pred, idx)
            nibbles.append(n)
        nibbles += [0] * (((block_align - 4) * 2) - len(nibbles))
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            data.append(lo | (hi << 4))
    byte_rate = max(1, rate * block_align // spb)
    fmt = struct.pack(
        "<HHIIHHHH", WAVE_IMA_ADPCM, 1, rate, byte_rate, block_align, 4, 2, spb
    )
    return _wav_wrap(fmt, bytes(data), len(samples))


def wav_samples(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, interleaved int16 samples) from a
    RIFF/WAVE container holding
    PCM, G.711 µ-law/A-law, or mono IMA-ADPCM data.  MP3/AAC/Opus (not
    RIFF containers) raise in the caller's dispatch — those genuinely
    need external codecs."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    fact_samples = None
    data = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        payload = blob[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = payload
        elif tag == b"fact":
            fact_samples = struct.unpack("<I", payload[:4])[0]
        elif tag == b"data":
            data = payload
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAVE container missing fmt or data chunk")
    tag, channels, rate = struct.unpack("<HHI", fmt[:8])
    if tag == WAVE_PCM:
        bits = struct.unpack("<H", fmt[14:16])[0]
        if bits != 16:
            raise ValueError(f"only 16-bit PCM supported, got {bits}")
        return rate, channels, np.frombuffer(data, dtype="<i2").copy()
    if tag in (WAVE_MULAW, WAVE_ALAW):
        table = np.array(
            MULAW_DECODE if tag == WAVE_MULAW else ALAW_DECODE, dtype=np.int16
        )
        return rate, channels, table[np.frombuffer(data, dtype=np.uint8)]
    if tag == WAVE_IMA_ADPCM:
        if channels != 1:
            raise ValueError("IMA-ADPCM decode supports mono only")
        block_align = struct.unpack("<H", fmt[12:14])[0]
        out: list[int] = []
        for start in range(0, len(data), block_align):
            block = data[start : start + block_align]
            if len(block) < 4:
                break
            pred, idx, _ = struct.unpack("<hBB", block[:4])
            out.append(pred)
            for byte in block[4:]:
                for n in (byte & 0xF, byte >> 4):
                    pred, idx = _ima_decode_nibble(n, pred, idx)
                    out.append(pred)
        if fact_samples is not None:
            out = out[:fact_samples]
        return rate, 1, np.array(out, dtype=np.int16)
    raise NotImplementedError(
        f"WAVE format tag 0x{tag:04x} needs external codecs; PCM/µ-law/"
        "A-law/IMA-ADPCM decode for real"
    )


def decode_wav_ex(blob: bytes) -> tuple[int, int, int, float]:
    """(sample_rate, n_frames, n_channels, rms) across every supported
    WAV format — the same feature tuple binary.decode_wav returns for
    plain PCM."""
    rate, channels, x = wav_samples(blob)
    xf = x.astype(np.float64)
    rms = float(np.sqrt(np.mean(xf * xf))) if xf.size else 0.0
    return rate, len(x) // channels, channels, rms


# ---------------------------------------------------------------------------
# AIFF (IFF chunks, big-endian PCM, 80-bit extended-float sample rate)
# and Sun AU / .snd (offset-header, big-endian data, µ-law or PCM)
# ---------------------------------------------------------------------------


def _f80_encode(value: int) -> bytes:
    """IEEE 754 80-bit extended ("SANE extended") for a positive integer
    — the AIFF COMM sampleRate field: 15-bit exponent biased 16383, then
    a 64-bit mantissa with an EXPLICIT integer bit."""
    if value <= 0:
        raise ValueError("sample rate must be positive")
    p = value.bit_length() - 1
    mant = value << (63 - p)
    return struct.pack(">HQ", 16383 + p, mant)


def _f80_decode(b: bytes) -> int:
    """Integer sample rate from the 80-bit extended field (rounds the
    fractional part away — audio rates are integers in practice)."""
    se, mant = struct.unpack(">HQ", b[:10])
    sign = -1 if se & 0x8000 else 1
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0
    shift = exp - 16383 - 63
    val = mant * (2 ** shift) if shift >= 0 else mant / (2 ** -shift)
    return int(sign * val)


def make_aiff(samples: np.ndarray, rate: int) -> bytes:
    """Mono 16-bit big-endian PCM in a real AIFF container
    (FORM/AIFF + COMM + SSND)."""
    data = samples.astype(">i2").tobytes()
    comm = b"COMM" + struct.pack(">I", 18) + struct.pack(
        ">hIh", 1, len(samples), 16
    ) + _f80_encode(rate)
    ssnd = b"SSND" + struct.pack(">I", 8 + len(data)) + struct.pack(">II", 0, 0) + data
    if len(data) & 1:
        ssnd += b"\x00"
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def aiff_samples(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(rate, channels, int16 samples) from an AIFF container —
    manual IFF chunk walk (stdlib ``aifc`` is gone in Python 3.13)."""
    if blob[:4] != b"FORM" or blob[8:12] != b"AIFF":
        raise ValueError("not a FORM/AIFF container")
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = struct.unpack(">I", blob[pos + 4 : pos + 8])[0]
        payload = blob[pos + 8 : pos + 8 + size]
        if tag == b"COMM":
            comm = payload
        elif tag == b"SSND":
            ssnd = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("AIFF container missing COMM or SSND chunk")
    channels, n_frames, bits = struct.unpack(">hIh", comm[:8])
    rate = _f80_decode(comm[8:18])
    if bits != 16:
        raise ValueError(f"only 16-bit AIFF PCM supported, got {bits}")
    offset, _block = struct.unpack(">II", ssnd[:8])
    data = ssnd[8 + offset : 8 + offset + n_frames * channels * 2]
    return rate, channels, np.frombuffer(data, dtype=">i2").astype(np.int16)


AU_MAGIC = b".snd"
AU_ENC_MULAW = 1
AU_ENC_PCM16 = 3


def make_au(samples: np.ndarray, rate: int, encoding: str = "pcm16") -> bytes:
    """Mono Sun AU (.snd): 24-byte header + big-endian data.  ``mulaw``
    runs the real G.711 encoder over the samples."""
    if encoding == "pcm16":
        enc, data = AU_ENC_PCM16, samples.astype(">i2").tobytes()
    elif encoding == "mulaw":
        enc = AU_ENC_MULAW
        data = bytes(mulaw_encode(int(x)) for x in samples)
    else:
        raise ValueError(f"unsupported AU encoding {encoding!r}")
    return AU_MAGIC + struct.pack(">IIIII", 24, len(data), enc, rate, 1) + data


def au_samples(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(rate, channels, int16 samples) from a Sun AU container —
    µ-law decodes through the shared G.711 table."""
    if blob[:4] != AU_MAGIC:
        raise ValueError("not a Sun AU container (missing .snd magic)")
    offset, size, enc, rate, channels = struct.unpack(">IIIII", blob[4:24])
    end = len(blob) if size == 0xFFFFFFFF else offset + size
    data = blob[offset:end]
    if enc == AU_ENC_PCM16:
        return rate, channels, np.frombuffer(data, dtype=">i2").astype(np.int16)
    if enc == AU_ENC_MULAW:
        table = np.array(MULAW_DECODE, dtype=np.int16)
        return rate, channels, table[np.frombuffer(data, dtype=np.uint8)]
    raise NotImplementedError(
        f"AU encoding {enc} needs external codecs; µ-law/PCM16 decode for real"
    )


def _pcm_features(rate: int, channels: int, x: np.ndarray) -> tuple[int, int, int, float]:
    xf = x.astype(np.float64)
    rms = float(np.sqrt(np.mean(xf * xf))) if xf.size else 0.0
    return rate, len(x) // channels, channels, rms


def decode_aiff_ex(blob: bytes) -> tuple[int, int, int, float]:
    """(rate, n_frames, channels, rms) — decode_wav_ex's twin for AIFF."""
    return _pcm_features(*aiff_samples(blob))


def decode_au_ex(blob: bytes) -> tuple[int, int, int, float]:
    """(rate, n_frames, channels, rms) — decode_wav_ex's twin for AU."""
    return _pcm_features(*au_samples(blob))
