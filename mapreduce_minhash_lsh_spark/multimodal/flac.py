"""FLAC codec — stdlib + numpy only (round 10).

FLAC is THE lossless audio interchange format of public speech/audio
corpora; its bitstream is rice-coded linear prediction — all integer
arithmetic, fully expressible without external libs.  With it real, the
compressed-audio stub is down to the perceptual codecs (MP3/AAC/Opus),
whose psychoacoustic transforms genuinely need external
implementations.

Scope (per the public FLAC format specification):

* decode: STREAMINFO + metadata-block walk, frame headers (UTF-8-coded
  frame numbers, all block-size/sample-rate code forms, CRC-8-checked),
  subframe types CONSTANT, VERBATIM, FIXED orders 0-4 AND full LPC
  (qlp precision/shift + coefficients), wasted bits, rice residual
  methods 0 and 1 with any partition order and escape partitions,
  frame CRC-16 verified.  Mono and independent-stereo; the mid/side
  stereo decorrelations raise with the modes named.
* encode: mono 16-bit, per-frame best-of FIXED orders 0-2 with
  partition-order-0 rice residuals (CONSTANT frames detected) — enough
  to produce real multi-frame files that exercise every decode path
  the fixtures need.  Lossless by construction: byte-exact sample
  round trips, which is what the multimodal_flac oracle stands on.

MSB-first bit IO, unlike the LSB-first VP8L — each module carries its
own reader.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Reader:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.bits(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _Writer:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self) -> None:
        while self.n:
            self.bits(0, 1)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


def _read_utf8_number(r: _Reader) -> int:
    first = r.bits(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0:
        raise ValueError("FLAC: invalid UTF-8-coded frame number")
    v = first & (mask - 1)
    for _ in range(n_extra):
        b = r.bits(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


_BLOCKSIZE_CODES = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
                    **{i: 256 << (i - 8) for i in range(8, 16)}}


def _read_residual(r: _Reader, n: int, order: int) -> list[int]:
    method = r.bits(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = r.bits(4)
    n_parts = 1 << porder
    if n % n_parts:
        raise ValueError("FLAC: block size not divisible by partitions")
    out: list[int] = []
    for p in range(n_parts):
        count = n // n_parts - (order if p == 0 else 0)
        param = r.bits(pbits)
        if param == escape:
            raw = r.bits(5)
            out.extend(r.signed(raw) if raw else 0 for _ in range(count))
        else:
            for _ in range(count):
                q = r.unary()
                u = (q << param) | r.bits(param) if param else q
                out.append(_unzigzag(u))
    return out


def _decode_subframe(r: _Reader, n: int, bps: int) -> list[int]:
    if r.bits(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = 1 + r.unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        samples = [r.signed(eff)] * n
    elif stype == 1:  # VERBATIM
        samples = [r.signed(eff) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.signed(eff) for _ in range(order)]
        res = _read_residual(r, n, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for e in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(e + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [r.signed(eff) for _ in range(order)]
        precision = r.bits(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid qlp precision")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative qlp shift")
        coefs = [r.signed(precision) for _ in range(order)]
        res = _read_residual(r, n, order)
        samples = list(warm)
        for e in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs)) >> shift
            samples.append(e + pred)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def flac_samples(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, interleaved int16 samples) from a FLAC
    stream.  Mono + independent stereo; left/right/mid-side
    decorrelation raises with the mode named."""
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    rate = channels = bps = 0
    total = 0
    while True:
        hdr = blob[pos : pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        body = blob[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            r = _Reader(body)
            r.bits(16); r.bits(16); r.bits(24); r.bits(24)
            rate = r.bits(20)
            channels = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
        pos += 4 + length
        if last:
            break
    if bps != 16:
        raise ValueError(f"FLAC: only 16-bit supported, got {bps}")
    out: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(blob) and sum(len(c) for c in out) < total * channels:
        r = _Reader(blob, pos * 8)
        frame_start = pos
        sync = r.bits(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        r.bits(1)  # reserved
        r.bits(1)  # blocking strategy
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        chan_code = r.bits(4)
        ss_code = r.bits(3)
        r.bits(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0b0110:
            n = r.bits(8) + 1
        elif bs_code == 0b0111:
            n = r.bits(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            n = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError(f"FLAC: reserved block size code {bs_code}")
        if sr_code == 0b1100:
            r.bits(8)
        elif sr_code in (0b1101, 0b1110):
            r.bits(16)
        header_end = (r.pos + 7) // 8
        crc8 = r.bits(8)
        if crc8 != _crc8(blob[frame_start:header_end]):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if chan_code >= 0b1000:
            raise ValueError(
                "FLAC: left/right/mid-side stereo decorrelation not supported"
            )
        n_ch = chan_code + 1
        if n_ch != channels:
            raise ValueError("FLAC: frame/STREAMINFO channel mismatch")
        del ss_code  # sample size comes from STREAMINFO (validated above)
        for ch in range(n_ch):
            out[ch].extend(_decode_subframe(r, n, 16))
        r.align()
        body_end = r.pos >> 3
        crc16 = r.bits(16)
        if crc16 != _crc16(blob[frame_start:body_end]):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = (r.pos + 7) >> 3
    interleaved = np.empty(total * channels, dtype=np.int16)
    for ch in range(channels):
        interleaved[ch::channels] = out[ch][:total]
    return rate, channels, interleaved


# ---------------------------------------------------------------------------
# Encoder (mono 16-bit; CONSTANT / best-of FIXED 0-2, rice order 0)
# ---------------------------------------------------------------------------


def _best_rice_param(residuals: list[int]) -> int:
    if not residuals:
        return 0
    mean = sum(_zigzag(e) for e in residuals) / len(residuals)
    p = 0
    while (1 << (p + 1)) <= mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(w: _Writer, residuals: list[int]) -> None:
    w.bits(0, 2)   # rice method 0
    w.bits(0, 4)   # partition order 0
    param = _best_rice_param(residuals)
    w.bits(param, 4)
    for e in residuals:
        u = _zigzag(e)
        w.unary(u >> param)
        if param:
            w.bits(u & ((1 << param) - 1), param)


def encode_flac(samples: np.ndarray, rate: int, block_size: int = 4096) -> bytes:
    """Mono 16-bit FLAC: per frame, CONSTANT when possible, else the
    FIXED order (0-2) with the smallest zigzag residual sum, rice-coded
    at partition order 0.  Lossless — decode returns the input exactly."""
    samples = np.asarray(samples, dtype=np.int16)
    total = len(samples)
    w_info = _Writer()
    w_info.bits(block_size, 16)
    w_info.bits(block_size, 16)
    w_info.bits(0, 24)
    w_info.bits(0, 24)
    w_info.bits(rate, 20)
    w_info.bits(0, 3)       # channels - 1
    w_info.bits(15, 5)      # bps - 1
    w_info.bits(total, 36)
    streaminfo = w_info.bytes() + b"\x00" * 16  # md5 unset (all zero = skip)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    frame_no = 0
    for start in range(0, total, block_size):
        block = [int(x) for x in samples[start : start + block_size]]
        n = len(block)
        w = _Writer()
        w.bits(0b11111111111110, 14)
        w.bits(0, 1)
        w.bits(0, 1)            # fixed blocking
        w.bits(0b0111, 4)       # 16-bit block size at header end
        w.bits(0, 4)            # sample rate from STREAMINFO
        w.bits(0, 4)            # mono
        w.bits(0b100, 3)        # 16 bps
        w.bits(0, 1)
        # UTF-8-coded frame number (sufficient range for fixtures)
        if frame_no < 0x80:
            w.bits(frame_no, 8)
        else:
            w.bits(0xC0 | (frame_no >> 6), 8)
            w.bits(0x80 | (frame_no & 0x3F), 8)
        w.bits(n - 1, 16)
        header = w.bytes() if w.n == 0 else None
        assert header is not None  # all fields above are byte-aligned
        header_bits = _Writer()
        header_bits.out = bytearray(header)
        w = header_bits
        w.bits(_crc8(bytes(w.out)), 8)
        # pick the subframe
        if all(x == block[0] for x in block):
            w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)  # CONSTANT
            w.bits(block[0] & 0xFFFF, 16)
        else:
            best_order, best_res, best_cost = 0, None, None
            for order in (0, 1, 2):
                if n <= order:
                    continue
                coefs = _FIXED_COEFS[order]
                res = [
                    block[i] - sum(c * block[i - j - 1] for j, c in enumerate(coefs))
                    for i in range(order, n)
                ]
                cost = sum(_zigzag(e).bit_length() for e in res)
                if best_cost is None or cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            w.bits(0, 1)
            w.bits(8 + best_order, 6)
            w.bits(0, 1)  # no wasted bits
            for s in block[:best_order]:
                w.bits(s & 0xFFFF, 16)
            _write_residual(w, best_res)
        w.align()
        frame = bytes(w.out)
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


def decode_flac(blob: bytes) -> tuple[int, int, int, float]:
    """(sample_rate, n_frames, n_channels, rms) — the same feature
    tuple the WAV decoders return."""
    rate, channels, x = flac_samples(blob)
    xf = x.astype(np.float64)
    rms = float(np.sqrt(np.mean(xf * xf))) if xf.size else 0.0
    return rate, len(x) // channels, channels, rms
