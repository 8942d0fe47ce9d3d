"""Baseline JPEG (ITU T.81 / JFIF) codec — stdlib + numpy only (round 8).

Closes the last compressed-image stub: ``decode_image`` previously raised
for JPEG because PIL/ffmpeg are absent; baseline sequential JPEG needs
neither — it is huffman coding + 8x8 DCT + quantization, all expressible
with numpy.

Scope (mirrors the PNG codec's explicit scope contract):

* decode: baseline sequential DCT (SOF0), 8-bit, 1 component (grayscale)
  or 3 components (YCbCr), sampling factors 1-2 per axis (4:4:4, 4:2:2,
  4:2:0), restart intervals, byte stuffing.  Quant + huffman tables are
  read from the FILE (DQT/DHT segments), so decoding foreign baseline
  JPEGs does not depend on this module's own table constants.
  Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
  modes raise ValueError.
* encode: baseline 4:4:4 (default) or 4:2:0, standard Annex-K huffman
  tables, caller-supplied quant tables (default: ALL-ONES — quantization
  is then lossless for constant blocks, so a constant-gray image
  round-trips EXACTLY; that is what makes a SQL oracle able to predict
  decoded means, same trick as the PNG/BMP/PPM synth queries).

The huffman decode walks bits in Python — fine for the synth/test
surface this serves (same stance as PNG's filter-1/3/4 rows); the
Spark-side plumbing around it is Arrow-batched either way.

JPEG is lossy in general: round-trip tests pin EXACT recovery for
constant images under all-ones quant and a PSNR floor for smooth images
under real quant tables.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The 8x8 zigzag scan as (row, col) pairs, generated (not
    hardcoded): walk anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        order.extend(diag if s % 2 else diag[::-1])
    return np.array(order)


_ZZ = _zigzag_order()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]  # block.flat index per zigzag position


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c


_C = _dct_matrix()  # F = C @ f @ C.T ; f = C.T @ F @ C

# Annex-K "typical" huffman tables (BITS, HUFFVAL).  These are only used
# by the ENCODER — the decoder always reads tables from the file's DHT
# segments — so a transcription slip could only affect interop of our
# own output, and the import-time asserts below pin internal validity.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
for _bits, _vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_bits) == len(_vals), "huffman BITS/HUFFVAL mismatch"
    assert sum(_bits[i] * 2 ** -(i + 1) for i in range(16)) <= 1, "invalid code"

# The Annex-K example luminance quant table — offered for "real" lossy
# encodes in tests; the default synth path uses all-ones.
STD_QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [26, 55, 60, 70, 72, 95, 98, 112],
    [49, 64, 78, 87, 103, 121, 120, 101],
], dtype=np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, surfaces markers
    (RST/EOI) as _MarkerHit so the MCU loop can handle restarts."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise _MarkerHit(nxt)
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc, self.n = 0, 0
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected RST marker at restart interval")


class _HuffDecoder:
    """Canonical huffman decoding via min/max code per length."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, r: _BitReader) -> int:
        code = r.bit()
        for length in range(1, 17):
            if code <= self.max_code[length]:
                return self.vals[self.val_ptr[length] + code - self.min_code[length]]
            code = (code << 1) | r.bit()
        raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Color transforms (JFIF)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt_seg(tq: int, table: np.ndarray) -> bytes:
    zz = table.flatten()[_ZZ_FLAT].astype(np.uint8)
    return _seg(0xDB, bytes([tq]) + zz.tobytes())


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th] + bits + vals))


def _encode_plane_block(
    block: np.ndarray, quant: np.ndarray, dc_pred: int,
    dc_codes: dict, ac_codes: dict, w: _BitWriter,
) -> int:
    coeffs = _C @ (block - 128.0) @ _C.T
    q = np.round(coeffs / quant).astype(np.int64)
    zz = q.flatten()[_ZZ_FLAT]
    diff = int(zz[0]) - dc_pred
    size = _category(diff)
    code, length = dc_codes[size]
    w.put(code, length)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if last_nz.size else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        w.put(c, ln)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.put(c, ln)
    return int(zz[0])


def encode_baseline(
    arr: np.ndarray,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.

    Default quant tables are ALL-ONES: constant-color blocks then
    round-trip exactly (their DCT is DC-only and integral).  Pass
    ``STD_QUANT_LUMA``-style tables for a genuinely lossy encode,
    ``subsample=True`` for 4:2:0 chroma, ``restart_interval=n`` to emit
    RST markers every n MCUs (exercises the decoder's restart path).
    """
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_baseline expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    ql = np.ones((8, 8), dtype=np.int64) if quant_luma is None else quant_luma
    qc = np.ones((8, 8), dtype=np.int64) if quant_chroma is None else quant_chroma
    ycc = _rgb_to_ycbcr(arr)
    hs = vs = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mx, my = -(-w // mcu_w), -(-h // mcu_h)

    def padded(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    ypl = padded(ycc[..., 0], my * mcu_h, mx * mcu_w)
    if subsample:
        cbf = padded(ycc[..., 1], my * mcu_h, mx * mcu_w)
        crf = padded(ycc[..., 2], my * mcu_h, mx * mcu_w)
        cb = (cbf[0::2, 0::2] + cbf[0::2, 1::2] + cbf[1::2, 0::2] + cbf[1::2, 1::2]) / 4.0
        cr = (crf[0::2, 0::2] + crf[0::2, 1::2] + crf[1::2, 0::2] + crf[1::2, 1::2]) / 4.0
    else:
        cb = padded(ycc[..., 1], my * 8, mx * 8)
        cr = padded(ycc[..., 2], my * 8, mx * 8)

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, ql) + _dqt_seg(1, qc)
    out += _seg(0xC0, struct.pack(
        ">BHHB", 8, h, w, 3
    ) + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += _dht_seg(0, 0, *_DC_LUMA) + _dht_seg(1, 0, *_AC_LUMA)
    out += _dht_seg(0, 1, *_DC_CHROMA) + _dht_seg(1, 1, *_AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    wtr = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    n_mcu = 0
    for yi in range(my):
        for xi in range(mx):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    r0, c0 = yi * mcu_h + by * 8, xi * mcu_w + bx * 8
                    preds[0] = _encode_plane_block(
                        ypl[r0 : r0 + 8, c0 : c0 + 8], ql, preds[0],
                        dc_l, ac_l, wtr,
                    )
            for ci, plane in ((1, cb), (2, cr)):
                r0, c0 = yi * 8, xi * 8
                preds[ci] = _encode_plane_block(
                    plane[r0 : r0 + 8, c0 : c0 + 8], qc, preds[ci],
                    dc_c, ac_c, wtr,
                )
            n_mcu += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def make_jpeg(width: int, height: int, gray: int) -> bytes:
    """Real baseline JFIF filled with one gray value — all-ones quant, so
    the constant image round-trips EXACTLY (DC-only blocks, integral
    coefficients); same synthesis semantics as make_bmp/make_ppm/
    make_png."""
    return encode_baseline(
        np.full((height, width, 3), gray, dtype=np.uint8)
    )


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_baseline(blob: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale files are
    broadcast to 3 channels).  Tables come from the file's own DQT/DHT
    segments.  Raises ValueError outside the documented scope."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG container (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    dri = 0
    scan = None
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (length,) = struct.unpack_from(">H", blob, pos)
        payload = blob[pos + 2 : pos + length]
        body_end = pos + length
        pos = body_end
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ_FLAT] = np.frombuffer(
                    payload, np.uint8, 64, p + 1
                ).astype(np.int64)
                quant[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(f"sampling factors {hi}x{vi} out of scope")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential (SOF0) JPEG is supported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            entropy_start = body_end
            pos = entropy_start
            break
        # APPn/COM/unknown: skipped via length
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        by_id[s["id"]].update(dc_t=s["dc"], ac_t=s["ac"])
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mx = -(-frame["w"] // mcu_w)
    my = -(-frame["h"] // mcu_h)
    planes = {
        c["id"]: np.zeros((my * 8 * c["v"], mx * 8 * c["h"]))
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    rdr = _BitReader(blob, pos)
    try:
        _decode_mcus(rdr, my, mx, dri, comps, huff, quant, planes, preds)
    except (_MarkerHit, IndexError) as exc:
        # module error contract: out-of-scope / corrupt input is always
        # ValueError — an unexpected marker mid-MCU or a truncated
        # entropy stream must not surface internal exception types
        # (ADVICE r8).
        raise ValueError(
            "corrupt JPEG: unexpected marker or truncated entropy stream"
        ) from exc

    h, w = frame["h"], frame["w"]
    up = {}
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(p, max_v // c["v"], axis=0)
        p = np.repeat(p, max_h // c["h"], axis=1)
        up[c["id"]] = p[:h, :w]
    if len(comps) == 1:
        y = np.clip(np.round(up[comps[0]["id"]]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    ids = [c["id"] for c in comps]
    return _ycbcr_to_rgb(up[ids[0]], up[ids[1]], up[ids[2]])


def _decode_mcus(rdr, my, mx, dri, comps, huff, quant, planes, preds):
    """Entropy-decode every MCU into ``planes`` (helper of
    decode_baseline; raises _MarkerHit/IndexError on malformed streams —
    the caller converts to the ValueError contract)."""
    n_mcu = 0
    for yi in range(my):
        for xi in range(mx):
            if dri and n_mcu and n_mcu % dri == 0:
                rdr.restart()
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_tab = huff[(0, c["dc_t"])]
                ac_tab = huff[(1, c["ac_t"])]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_tab.decode(rdr)
                        diff = _extend(rdr.receive(size), size)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(rdr)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(rdr.receive(size), size)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[_ZZ_FLAT] = zz * q.flatten()[_ZZ_FLAT]
                        block = _C.T @ coeffs.reshape(8, 8) @ _C + 128.0
                        r0 = (yi * c["v"] + by) * 8
                        c0 = (xi * c["h"] + bx) * 8
                        planes[c["id"]][r0 : r0 + 8, c0 : c0 + 8] = block
            n_mcu += 1


def jpeg_pixels(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 pixel array — alias mirroring png_pixels/
    bmp_pixels."""
    return decode_baseline(blob)


def decode_jpeg(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) — the same feature triple the other
    image decoders return."""
    px = decode_baseline(blob)
    mean = float(px.mean()) if px.size else 0.0
    return px.shape[1], px.shape[0], mean
