"""WebP lossless (VP8L) codec — stdlib + numpy only (round 10).

WebP's lossless mode is entropy-coded ARGB with four reversible
transforms — all expressible without external libs; with PNG, baseline
JPEG, GIF and compressed TIFF already real, this closes the WebP half of
the ``decode_image`` stub and shrinks it to the genuinely environmental
codecs (lossy VP8 — a boolean arithmetic coder with loop filtering —
and HEVC/HEIC).

Scope (per the public "WebP Lossless Bitstream Specification"):

* decode: the FULL VP8L feature set — all four transforms (predictor
  with the 14 modes, cross-color, subtract-green, color-indexing with
  pixel bundling), color cache, meta-Huffman code groups, LZ77
  backward references with the 120-entry close-neighborhood distance
  map, simple and normal (RLE-coded) Huffman code headers.  The one
  scope cut: color-indexing combined with another transform raises —
  no known encoder emits that combination (libwebp's never does), and
  the reduced-width interaction is the only part of the spec this
  decoder does not implement.
* encode: a literal encoder for fixtures — optional subtract-green,
  optional single-mode predictor tile, optional color cache, and a
  palette (color-indexing) mode with pixel bundling; no LZ77 emission.
  Balanced canonical Huffman codes over the symbols present.  Every
  mode is lossless, so images round-trip EXACTLY — the same
  oracle-exactness trick as the other codecs.

The per-pixel loops are Python — the same stance as PNG's filter rows,
JPEG's huffman walk and GIF's LZW: a correctness surface, Arrow-batched
around (multimodal/binary.py).
"""

from __future__ import annotations

import struct

import numpy as np

# Transform type tags (2-bit codes from the bitstream).
_T_PREDICTOR = 0
_T_COLOR = 1
_T_SUBTRACT_GREEN = 2
_T_PALETTE = 3

# Code-length-code symbol order (same table as DEFLATE's idea, VP8L's
# ordering).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_HASH_MUL = 0x1E35A7BD


def _dist_map() -> list[tuple[int, int]]:
    """The 120 close-neighborhood (dx, dy) offsets, ordered by squared
    distance, then larger dy first, then |dx| ascending with positive dx
    before negative — the generation rule behind the spec's fixed table
    (validated against libwebp's packed table in tests)."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), p[0] < 0))
    return cands[:120]


_DIST_MAP = _dist_map()


def _plane_code_to_dist(width: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(dx + dy * width, 1)


# ---------------------------------------------------------------------------
# Bit IO: LSB-first within bytes; Huffman code bits walk root-first.
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_pos = self.pos >> 3
            if byte_pos >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            bit = (self.data[byte_pos] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put_bits(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def put_code(self, code: int, length: int) -> None:
        """Huffman codes are emitted MSB-first (root-first walk)."""
        for i in range(length - 1, -1, -1):
            self.put_bits((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# ---------------------------------------------------------------------------
# Canonical Huffman (DEFLATE semantics)
# ---------------------------------------------------------------------------


def _canonical_from_lengths(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with DEFLATE canonical assignment."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for length, sym in pairs:
        code <<= length - prev_len
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


class _HuffDecoder:
    def __init__(self, lengths: list[int]):
        nz = [s for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty Huffman code")
        if len(nz) == 1:
            self.single: int | None = nz[0]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.table = {
            (length, code): sym
            for sym, (code, length) in _canonical_from_lengths(lengths).items()
        }
        # Kraft completeness check — an over/under-subscribed code is
        # corrupt and would loop or mis-decode.
        kraft = sum(1 / (1 << l) for l in lengths if l > 0)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: non-canonical Huffman code lengths")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid Huffman code in stream")


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _HuffDecoder:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read_bits(8)
        else:
            sym0 = br.read_bits(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1  # decodes with zero bits via single-symbol path
            dec = _HuffDecoder(lengths)
            return dec
        sym1 = br.read_bits(8)
        if sym0 == sym1:
            raise ValueError("VP8L: repeated symbol in simple Huffman code")
        lengths[sym0] = 1
        lengths[sym1] = 1
        dec = _HuffDecoder(lengths)
        # simple codes are POSITIONAL, not canonical: the first listed
        # symbol takes code 0 even when sym0 > sym1
        dec.table = {(1, 0): sym0, (1, 1): sym1}
        return dec
    # normal code: code-length code first
    num_clc = 4 + br.read_bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read_bits(3)
    clc = _HuffDecoder(clc_lengths)
    if br.read_bit():  # bounded number of symbol reads
        length_nbits = 2 + 2 * br.read_bits(3)
        max_reads = 2 + br.read_bits(length_nbits)
    else:
        max_reads = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_reads == 0:
            break
        max_reads -= 1
        cl = clc.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        elif cl == 16:
            repeat = 3 + br.read_bits(2)
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L: code length repeat overflow")
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read_bits(3)
        else:
            symbol += 11 + br.read_bits(7)
    if symbol > alphabet_size:
        raise ValueError("VP8L: code length repeat overflow")
    return _HuffDecoder(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


# ---------------------------------------------------------------------------
# Pixel helpers (packed ARGB ints)
# ---------------------------------------------------------------------------


def _add_px(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _sub_px(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) & 0xFF) << 24
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) & 0xFF) << 16
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) & 0xFF) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1) & 0xFF)
    )


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(left: int, top: int, topleft: int) -> int:
    la, lr, lg, lb = _chans(left)
    ta, tr, tg, tb = _chans(top)
    ca, cr, cg, cb = _chans(topleft)
    pa, pr, pg, pb = la + ta - ca, lr + tr - cr, lg + tg - cg, lb + tb - cb
    p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return left if p_l < p_t else top


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = _clamp(((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) - ((c >> shift) & 0xFF))
        out |= v << shift
    return out


def _clamp_add_sub_half(ab: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        x = (ab >> shift) & 0xFF
        d = x - ((c >> shift) & 0xFF)
        # C integer division truncates toward zero.
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(x + half) << shift
    return out


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _clamp_add_sub_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(left, top), topleft)
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _ct_delta(t: int, c: int) -> int:
    """Cross-color delta: (int8)t * (int8)c >> 5 (arithmetic shift)."""
    ts = ((t & 0xFF) ^ 0x80) - 0x80
    cs = ((c & 0xFF) ^ 0x80) - 0x80
    return (ts * cs) >> 5


def _cache_key(px: int, bits: int) -> int:
    return ((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - bits)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _palette_params(n_colors: int) -> tuple[int, int]:
    """(bits per packed index, indices per green byte)."""
    if n_colors <= 2:
        return 1, 8
    if n_colors <= 4:
        return 2, 4
    if n_colors <= 16:
        return 4, 2
    return 8, 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """The spatially-coded image: color cache?, meta-Huffman? (level 0
    only), 5 Huffman codes per group, then the LZ77 symbol loop."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: invalid color cache bits {cache_bits}")
    meta_idx: list[int] | None = None
    hbits = 0
    hw = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        hbits = br.read_bits(3) + 2
        hw = _ceil_div(w, 1 << hbits)
        hh = _ceil_div(h, 1 << hbits)
        himg = _decode_entropy_image(br, hw, hh, allow_meta=False)
        meta_idx = [(p >> 8) & 0xFFFF for p in himg]
        n_groups = max(meta_idx) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [
        [_read_huffman_code(br, s) for s in sizes] for _ in range(n_groups)
    ]
    n = w * h
    pixels = [0] * n
    cache = [0] * cache_size
    pos = 0
    group = groups[0]
    while pos < n:
        if meta_idx is not None:
            x, y = pos % w, pos // w
            group = groups[meta_idx[(y >> hbits) * hw + (x >> hbits)]]
        s = group[0].read(br)
        if s < 256:
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            pixels[pos] = px
            pos += 1
            if cache_bits:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 256 + 24:
            length = _prefix_value(s - 256, br)
            dist = _plane_code_to_dist(w, _prefix_value(group[4].read(br), br))
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache_bits:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            if s - 256 - 24 >= cache_size:
                raise ValueError("VP8L: color cache index out of range")
            pixels[pos] = cache[s - 256 - 24]
            pos += 1
    return pixels


def _inverse_predictor(
    pixels: list[int], w: int, h: int, bits: int, tiles: list[int]
) -> None:
    tw = _ceil_div(w, 1 << bits)
    pos = 0
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[pos - 1]  # forced left on the first row
            elif x == 0:
                pred = pixels[pos - w]  # forced top on the first column
            else:
                mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                left = pixels[pos - 1]
                top = pixels[pos - w]
                topleft = pixels[pos - w - 1]
                # top-right of the last column wraps to the current
                # row's first pixel (already reconstructed) — the
                # flat-index arithmetic libwebp relies on.
                topright = pixels[pos - w + 1]
                pred = _predict(mode, left, top, topleft, topright)
            pixels[pos] = _add_px(pixels[pos], pred)
            pos += 1


def _inverse_color_transform(
    pixels: list[int], w: int, h: int, bits: int, tiles: list[int]
) -> None:
    tw = _ceil_div(w, 1 << bits)
    pos = 0
    for y in range(h):
        for x in range(w):
            cte = tiles[(y >> bits) * tw + (x >> bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            px = pixels[pos]
            a, r, g, b = _chans(px)
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            pixels[pos] = (a << 24) | (r << 16) | (g << 8) | b
            pos += 1


def _inverse_subtract_green(pixels: list[int]) -> None:
    for i, px in enumerate(pixels):
        a, r, g, b = _chans(px)
        pixels[i] = (a << 24) | (((r + g) & 0xFF) << 16) | (g << 8) | ((b + g) & 0xFF)


def _apply_palette(
    packed: list[int], w: int, h: int, palette: list[int]
) -> list[int]:
    bits_pp, ppp = _palette_params(len(palette))
    rw = _ceil_div(w, ppp)
    mask = (1 << bits_pp) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            g = (packed[y * rw + x // ppp] >> 8) & 0xFF
            idx = (g >> ((x % ppp) * bits_pp)) & mask
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


def vp8l_argb(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a raw VP8L chunk payload -> (width, height, (h,w,4) RGBA)."""
    br = _BitReader(payload)
    if br.read_bits(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bit()  # alpha-used hint
    if br.read_bits(3) != 0:
        raise ValueError("VP8L: unsupported version")
    transforms: list[tuple] = []
    seen: set[int] = set()
    data_w = w
    while br.read_bit():
        ttype = br.read_bits(2)
        if ttype in seen:
            raise ValueError("VP8L: repeated transform")
        seen.add(ttype)
        if ttype == _T_SUBTRACT_GREEN:
            transforms.append((_T_SUBTRACT_GREEN,))
        elif ttype in (_T_PREDICTOR, _T_COLOR):
            bits = br.read_bits(3) + 2
            tw = _ceil_div(w, 1 << bits)
            th = _ceil_div(h, 1 << bits)
            tiles = _decode_entropy_image(br, tw, th, allow_meta=False)
            transforms.append((ttype, bits, tiles))
        else:  # color indexing
            n_colors = br.read_bits(8) + 1
            raw = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            palette = list(raw)
            for i in range(1, n_colors):
                palette[i] = _add_px(palette[i], palette[i - 1])
            transforms.append((_T_PALETTE, palette))
            _, ppp = _palette_params(n_colors)
            data_w = _ceil_div(w, ppp)
    if any(t[0] == _T_PALETTE for t in transforms) and len(transforms) > 1:
        raise NotImplementedError(
            "VP8L: color-indexing combined with another transform is not "
            "supported (no known encoder emits it)"
        )
    pixels = _decode_entropy_image(br, data_w, h, allow_meta=True)
    for t in reversed(transforms):
        if t[0] == _T_PALETTE:
            pixels = _apply_palette(pixels, w, h, t[1])
        elif t[0] == _T_PREDICTOR:
            _inverse_predictor(pixels, w, h, t[1], t[2])
        elif t[0] == _T_COLOR:
            _inverse_color_transform(pixels, w, h, t[1], t[2])
        else:
            _inverse_subtract_green(pixels)
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (arr >> 16) & 0xFF
    rgba[:, :, 1] = (arr >> 8) & 0xFF
    rgba[:, :, 2] = arr & 0xFF
    rgba[:, :, 3] = (arr >> 24) & 0xFF
    return w, h, rgba


def webp_pixels(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a RIFF/WEBP container holding a VP8L
    (lossless) bitstream.  Lossy VP8 and extended VP8X files raise with
    the codec named — those genuinely need external decoders."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        payload = blob[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            _, _, rgba = vp8l_argb(payload)
            return rgba[:, :, :3]
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8 boolean arithmetic coder) requires "
                "external codecs; lossless VP8L decodes for real"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WEBP container has no VP8L chunk")


def decode_webp(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) — the same feature triple the other
    image decoders return."""
    px = webp_pixels(blob)
    mean = float(px.mean()) if px.size else 0.0
    return px.shape[1], px.shape[0], mean


# ---------------------------------------------------------------------------
# Encoder (fixtures + resize round trip)
# ---------------------------------------------------------------------------


def _balanced_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Kraft-complete code lengths over the present symbols: a balanced
    tree (depths d-1/d), shorter codes to higher frequencies.  Optimal
    compression is not the goal — validity and determinism are."""
    syms = sorted(freqs, key=lambda s: (-freqs[s], s))
    n = len(syms)
    if n == 1:
        return {syms[0]: 1}
    d = (n - 1).bit_length()
    n_short = (1 << d) - n
    return {s: (d - 1 if i < n_short else d) for i, s in enumerate(syms)}


def _write_huffman_code(bw: _BitWriter, freqs: dict[int, int], alphabet: int):
    """Emit one Huffman code header; returns symbol -> (code, length)."""
    syms = sorted(freqs)
    if not syms:
        syms = [0]  # unused tree (e.g. distance codes in a literal stream)
    if len(syms) <= 2 and syms[-1] < 256:
        # simple code
        bw.put_bits(1, 1)
        bw.put_bits(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.put_bits(1, 1)
            bw.put_bits(syms[0], 8)
        else:
            bw.put_bits(0, 1)
            bw.put_bits(syms[0], 1)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        bw.put_bits(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    # normal code
    bw.put_bits(0, 1)
    lengths = _balanced_lengths(freqs if freqs else {0: 1})
    if len(lengths) == 1:
        # single-symbol tree: decoder consumes ZERO bits per symbol
        table = {next(iter(lengths)): (0, 0)}
    else:
        table = _canonical_from_lengths(
            [lengths.get(s, 0) for s in range(alphabet)]
        )
    n_emit = max(lengths) + 1  # slots 0..last_nonzero, one read each
    cl_seq = [lengths.get(s, 0) for s in range(n_emit)]
    clc_lengths_map = _balanced_lengths(
        {cl: cl_seq.count(cl) for cl in set(cl_seq)}
    )
    if len(clc_lengths_map) == 1:
        # single-CL-symbol tree (all emitted lengths identical, e.g. a
        # narrow palette image whose green symbols are equiprobable):
        # the decoder's single-symbol _HuffDecoder consumes ZERO bits
        # per read, so the writer must emit zero bits too — a canonical
        # (0, 1) code here desyncs the stream by one bit per symbol.
        clc_table = {next(iter(clc_lengths_map)): (0, 0)}
    else:
        clc_table = _canonical_from_lengths(
            [clc_lengths_map.get(s, 0) for s in range(19)]
        )
    num_clc = max(
        i + 1 for i, s in enumerate(_CLC_ORDER) if clc_lengths_map.get(s, 0) > 0
    )
    num_clc = max(num_clc, 4)
    bw.put_bits(num_clc - 4, 4)
    for i in range(num_clc):
        bw.put_bits(clc_lengths_map.get(_CLC_ORDER[i], 0), 3)
    # bound the symbol reads to n_emit (remaining slots default to 0)
    if n_emit < alphabet:
        bw.put_bits(1, 1)
        k = 0
        while (1 << (2 + 2 * k)) < n_emit - 2 + 1:
            k += 1
        bw.put_bits(k, 3)
        bw.put_bits(n_emit - 2, 2 + 2 * k)
    else:
        bw.put_bits(0, 1)
    for cl in cl_seq:
        code, length = clc_table[cl]
        bw.put_code(code, length)
    return table


def _emit_literals(
    bw: _BitWriter,
    pixels: list[int],
    cache_bits: int,
    top_level: bool = False,
) -> None:
    """Entropy-code a pixel list as literals (+ optional color cache):
    cache bit, no meta-Huffman (top level only — sub-images have no
    meta bit in the format), 5 code headers, then the symbols."""
    if cache_bits:
        bw.put_bits(1, 1)
        bw.put_bits(cache_bits, 4)
    else:
        bw.put_bits(0, 1)
    if top_level:
        bw.put_bits(0, 1)  # no meta-Huffman
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    cache_live = [False] * cache_size
    # first pass: decide literal vs cache symbol per pixel
    plan: list[tuple[int, int]] = []  # (green_sym, px)
    for px in pixels:
        if cache_bits:
            key = _cache_key(px, cache_bits)
            if cache_live[key] and cache[key] == px:
                plan.append((256 + 24 + key, px))
                continue
            cache[key] = px
            cache_live[key] = True
        plan.append(((px >> 8) & 0xFF, px))
    g_freq: dict[int, int] = {}
    r_freq: dict[int, int] = {}
    b_freq: dict[int, int] = {}
    a_freq: dict[int, int] = {}
    for sym, px in plan:
        g_freq[sym] = g_freq.get(sym, 0) + 1
        if sym < 256:
            a, r, _, b = _chans(px)
            r_freq[r] = r_freq.get(r, 0) + 1
            b_freq[b] = b_freq.get(b, 0) + 1
            a_freq[a] = a_freq.get(a, 0) + 1
    g_tab = _write_huffman_code(bw, g_freq, 256 + 24 + cache_size)
    r_tab = _write_huffman_code(bw, r_freq, 256)
    b_tab = _write_huffman_code(bw, b_freq, 256)
    a_tab = _write_huffman_code(bw, a_freq, 256)
    _write_huffman_code(bw, {}, 40)  # distance tree: unused
    for sym, px in plan:
        bw.put_code(*g_tab[sym])
        if sym < 256:
            a, r, _, b = _chans(px)
            bw.put_code(*r_tab[r])
            bw.put_code(*b_tab[b])
            bw.put_code(*a_tab[a])


def encode_vp8l(
    arr: np.ndarray,
    *,
    palette: bool = False,
    subtract_green: bool = False,
    predictor: int | None = None,
    cache_bits: int = 0,
) -> bytes:
    """(h, w, 3|4) uint8 -> RIFF/WEBP bytes with a VP8L chunk.

    Literal encoder (no LZ77): optional subtract-green, optional
    uniform-mode predictor (one tile covering the image, so
    max(w, h) <= 512), optional color cache, or palette mode with pixel
    bundling (mutually exclusive with the others, as in the decoder).
    Everything is lossless; images round-trip exactly.
    """
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 array")
    h, w = arr.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be in [1, 16384]")
    if palette and (subtract_green or predictor is not None):
        raise ValueError("palette mode excludes the other transforms")
    a_chan = (
        arr[:, :, 3].astype(np.uint32)
        if arr.shape[2] == 4
        else np.full((h, w), 255, dtype=np.uint32)
    )
    packed = (
        (a_chan << 24)
        | (arr[:, :, 0].astype(np.uint32) << 16)
        | (arr[:, :, 1].astype(np.uint32) << 8)
        | arr[:, :, 2].astype(np.uint32)
    )
    pixels = [int(p) for p in packed.reshape(-1)]
    bw = _BitWriter()
    bw.put_bits(0x2F, 8)
    bw.put_bits(w - 1, 14)
    bw.put_bits(h - 1, 14)
    bw.put_bits(1 if arr.shape[2] == 4 else 0, 1)
    bw.put_bits(0, 3)  # version
    if palette:
        colors: list[int] = []
        index_of: dict[int, int] = {}
        for px in pixels:
            if px not in index_of:
                index_of[px] = len(colors)
                colors.append(px)
        if len(colors) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        bw.put_bits(1, 1)
        bw.put_bits(_T_PALETTE, 2)
        bw.put_bits(len(colors) - 1, 8)
        deltas = [colors[0]] + [
            _sub_px(colors[i], colors[i - 1]) for i in range(1, len(colors))
        ]
        _emit_literals(bw, deltas, 0)
        bits_pp, ppp = _palette_params(len(colors))
        rw = _ceil_div(w, ppp)
        bundled = []
        for y in range(h):
            for xr in range(rw):
                g = 0
                for j in range(ppp):
                    x = xr * ppp + j
                    if x < w:
                        g |= index_of[pixels[y * w + x]] << (j * bits_pp)
                bundled.append(0xFF000000 | (g << 8))
        bw.put_bits(0, 1)  # end of transforms
        _emit_literals(bw, bundled, cache_bits, top_level=True)
    else:
        if subtract_green:
            bw.put_bits(1, 1)
            bw.put_bits(_T_SUBTRACT_GREEN, 2)
            pixels = [
                (px & 0xFF00FF00)
                | (((((px >> 16) & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF) << 16)
                | (((px & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF)
                for px in pixels
            ]
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("predictor mode must be in [0, 13]")
            if max(w, h) > 512:
                raise ValueError(
                    "uniform-predictor encode covers one tile: max dim 512"
                )
            bits = max(2, max(w - 1, h - 1).bit_length())
            bw.put_bits(1, 1)
            bw.put_bits(_T_PREDICTOR, 2)
            bw.put_bits(bits - 2, 3)
            _emit_literals(bw, [0xFF000000 | (predictor << 8)], 0)
            # residuals against the decoder's reconstruction (= the
            # original pixels, since the scheme is lossless), honoring
            # the forced edge modes
            res = [0] * (w * h)
            for pos in range(w * h):
                x, y = pos % w, pos // w
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pixels[pos - 1]
                elif x == 0:
                    pred = pixels[pos - w]
                else:
                    pred = _predict(
                        predictor,
                        pixels[pos - 1],
                        pixels[pos - w],
                        pixels[pos - w - 1],
                        pixels[pos - w + 1],
                    )
                res[pos] = _sub_px(pixels[pos], pred)
            pixels = res
        bw.put_bits(0, 1)  # end of transforms
        _emit_literals(bw, pixels, cache_bits, top_level=True)
    payload = bw.bytes()
    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff


# Encoder classes synth_webp_media cycles through by doc_id — every
# encode mode, hence every decode path the fixtures can exercise.
WEBP_SYNTH_CLASSES = (
    {"palette": True},
    {},
    {"subtract_green": True},
    {"predictor": 2, "subtract_green": True},
    {"cache_bits": 4},
)


def make_webp(width: int, height: int, gray: int, **modes) -> bytes:
    """Constant-gray RGB WebP (lossless), same fixture contract as
    make_png/make_gif/make_tiff."""
    arr = np.full((height, width, 3), gray, dtype=np.uint8)
    return encode_vp8l(arr, **modes)
