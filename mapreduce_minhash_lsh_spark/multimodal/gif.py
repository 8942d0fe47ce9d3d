"""GIF codec — stdlib + numpy only (round 8).

GIF is palette-indexed pixels under LZW, both fully expressible without
external libs; with PNG and baseline JPEG already real, this closes the
third compressed-image stub and shrinks ``decode_image`` to TIFF/WebP.

Scope:

* decode: GIF87a and GIF89a, global and local color tables, interlaced
  and sequential row order, extension blocks skipped (including GCE —
  transparency is IGNORED: the transparent index still renders as its
  palette color, which is exact for the synth/feature surface this
  serves).  FIRST frame only — animation would need frame composition
  semantics (disposal methods) that the feature extractor doesn't ask
  for; a multi-frame file decodes to its first frame.
* encode: GIF87a, one global color table built from the image's unique
  colors (> 256 distinct colors raises — GIF's own limit; quantization
  is PIL territory), standard LZW with dictionary reset at 4096 codes,
  optional interlaced row order (exercises the decoder's de-interlace).
  Palette-representable images round-trip EXACTLY (GIF is lossless on
  indexed content) — same oracle-exactness trick as the other codecs.

The LZW bit loops are Python — the same stance as PNG's filter rows and
JPEG's huffman walk: a correctness surface, Arrow-batched around.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            end + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    put(clear, width)
    prev = b""
    for idx in indices.tolist():
        cur = prev + bytes([idx])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        prev = bytes([idx])
        if next_code >= 4096:
            put(clear, width)
            table, next_code, width = fresh()
    if prev:
        put(table[prev], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0  # bit position
    total_bits = len(data) * 8

    def get(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("GIF LZW stream truncated")
        byte0 = pos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        v = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return v

    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while n_out < n_pixels:
        code = get(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("invalid GIF LZW code")
        n = len(entry)
        out[n_out : n_out + n] = np.frombuffer(entry, dtype=np.uint8)[
            : max(0, min(n, n_pixels - n_out))
        ]
        n_out += n
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"GIF pixel data short: {n_out} < {n_pixels}")
    return out


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def encode_gif87a(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 -> GIF87a bytes.  The palette is the image's
    unique colors (raises past GIF's 256-color limit — color
    quantization is out of scope); indexed content round-trips
    exactly."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_gif87a expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs <= 256 distinct colors, image has {len(palette)}"
        )
    # color table size: power of two >= max(2, n)
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        indices = indices[_interlace_order(h)]
    min_code_size = max(2, bits)
    lzw = _lzw_encode(indices.reshape(-1), min_code_size)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def make_gif(width: int, height: int, gray: int) -> bytes:
    """Real GIF87a filled with one gray value — same synthesis semantics
    as the other make_* codecs; exact round trip (indexed content)."""
    return encode_gif87a(np.full((height, width, 3), gray, dtype=np.uint8))


def gif_pixels(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from a GIF87a/89a container (first frame)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF container (bad signature)")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(blob):
        b = blob[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 1
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("GIF image has no color table")
        min_code_size = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos]:
            ln = blob[pos]
            data += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(data), min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            rows = np.empty_like(indices)
            rows[_interlace_order(h)] = indices
            indices = rows
        return lct[indices]
    raise ValueError("GIF contains no image block")


def decode_gif(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) — the same feature triple as the
    other image decoders."""
    px = gif_pixels(blob)
    mean = float(px.mean()) if px.size else 0.0
    return px.shape[1], px.shape[0], mean
