"""TIFF codec — stdlib ``struct``/``zlib`` + numpy only (rounds 8-9).

Round 8 shipped the uncompressed baseline (header + IFD tag table + raw
strips).  Round 9 (VERDICT r8 #4) adds the three compression schemes
that need no external codec: LZW (Compression=5 — the TIFF variant:
MSB-first bit packing with the spec's early code-width change, unlike
GIF's LSB-first late change), PackBits (32773 — the ~15-line RLE), and
Deflate (8 / legacy 32946 — stdlib zlib), each with the horizontal-
differencing Predictor (tag 317, value 2).  ``decode_image`` in
binary.py now stubs only WebP/HEIC (VP8/HEVC entropy coding genuinely
needs external codecs).

Scope:

* decode: both byte orders (``II`` little- and ``MM`` big-endian),
  Compression 1/5/8/32773/32946, Predictor 1/2, 8-bit samples,
  PhotometricInterpretation 1 (grayscale, broadcast to 3 channels) or 2
  (RGB; extra samples such as alpha are dropped), chunky planar config,
  any strip layout (strips decompress independently).  JPEG-in-TIFF,
  tiled, planar, palette and 16-bit TIFFs raise ValueError with the
  offending tag value.
* encode: single-strip little-endian RGB in any of the four
  compressions, optional predictor; all four are lossless, so round
  trips are exact — same oracle-exactness property as the other
  lossless codecs.

The LZW bit loops are Python — the same stance as GIF's LZW and JPEG's
huffman walk: a correctness surface, Arrow-batched around.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Tag ids (TIFF 6.0 baseline)
_WIDTH, _LENGTH, _BPS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP = 262, 273, 277, 278
_STRIP_COUNTS, _PLANAR, _PREDICTOR = 279, 284, 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

# Compression tag values this reader understands
_COMP_NONE, _COMP_LZW, _COMP_DEFLATE = 1, 5, 8
_COMP_PACKBITS, _COMP_DEFLATE_OLD = 32773, 32946


# ---------------------------------------------------------------------------
# LZW (TIFF flavor: MSB-first bits, clear=256/EOI=257, EARLY width change)
# ---------------------------------------------------------------------------


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-LZW compress one strip.  Differences from the GIF LZW in
    multimodal/gif.py: 8-bit symbols always (clear=256, EOI=257), codes
    packed MSB-first, and the code width grows one table entry EARLY
    (when the next free code hits 511/1023/2047 — TIFF6 spec pseudocode;
    GIF grows at 512/1024/2048)."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    put(clear, width)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        prev = bytes([byte])
        if next_code >= 4094:  # spec: clear before the table fills
            put(clear, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
    if prev:
        put(table[prev], width)
    put(eoi, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """Inverse of _lzw_encode_tiff; decodes any spec-conformant TIFF-LZW
    strip (early-change width, MSB-first), stopping at EOI or once
    ``expected`` bytes are produced."""
    clear, eoi = 256, 257
    pos = 0
    total_bits = len(data) * 8

    def get(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("TIFF LZW strip truncated")
        b0 = pos >> 3
        chunk = int.from_bytes(data[b0 : b0 + 3].ljust(3, b"\x00"), "big")
        v = (chunk >> (24 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = get(width)
        if code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if not table or code >= 256:
                raise ValueError("invalid TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("invalid TIFF LZW code")
        out += entry
        prev = entry
        # Early change, one entry EARLIER than the encoder's post-add
        # check: the decoder's table lags the encoder by exactly one
        # entry at read time (TIFF6 spec: "the decoder is one code
        # behind"), so the writer's 511/1023/2047 switch points are
        # 510/1022/2046 here.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# PackBits (Compression=32773): Apple RLE, byte-oriented
# ---------------------------------------------------------------------------


def _packbits_encode(data: bytes) -> bytes:
    """PackBits compress: runs of >= 3 identical bytes become
    (257-count, byte); everything else is literal blocks of <= 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal block: until the next >=3 run or 128 bytes
        lit = i
        while j < n and j - lit < 128:
            k = j + 1
            while k < n and k - j < 128 and data[k] == data[j]:
                k += 1
            if k - j >= 3:
                break
            j = k
        j = min(j, lit + 128)
        out += bytes([j - lit - 1]) + data[lit:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 128:  # ctrl+1 literal bytes
            if i + ctrl + 1 > n:
                raise ValueError("TIFF PackBits strip truncated")
            out += data[i : i + ctrl + 1]
            i += ctrl + 1
        elif ctrl > 128:  # repeat next byte 257-ctrl times
            if i >= n:
                raise ValueError("TIFF PackBits strip truncated")
            out += bytes([data[i]]) * (257 - ctrl)
            i += 1
        # ctrl == 128: noop per spec
    return bytes(out)


# ---------------------------------------------------------------------------
# Horizontal-differencing predictor (tag 317 = 2)
# ---------------------------------------------------------------------------


def _predict_rows(arr: np.ndarray) -> np.ndarray:
    """(h, w, spp) -> horizontal differences mod 256 (encode side)."""
    diff = arr.astype(np.int64)
    diff[:, 1:, :] = (diff[:, 1:, :] - diff[:, :-1, :]) % 256
    return diff.astype(np.uint8)


def _unpredict_rows(arr: np.ndarray) -> np.ndarray:
    """Inverse: cumulative sum mod 256 along each row, per sample."""
    return (np.cumsum(arr.astype(np.int64), axis=1) % 256).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def encode_tiff(
    arr: np.ndarray, compression: int = _COMP_NONE, predictor: int = 1
) -> bytes:
    """(h, w, 3) uint8 -> little-endian RGB TIFF, one strip, IFD after
    the pixel data.  ``compression`` in {1 none, 5 LZW, 8 deflate,
    32773 PackBits}; ``predictor`` 2 applies horizontal differencing
    before compression (meaningless for compression=1 and rejected)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_tiff expects (h, w, 3) uint8")
    if compression not in (_COMP_NONE, _COMP_LZW, _COMP_DEFLATE, _COMP_PACKBITS):
        raise ValueError(f"encode_tiff: unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"encode_tiff: unsupported predictor {predictor}")
    if predictor == 2 and compression == _COMP_NONE:
        raise ValueError("predictor=2 requires a compression scheme")
    h, w = arr.shape[:2]
    raw = _predict_rows(arr) if predictor == 2 else arr
    if compression == _COMP_LZW:
        pixels = _lzw_encode_tiff(raw.tobytes())
    elif compression == _COMP_DEFLATE:
        pixels = zlib.compress(raw.tobytes())
    elif compression == _COMP_PACKBITS:
        pixels = _packbits_encode(raw.tobytes())
    else:
        pixels = raw.tobytes()
    n_strip_bytes = len(pixels)
    data_off = 8
    ifd_off = data_off + n_strip_bytes
    if ifd_off % 2:  # IFD must be word-aligned
        pixels += b"\x00"
        ifd_off += 1
    # BitsPerSample needs 3 SHORTs -> stored out-of-line after the IFD
    n_tags = 9 + (predictor == 2)
    bps_off = ifd_off + 2 + n_tags * 12 + 4

    def tag(tid: int, ttype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, ttype, count, value)

    tags = [
        tag(_WIDTH, 4, 1, w),
        tag(_LENGTH, 4, 1, h),
        tag(_BPS, 3, 3, bps_off),
        tag(_COMPRESSION, 3, 1, compression),
        tag(_PHOTOMETRIC, 3, 1, 2),
        tag(_STRIP_OFFSETS, 4, 1, data_off),
        tag(_SPP, 3, 1, 3),
        tag(_STRIP_COUNTS, 4, 1, n_strip_bytes),
        tag(_PLANAR, 3, 1, 1),
    ]
    if predictor == 2:
        tags.append(tag(_PREDICTOR, 3, 1, 2))
    tags.sort(key=lambda t: struct.unpack("<H", t[:2])[0])  # spec: ascending
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + pixels
        + struct.pack("<H", n_tags)
        + b"".join(tags)
        + struct.pack("<I", 0)  # no next IFD
        + struct.pack("<HHH", 8, 8, 8)
    )


def make_tiff(
    width: int, height: int, gray: int,
    compression: int = _COMP_NONE, predictor: int = 1,
) -> bytes:
    """Real TIFF filled with one gray value — same synthesis semantics
    as the other make_* codecs; every supported compression is lossless,
    so round trips are exact."""
    return encode_tiff(
        np.full((height, width, 3), gray, dtype=np.uint8),
        compression=compression, predictor=predictor,
    )


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _read_tag_values(blob: bytes, e: str, ttype: int, count: int,
                     raw: bytes) -> list[int]:
    """Tag values, inline or via offset (values > 4 bytes)."""
    size = _TYPE_SIZES.get(ttype)
    if size is None:
        raise ValueError(f"unsupported TIFF tag type {ttype}")
    fmt = {1: "B", 3: "H", 4: "I"}.get(ttype)
    if fmt is None:
        raise ValueError(f"unsupported TIFF tag type {ttype} for this reader")
    if size * count <= 4:
        data = raw
    else:
        (off,) = struct.unpack(f"{e}I", raw)
        data = blob[off : off + size * count]
    return list(struct.unpack(f"{e}{count}{fmt}", data[: size * count]))


def _decompress_strip(raw: bytes, comp: int, expected: int) -> bytes:
    if comp == _COMP_NONE:
        return raw[:expected]
    if comp == _COMP_LZW:
        return _lzw_decode_tiff(raw, expected)
    if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        try:
            return zlib.decompress(raw)[:expected]
        except zlib.error as exc:
            raise ValueError(f"corrupt TIFF deflate strip: {exc}") from exc
    return _packbits_decode(raw)[:expected]


def tiff_pixels(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from a baseline TIFF (first IFD): Compression
    1/5/8/32773/32946, Predictor 1/2, 8-bit gray or RGB, chunky."""
    if blob[:4] == b"II\x2a\x00":
        e = "<"
    elif blob[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF container (bad byte-order/magic)")
    (ifd_off,) = struct.unpack_from(f"{e}I", blob, 4)
    (n_tags,) = struct.unpack_from(f"{e}H", blob, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + i * 12
        tid, ttype, count = struct.unpack_from(f"{e}HHI", blob, base)
        if tid in (
            _WIDTH, _LENGTH, _BPS, _COMPRESSION, _PHOTOMETRIC,
            _STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR,
            _PREDICTOR,
        ):
            tags[tid] = _read_tag_values(
                blob, e, ttype, count, blob[base + 8 : base + 12]
            )
    if _WIDTH not in tags or _LENGTH not in tags:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    w, h = tags[_WIDTH][0], tags[_LENGTH][0]
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (_COMP_NONE, _COMP_LZW, _COMP_DEFLATE,
                    _COMP_PACKBITS, _COMP_DEFLATE_OLD):
        raise ValueError(
            f"unsupported TIFF Compression={comp} (JPEG-in-TIFF?)"
        )
    predictor = tags.get(_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF Predictor={predictor}")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise ValueError("planar TIFF not supported (chunky only)")
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    bps = tags.get(_BPS, [8] * spp)
    if any(b != 8 for b in bps):
        raise ValueError(f"only 8-bit TIFF supported (BitsPerSample={bps})")
    if photometric not in (1, 2):
        raise ValueError(
            f"unsupported PhotometricInterpretation {photometric} (palette?)"
        )
    offsets = tags[_STRIP_OFFSETS]
    counts = tags.get(_STRIP_COUNTS, [len(blob) - offsets[0]])
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0]
    stride = w * spp
    parts = []
    for i, (o, c) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, h - i * rows_per_strip)
        if strip_rows <= 0:
            break
        parts.append(_decompress_strip(blob[o : o + c], comp, strip_rows * stride))
    data = b"".join(parts)
    if len(data) < h * stride:
        raise ValueError(
            f"TIFF strip data short: {len(data)} < {h * stride}"
        )
    px = np.frombuffer(data, np.uint8, h * stride).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing, per row per sample
        px = _unpredict_rows(px)
    if photometric == 1:  # grayscale (BlackIsZero)
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB; drop alpha/extra samples


def decode_tiff(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) — the same feature triple as the
    other image decoders."""
    px = tiff_pixels(blob)
    mean = float(px.mean()) if px.size else 0.0
    return px.shape[1], px.shape[0], mean
