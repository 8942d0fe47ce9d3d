"""Uncompressed TIFF codec — stdlib ``struct`` + numpy only (round 8).

Baseline TIFF with Compression=1 is header + IFD tag table + raw strip
data — no entropy coding at all — so, with PNG/JPEG/GIF already real,
this closes the last simply-implementable image stub and shrinks
``decode_image`` to WebP (VP8) and compressed-TIFF variants, which
genuinely need external codecs.

Scope:

* decode: both byte orders (``II`` little- and ``MM`` big-endian),
  Compression=1 (none), 8-bit samples, PhotometricInterpretation 1
  (grayscale, broadcast to 3 channels) or 2 (RGB; extra samples such as
  alpha are dropped), chunky planar config, any strip layout.  LZW/
  Deflate/JPEG-compressed, tiled, planar, palette and 16-bit TIFFs
  raise ValueError with the offending tag value.
* encode: minimal single-strip little-endian RGB (the layout every TIFF
  reader accepts); lossless, so round trips are exact — same
  oracle-exactness property as the other lossless codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# Tag ids (TIFF 6.0 baseline)
_WIDTH, _LENGTH, _BPS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP = 262, 273, 277, 278
_STRIP_COUNTS, _PLANAR = 279, 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def encode_tiff(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> little-endian uncompressed RGB TIFF, one
    strip, IFD after the pixel data."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_tiff expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    pixels = arr.tobytes()
    data_off = 8
    ifd_off = data_off + len(pixels)
    if ifd_off % 2:  # IFD must be word-aligned
        pixels += b"\x00"
        ifd_off += 1
    # BitsPerSample needs 3 SHORTs -> stored out-of-line after the IFD
    n_tags = 9
    bps_off = ifd_off + 2 + n_tags * 12 + 4

    def tag(tid: int, ttype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, ttype, count, value)

    tags = b"".join([
        tag(_WIDTH, 4, 1, w),
        tag(_LENGTH, 4, 1, h),
        tag(_BPS, 3, 3, bps_off),
        tag(_COMPRESSION, 3, 1, 1),
        tag(_PHOTOMETRIC, 3, 1, 2),
        tag(_STRIP_OFFSETS, 4, 1, data_off),
        tag(_SPP, 3, 1, 3),
        tag(_STRIP_COUNTS, 4, 1, w * h * 3),
        tag(_PLANAR, 3, 1, 1),
    ])
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + pixels
        + struct.pack("<H", n_tags)
        + tags
        + struct.pack("<I", 0)  # no next IFD
        + struct.pack("<HHH", 8, 8, 8)
    )


def make_tiff(width: int, height: int, gray: int) -> bytes:
    """Real TIFF filled with one gray value — same synthesis semantics
    as the other make_* codecs; lossless, exact round trip."""
    return encode_tiff(np.full((height, width, 3), gray, dtype=np.uint8))


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


def tiff_pixels(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from an uncompressed baseline TIFF (first IFD)."""
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
        ):
            tags[tid] = _read_tag_values(
                blob, e, ttype, count, blob[base + 8 : base + 12]
            )
    if _WIDTH not in tags or _LENGTH not in tags:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    w, h = tags[_WIDTH][0], tags[_LENGTH][0]
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp != 1:
        raise ValueError(f"only uncompressed TIFF supported (Compression={comp})")
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
    counts = tags.get(_STRIP_COUNTS, [w * h * spp])
    data = b"".join(
        blob[o : o + c] for o, c in zip(offsets, counts)
    )
    if len(data) < w * h * spp:
        raise ValueError(
            f"TIFF strip data short: {len(data)} < {w * h * spp}"
        )
    px = np.frombuffer(data, np.uint8, w * h * spp).reshape(h, w, spp)
    if photometric == 1:  # grayscale (BlackIsZero)
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB; drop alpha/extra samples


def decode_tiff(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) — the same feature triple as the
    other image decoders."""
    px = tiff_pixels(blob)
    mean = float(px.mean()) if px.size else 0.0
    return px.shape[1], px.shape[0], mean
