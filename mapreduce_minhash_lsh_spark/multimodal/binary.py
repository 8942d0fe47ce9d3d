"""Binary-column (image/audio/video) processing plumbing.

Design for 100 TB multimodal data: media travel as opaque ``binary``
columns with a typed metadata struct alongside; decode / feature-extract
/ resize / frame-sample run as Arrow-batched pandas iterators inside
``mapInPandas`` (one Python worker per partition, whole record-batches
per hop — never per-row UDF calls).  Partition sizing note: binary blobs
make rows wide, so the scan should target ~64-128 MB input splits
(spark.sql.files.maxPartitionBytes) to keep Arrow batches bounded.

Codec support is two-tier:

* REAL codecs, no external libs (rounds 7-8): WAV via stdlib ``wave`` +
  numpy (sample rate, frame count, duration, RMS), BMP (24-bit
  uncompressed) and binary PPM (P6) via ``struct`` + numpy (width,
  height, mean pixel), and — round 8 — PNG via stdlib ``zlib`` + numpy
  (chunk walk, IDAT inflate, all five scanline filters unfiltered;
  8-bit gray / RGB / RGBA).  ``make_wav``/``make_bmp``/``make_ppm``/
  ``make_png`` emit real container bytes; ``decode_wav``/``decode_bmp``
  /``decode_ppm``/``decode_png`` parse them back.  ``synth_media`` +
  ``extract_media_features`` run the full round trip distributed
  (Arrow-batched mapInPandas), and the registry's ``multimodal_features``
  / ``multimodal_png`` oracles check the decoded values.
* Baseline JPEG (round 8): huffman + 8x8 DCT in numpy — real encode AND
  decode, including 4:2:0 subsampling and restart markers; see
  ``multimodal/jpeg.py`` for the exact scope.  Constant-gray synth
  JPEGs use all-ones quant tables, making the lossy format EXACT for
  the oracle-checked round trip.
* GIF (round 8): LZW in numpy+Python — real encode (87a, <=256-color
  palette) and decode (87a/89a, interlace, local color tables,
  extension skip); see ``multimodal/gif.py``.
* TIFF (rounds 8-9): IFD walk in struct+numpy, both byte orders,
  gray/RGB, any strip layout; round 9 adds LZW (MSB-first,
  early-change), PackBits and Deflate strip compression plus the
  horizontal predictor; see ``multimodal/tiff.py``.
* Residual compressed formats (WebP/HEIC images, MP4/MP3 audio-video)
  need PIL/ffmpeg, which are NOT in this container:
  ``decode_image``/``decode_audio`` raise NotImplementedError, and
  ``fake_decode`` — a deterministic stand-in deriving "features" from
  raw bytes — keeps that plumbing testable.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed metadata carried next to the blob (media_type drives the decoder).
MEDIA_SCHEMA = (
    "id long, media binary, media_type string, width int, height int, "
    "sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "id long, n_bytes long, checksum long, feat0 double, feat1 double"

CHECKSUM_PREFIX = 16


def decode_image(blob: bytes):  # pragma: no cover - requires codec libs
    """Residual compressed-image decode (lossy-VP8 WebP, HEIC,
    JPEG-in-TIFF / tiled TIFF) — requires PIL/opencv, not present in
    this container.  STUB; its scope shrank again in round 10: lossless
    WebP (the full VP8L bitstream — all four transforms, color cache,
    meta-Huffman, LZ77) now decodes for real in multimodal/webp.py,
    joining compressed TIFF (round 9), PNG (zlib+numpy), baseline JPEG
    (huffman+DCT in numpy, multimodal/jpeg.py), GIF (LZW,
    multimodal/gif.py) and BMP/PPM.  What remains genuinely needs
    external entropy/transform codecs (VP8's boolean arithmetic coder,
    HEVC); the Spark-side plumbing is identical either way."""
    raise NotImplementedError(
        "lossy-WebP(VP8)/HEIC codecs unavailable in this environment; "
        "lossless WebP (VP8L)/JPEG/PNG/GIF/TIFF (incl. LZW/PackBits/"
        "Deflate)/BMP/PPM have real decoders (decode_webp/decode_jpeg/"
        "decode_png/decode_gif/decode_tiff/decode_bmp/decode_ppm)"
    )


def decode_audio(blob: bytes):  # pragma: no cover - requires codec libs
    """Residual compressed-audio decode (MP3/AAC/Opus — psychoacoustic
    transforms + entropy coders) — STUB; round 10 made G.711 µ-law,
    A-law and IMA-ADPCM WAV real (multimodal/audio.py) and FLAC real
    (multimodal/flac.py: rice-coded fixed/LPC prediction), joining
    plain 16-bit PCM."""
    raise NotImplementedError(
        "MP3/AAC/Opus codecs unavailable in this environment; WAV "
        "(PCM/G.711/IMA-ADPCM) and FLAC decode for real "
        "(audio.decode_wav_ex, flac.decode_flac)"
    )


# --------------------------------------------------------------------------
# Real, dependency-free codecs: WAV (stdlib wave), BMP + PPM (struct/numpy)
# --------------------------------------------------------------------------


def make_wav(samples: np.ndarray, rate: int) -> bytes:
    """16-bit mono PCM WAV container around an int16 sample array."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes) -> tuple[int, int, int, float]:
    """(sample_rate, n_frames, n_channels, rms) from a real RIFF/WAVE
    container — stdlib ``wave`` parses the chunk structure, numpy the
    PCM payload.  16-bit PCM only (the container this module emits)."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got sampwidth={w.getsampwidth()}"
            )
        rate = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        raw = w.readframes(n)
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    return rate, n, ch, rms


_BMP_FILE_HEADER = "<2sIHHI"   # magic, file size, reserved x2, pixel offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"  # BITMAPINFOHEADER


def make_bmp(width: int, height: int, gray: int) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, 4-byte row
    padding) filled with one gray value."""
    row = bytes([gray, gray, gray] * width)
    row += b"\x00" * ((4 - len(row) % 4) % 4)
    pixels = row * height
    offset = 14 + 40
    header = struct.pack(
        _BMP_FILE_HEADER, b"BM", offset + len(pixels), 0, 0, offset
    )
    info = struct.pack(
        _BMP_INFO_HEADER, 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return header + info + pixels


def decode_bmp(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) from a real BMP container — header
    fields via ``struct``, the padded pixel array via numpy.  24-bit
    uncompressed only; anything else raises (that's JPEG/PNG territory,
    i.e. ``decode_image``)."""
    magic, _, _, _, offset = struct.unpack_from(_BMP_FILE_HEADER, blob, 0)
    if magic != b"BM":
        raise ValueError("not a BMP container (missing 'BM' magic)")
    _, width, height, _, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    height = abs(height)  # negative height = top-down row order
    rowbytes = (width * 3 + 3) // 4 * 4
    arr = np.frombuffer(
        blob, dtype=np.uint8, count=rowbytes * height, offset=offset
    ).reshape(height, rowbytes)[:, : width * 3]
    mean = float(arr.mean()) if arr.size else 0.0
    return width, height, mean


def make_ppm(width: int, height: int, gray: int) -> bytes:
    """Binary PPM (P6, maxval 255) filled with one gray value."""
    return (
        f"P6\n{width} {height}\n255\n".encode()
        + bytes([gray, gray, gray]) * (width * height)
    )


def bmp_pixels(blob: bytes) -> np.ndarray:
    """(height, width, 3) uint8 pixel array from a 24-bit BMP (rows in
    stored bottom-up order; channel order as stored, BGR — irrelevant to
    the per-pixel transforms here, which are channel-agnostic)."""
    magic, _, _, _, offset = struct.unpack_from(_BMP_FILE_HEADER, blob, 0)
    if magic != b"BM":
        raise ValueError("not a BMP container (missing 'BM' magic)")
    _, width, height, _, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    height = abs(height)
    rowbytes = (width * 3 + 3) // 4 * 4
    arr = np.frombuffer(
        blob, dtype=np.uint8, count=rowbytes * height, offset=offset
    ).reshape(height, rowbytes)[:, : width * 3]
    return arr.reshape(height, width, 3)


def pixels_to_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> 24-bit BMP container (4-byte row pad)."""
    height, width, _ = arr.shape
    rowbytes = (width * 3 + 3) // 4 * 4
    rows = np.zeros((height, rowbytes), dtype=np.uint8)
    rows[:, : width * 3] = arr.reshape(height, width * 3)
    pixels = rows.tobytes()
    offset = 14 + 40
    header = struct.pack(
        _BMP_FILE_HEADER, b"BM", offset + len(pixels), 0, 0, offset
    )
    info = struct.pack(
        _BMP_INFO_HEADER, 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return header + info + pixels


def ppm_pixels(blob: bytes) -> np.ndarray:
    """(height, width, 3) uint8 pixel array from a binary PPM (P6)."""
    width, height, _ = decode_ppm(blob)  # validates magic/maxval
    # re-walk the header to find the payload offset
    pos, fields = 2, []
    while len(fields) < 3:
        while blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            pos = blob.index(b"\n", pos) + 1
            continue
        start = pos
        while not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1
    return np.frombuffer(
        blob, dtype=np.uint8, count=width * height * 3, offset=pos
    ).reshape(height, width, 3)


def pixels_to_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> binary PPM (P6) container."""
    height, width, _ = arr.shape
    return f"P6\n{width} {height}\n255\n".encode() + arr.tobytes()


# --------------------------------------------------------------------------
# PNG — stdlib zlib + numpy (round 8, VERDICT r7 #4).  The format is
# zlib-compressed scanlines, each prefixed by one of five filter bytes
# (RFC 2083): encode with filter 0 (None), decode ALL five so foreign
# 8-bit gray/RGB/RGBA PNGs parse too.  No Adam7 interlace, no 16-bit —
# those raise, same contract as the BMP/PPM decoders' scope errors.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def pixels_to_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> real PNG container: IHDR (8-bit
    truecolor), one zlib IDAT of filter-0 scanlines, IEND — every chunk
    CRC'd, so external PNG tools accept the output."""
    height, width, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    scanlines = np.zeros((height, 1 + width * 3), dtype=np.uint8)
    scanlines[:, 1:] = arr.reshape(height, width * 3)
    idat = zlib.compress(scanlines.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def make_png(width: int, height: int, gray: int) -> bytes:
    """Real PNG (8-bit truecolor) filled with one gray value — same
    synthesis semantics as make_bmp/make_ppm."""
    return pixels_to_png(
        np.full((height, width, 3), gray, dtype=np.uint8)
    )


def _png_unfilter(
    data: np.ndarray, filters: np.ndarray, stride: int, bpp: int
) -> np.ndarray:
    """Reverse the per-scanline filters (None/Sub/Up/Average/Paeth).
    Filters 0/2 are vectorized; 1/3/4 carry an in-row left-neighbor
    dependency so they walk bytes — fine here because this module's own
    encoder emits filter 0 (the vector path), and foreign-PNG decode is
    a correctness surface, not the 100 TB hot path."""
    height = data.shape[0]
    recon = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = int(filters[y])
        raw = data[y].astype(np.int32)
        if f == 0:
            row = raw
        elif f == 2:
            row = (raw + prev) & 0xFF
        elif f in (1, 3, 4):
            row = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                row[x] = (raw[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        recon[y] = row.astype(np.uint8)
        prev = row
    return recon


def png_pixels(blob: bytes) -> np.ndarray:
    """(height, width, 3) uint8 pixel array from a real PNG container:
    walk the chunk stream, inflate the concatenated IDATs, unfilter.
    8-bit gray (broadcast to 3 channels), RGB, or RGBA (alpha dropped);
    16-bit, palette and Adam7-interlaced files raise."""
    if not blob.startswith(_PNG_SIG):
        raise ValueError("not a PNG container (bad signature)")
    pos = len(_PNG_SIG)
    width = height = channels = -1
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"only 8-bit PNG supported, got depth={depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG color type {color} (palette?)"
                )
            if interlace != 0:
                raise ValueError("Adam7-interlaced PNG not supported")
            channels = _PNG_CHANNELS[color]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width < 0:
        raise ValueError("PNG missing IHDR chunk")
    if not idat:
        raise ValueError("PNG missing IDAT chunk")
    stride = width * channels
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # keep the module-wide corrupt-input contract: always ValueError
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError(
            f"PNG payload size mismatch: {raw.size} != {height * (1 + stride)}"
        )
    rows = raw.reshape(height, 1 + stride)
    recon = _png_unfilter(rows[:, 1:], rows[:, 0], stride, channels)
    px = recon.reshape(height, width, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


def decode_png(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) from a real PNG container — the same
    feature triple decode_bmp/decode_ppm return."""
    px = png_pixels(blob)
    mean = float(px.mean()) if px.size else 0.0
    return px.shape[1], px.shape[0], mean


def resize_pixels(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width).  Deterministic,
    numpy-only — the pixel transform a PIL-backed decoder would swap in
    without touching any Spark-side plumbing."""
    src_h, src_w, _ = arr.shape
    iy = (np.arange(height) * src_h) // height
    ix = (np.arange(width) * src_w) // width
    return arr[iy][:, ix]


def decode_ppm(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_pixel) from a binary PPM (P6) container."""
    if not blob.startswith(b"P6"):
        raise ValueError("not a binary PPM container (missing 'P6' magic)")
    # Header: three whitespace-separated ints (w, h, maxval) after the
    # magic, '#' comments allowed, then exactly one whitespace byte
    # before the pixel payload.
    pos, fields = 2, []
    while len(fields) < 3:
        while blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            pos = blob.index(b"\n", pos) + 1
            continue
        start = pos
        while not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    pos += 1  # the single whitespace after maxval
    arr = np.frombuffer(blob, dtype=np.uint8, count=width * height * 3, offset=pos)
    mean = float(arr.mean()) if arr.size else 0.0
    return width, height, mean


def fake_decode(blob: bytes) -> tuple[int, int, float, float]:
    """Deterministic stand-in decoder: derives pseudo-features from raw
    bytes (length, prefix checksum, two normalized moments).  Exactly
    reproducible in SQL for ASCII payloads -> oracle-checkable."""
    n = len(blob)
    prefix = blob[:CHECKSUM_PREFIX]
    checksum = sum(prefix) % 2_147_483_647
    feat0 = (checksum % 256) / 255.0 if n else 0.0
    feat1 = n / (n + 100.0)
    return n, checksum, feat0, feat1


def docs_as_blobs(docs: DataFrame) -> DataFrame:
    """Synthesize a binary media column from the documents table (the
    testdata ships no real media; UTF-8 text bytes stand in as blobs so
    the binary pipeline is exercised end to end)."""
    return docs.select(
        F.col("doc_id").alias("id"),
        F.encode("text", "UTF-8").alias("media"),
        F.lit("text/plain").alias("media_type"),
    )


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """binary column -> feature columns via Arrow-batched mapInPandas.

    The iterator shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame])
    is the scalable contract: one Python worker per partition, one Arrow
    record batch per hop, constant memory regardless of partition row
    count.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_decode(b if b is not None else b"") for b in pdf["media"]]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "checksum", "feat0", "feat1"]
            )
            out.insert(0, "id", pdf["id"].values)
            out["n_bytes"] = out["n_bytes"].astype("int64")
            out["checksum"] = out["checksum"].astype("int64")
            yield out

    return media.select("id", "media").mapInPandas(batches, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Distributed real-container round trip: synth -> decode, both mapInPandas
# --------------------------------------------------------------------------

MEDIA_MIX_SCHEMA = "id long, media binary, media_type string"

MEDIA_FEATURES_SCHEMA = (
    "id long, media_type string, width int, height int, mean_pixel double, "
    "sample_rate int, n_samples long, duration_us long, rms double"
)

WAV_RATE = 8000


def _synth_blob(doc_id: int) -> tuple[bytes, str]:
    """Deterministic real container for a doc id — the parameters are
    simple doc_id arithmetic so a SQL oracle can predict every decoded
    feature without itself decoding bytes:

      doc_id % 3 == 0: WAV  — square wave, amplitude 1 + doc_id % 1000,
                       1000 + (doc_id % 50) * 8 frames at 8 kHz
                       (RMS of a ±A square wave is exactly A)
      doc_id % 3 == 1: BMP  — (4 + doc_id % 13) x (3 + doc_id % 7),
                       constant gray doc_id % 256
      doc_id % 3 == 2: PPM  — same dimensions/gray scheme as BMP
    """
    m = doc_id % 3
    if m == 0:
        amp = 1 + doc_id % 1000
        n = 1000 + (doc_id % 50) * 8
        samples = np.tile(np.array([amp, -amp], dtype=np.int16), n // 2)
        return make_wav(samples, WAV_RATE), "audio/wav"
    width, height, gray = 4 + doc_id % 13, 3 + doc_id % 7, doc_id % 256
    if m == 1:
        return make_bmp(width, height, gray), "image/bmp"
    return make_ppm(width, height, gray), "image/x-portable-pixmap"


def synth_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL WAV/BMP/PPM
    container bytes, built distributed (Arrow-batched mapInPandas)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                blob, mtype = _synth_blob(int(did))
                rows.append((int(did), blob, mtype))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


# (compression, predictor) classes synth_tiff_media cycles through by
# doc_id — every compressed-TIFF scheme the round-9 decoder supports:
# none, LZW, LZW+horizontal predictor, PackBits, Deflate+predictor.
# All lossless, so the doc_id-arithmetic oracle is unchanged.
TIFF_SYNTH_CLASSES = ((1, 1), (5, 1), (5, 2), (32773, 1), (8, 2))


def synth_tiff_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL TIFF container
    bytes (multimodal/tiff.py), built distributed.  Same doc_id-
    arithmetic dimensions/gray as the other image synth paths; the
    compression scheme cycles through TIFF_SYNTH_CLASSES by doc_id
    (round 9: LZW / PackBits / Deflate / predictor variants, all
    lossless), so the driver-checked ``multimodal_tiff`` round trip
    exercises every compressed-strip decode path."""
    from mapreduce_minhash_lsh_spark.multimodal.tiff import make_tiff

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                comp, pred = TIFF_SYNTH_CLASSES[did % len(TIFF_SYNTH_CLASSES)]
                blob = make_tiff(
                    4 + did % 13, 3 + did % 7, did % 256,
                    compression=comp, predictor=pred,
                )
                rows.append((did, blob, "image/tiff"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_gif_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL GIF87a container
    bytes (multimodal/gif.py), built distributed.  Same doc_id-arithmetic
    dimensions/gray as the other image synth paths; GIF is lossless on
    indexed content, so the round trip is exact."""
    from mapreduce_minhash_lsh_spark.multimodal.gif import make_gif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                blob = make_gif(4 + did % 13, 3 + did % 7, did % 256)
                rows.append((did, blob, "image/gif"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_jpeg_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL baseline-JFIF
    container bytes (multimodal/jpeg.py), built distributed.  Same
    doc_id-arithmetic dimensions/gray as the other image synth paths;
    the all-ones quant default makes the constant image EXACT through
    the lossy pipeline, so the SQL oracle stays value-exact."""
    from mapreduce_minhash_lsh_spark.multimodal.jpeg import make_jpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                blob = make_jpeg(4 + did % 13, 3 + did % 7, did % 256)
                rows.append((did, blob, "image/jpeg"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_png_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL PNG container
    bytes, built distributed (Arrow-batched mapInPandas).  Dimensions and
    gray value follow the same doc_id arithmetic as the BMP/PPM class in
    :func:`_synth_blob` (width 4 + id%13, height 3 + id%7, gray id%256),
    so a SQL oracle predicts every decoded feature without touching
    bytes — kept as its own synth path so the round-7
    ``multimodal_features``/``multimodal_resize`` oracles stay
    byte-stable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                blob = make_png(4 + did % 13, 3 + did % 7, did % 256)
                rows.append((did, blob, "image/png"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_mp4_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL single-track
    ISO-BMFF containers (multimodal/mp4.py), built distributed.
    4 + doc_id%9 frames of doc_id-arithmetic sizes at timescale 600 /
    25 ticks per frame, so the ``multimodal_video_meta`` oracle
    predicts sample count and duration exactly.  Handler alternates
    video/audio by doc_id parity (both probe paths exercised)."""
    from mapreduce_minhash_lsh_spark.multimodal.mp4 import make_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 4 + did % 9
                frames = [
                    bytes([(did + i) % 256]) * (10 + (did + i) % 20)
                    for i in range(n)
                ]
                handler, codec = (
                    (b"vide", b"mp4v") if did % 2 == 0 else (b"soun", b"mp4a")
                )
                blob = make_mp4(frames, handler=handler, codec=codec)
                rows.append((did, blob, "video/mp4"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_flac_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL FLAC streams
    (multimodal/flac.py), built distributed.  Square wave, amplitude
    1 + doc_id % 1000 (RMS exactly the amplitude — FLAC is lossless),
    1000 + (doc_id % 50) * 8 samples at 8 kHz, the synth_media WAV
    class' doc_id arithmetic, so the ``multimodal_flac`` oracle
    predicts every decoded value."""
    from mapreduce_minhash_lsh_spark.multimodal.flac import encode_flac

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                amp = 1 + did % 1000
                n = 1000 + (did % 50) * 8
                samples = np.tile(np.array([amp, -amp], dtype=np.int16), n // 2)
                # small blocks -> multi-frame files (framing exercised)
                rows.append((did, encode_flac(samples, WAV_RATE, block_size=512),
                             "audio/flac"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_audio_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL WAV containers
    cycling every supported audio format by doc_id: 16-bit PCM square,
    G.711 mu-law square, G.711 A-law square, IMA-ADPCM constant.  Each
    class is built so its RMS is EXACTLY predictable from doc_id
    arithmetic (multimodal/audio.py docstring: G.711 decode points
    round-trip exactly; a constant is an ADPCM fixed point), so the
    ``multimodal_audio`` oracle checks all four decode paths by value."""
    from mapreduce_minhash_lsh_spark.multimodal.audio import (
        ALAW_DECODE,
        MULAW_DECODE,
        make_wav_adpcm,
        make_wav_g711,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 1000 + (did % 50) * 8
                cls = did % 4
                if cls == 0:
                    amp = 1 + did % 1000
                    samples = np.tile(np.array([amp, -amp], dtype=np.int16), n // 2)
                    blob = make_wav(samples, WAV_RATE)
                elif cls in (1, 2):
                    law = "mulaw" if cls == 1 else "alaw"
                    table = MULAW_DECODE if cls == 1 else ALAW_DECODE
                    code = 16 + did % 100
                    v, v_neg = table[code], table[code ^ 0x80]
                    samples = np.tile(np.array([v, v_neg], dtype=np.int16), n // 2)
                    blob = make_wav_g711(samples, WAV_RATE, law)
                else:
                    amp = 1 + did % 2000
                    blob = make_wav_adpcm(
                        np.full(n, amp, dtype=np.int16), WAV_RATE
                    )
                rows.append((did, blob, "audio/wav"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_aiff_au_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL AIFF and Sun AU
    containers cycling by doc_id: AIFF 16-bit big-endian PCM square,
    AU G.711 mu-law square (decode-point construction, round-trips
    exactly), AU 16-bit PCM square — so the ``multimodal_aiff_au``
    oracle predicts every RMS bit-exactly from doc_id arithmetic,
    through a real 80-bit-extended-float rate parse on the AIFF side."""
    from mapreduce_minhash_lsh_spark.multimodal.audio import (
        MULAW_DECODE,
        make_aiff,
        make_au,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 1000 + (did % 50) * 8
                cls = did % 3
                if cls == 0:
                    amp = 1 + did % 1000
                    samples = np.tile(np.array([amp, -amp], dtype=np.int16), n // 2)
                    rows.append((did, make_aiff(samples, WAV_RATE), "audio/aiff"))
                elif cls == 1:
                    code = 16 + did % 100
                    v, v_neg = MULAW_DECODE[code], MULAW_DECODE[code ^ 0x80]
                    samples = np.tile(np.array([v, v_neg], dtype=np.int16), n // 2)
                    rows.append(
                        (did, make_au(samples, WAV_RATE, "mulaw"), "audio/basic")
                    )
                else:
                    amp = 1 + did % 2000
                    samples = np.tile(np.array([amp, -amp], dtype=np.int16), n // 2)
                    rows.append(
                        (did, make_au(samples, WAV_RATE, "pcm16"), "audio/basic")
                    )
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def synth_webp_media(docs: DataFrame) -> DataFrame:
    """documents -> (id, media, media_type) with REAL lossless-WebP
    container bytes (multimodal/webp.py), built distributed.  Same
    doc_id-arithmetic dimensions/gray as the other image synth paths;
    the encode mode cycles through webp.WEBP_SYNTH_CLASSES by doc_id
    (palette / plain literal / subtract-green / predictor / color
    cache), all lossless, so the driver-checked ``multimodal_webp``
    round trip exercises every VP8L transform-decode path the encoder
    can produce."""
    from mapreduce_minhash_lsh_spark.multimodal.webp import (
        WEBP_SYNTH_CLASSES,
        make_webp,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                modes = WEBP_SYNTH_CLASSES[did % len(WEBP_SYNTH_CLASSES)]
                blob = make_webp(4 + did % 13, 3 + did % 7, did % 256, **modes)
                rows.append((did, blob, "image/webp"))
            yield pd.DataFrame(rows, columns=["id", "media", "media_type"])

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_MIX_SCHEMA)


def decode_media(blob: bytes, media_type: str) -> tuple:
    """One decoded feature row (width, height, mean_pixel, sample_rate,
    n_samples, duration_us, rms) — inapplicable fields are None.
    Dispatch on the metadata media_type, exactly how a production
    decoder picks a codec; compressed types raise NotImplementedError
    (see decode_image/decode_audio)."""
    if media_type == "audio/wav":
        # the extended parser (multimodal/audio.py) covers PCM + G.711
        # mu-law/A-law + IMA-ADPCM; identical features on plain PCM
        from mapreduce_minhash_lsh_spark.multimodal.audio import decode_wav_ex

        rate, n, _, rms = decode_wav_ex(blob)
        return (None, None, None, rate, n, n * 1_000_000 // rate, rms)
    if media_type == "audio/aiff":
        from mapreduce_minhash_lsh_spark.multimodal.audio import decode_aiff_ex

        rate, n, _, rms = decode_aiff_ex(blob)
        return (None, None, None, rate, n, n * 1_000_000 // rate, rms)
    if media_type == "audio/basic":  # Sun AU / .snd
        from mapreduce_minhash_lsh_spark.multimodal.audio import decode_au_ex

        rate, n, _, rms = decode_au_ex(blob)
        return (None, None, None, rate, n, n * 1_000_000 // rate, rms)
    if media_type == "audio/flac":
        from mapreduce_minhash_lsh_spark.multimodal.flac import decode_flac

        rate, n, _, rms = decode_flac(blob)
        return (None, None, None, rate, n, n * 1_000_000 // rate, rms)
    if media_type == "image/bmp":
        w, h, mean = decode_bmp(blob)
        return (w, h, mean, None, None, None, None)
    if media_type == "image/x-portable-pixmap":
        w, h, mean = decode_ppm(blob)
        return (w, h, mean, None, None, None, None)
    if media_type == "image/png":
        w, h, mean = decode_png(blob)
        return (w, h, mean, None, None, None, None)
    if media_type == "image/jpeg":
        from mapreduce_minhash_lsh_spark.multimodal.jpeg import decode_jpeg

        w, h, mean = decode_jpeg(blob)
        return (w, h, mean, None, None, None, None)
    if media_type == "image/gif":
        from mapreduce_minhash_lsh_spark.multimodal.gif import decode_gif

        w, h, mean = decode_gif(blob)
        return (w, h, mean, None, None, None, None)
    if media_type == "image/tiff":
        from mapreduce_minhash_lsh_spark.multimodal.tiff import decode_tiff

        w, h, mean = decode_tiff(blob)
        return (w, h, mean, None, None, None, None)
    if media_type == "image/webp":
        from mapreduce_minhash_lsh_spark.multimodal.webp import decode_webp

        w, h, mean = decode_webp(blob)
        return (w, h, mean, None, None, None, None)
    if media_type.startswith("image/"):
        return decode_image(blob)
    if media_type == "video/mp4":
        # the CONTAINER layer is real (round 10, multimodal/mp4.py):
        # brand/track/sample-table parse gives count + duration without
        # touching any codec; decoding frame bytes stays environmental
        from mapreduce_minhash_lsh_spark.multimodal.mp4 import probe_mp4

        info = probe_mp4(blob)
        n = info["tracks"][0]["n_samples"] if info["tracks"] else 0
        return (None, None, None, None, n, info["duration_us"], None)
    if media_type.startswith(("audio/", "video/")):
        return decode_audio(blob)
    raise ValueError(f"unknown media_type {media_type!r}")


def extract_media_features(media: DataFrame) -> DataFrame:
    """(id, media, media_type) -> decoded features via the REAL codecs,
    Arrow-batched mapInPandas (same iterator contract as
    extract_features)."""

    cols = [
        "width", "height", "mean_pixel", "sample_rate", "n_samples",
        "duration_us", "rms",
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(bytes(b), t)
                for b, t in zip(pdf["media"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "id", pdf["id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return media.select("id", "media", "media_type").mapInPandas(
        batches, schema=MEDIA_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize over binary columns: decode (BMP/PPM), NN
    resample, re-encode into the SAME container format — Arrow-batched
    mapInPandas, schema-preserving (id, media, media_type), so it
    composes anywhere a media relation flows (e.g. synth_media ->
    resize_images -> extract_media_features).  Non-image rows pass
    through untouched; compressed image types raise (decode_image —
    that is PIL territory)."""

    def one(blob: bytes, mtype: str) -> bytes:
        if mtype == "image/bmp":
            return pixels_to_bmp(resize_pixels(bmp_pixels(blob), width, height))
        if mtype == "image/x-portable-pixmap":
            return pixels_to_ppm(resize_pixels(ppm_pixels(blob), width, height))
        if mtype == "image/png":
            return pixels_to_png(resize_pixels(png_pixels(blob), width, height))
        if mtype == "image/jpeg":
            from mapreduce_minhash_lsh_spark.multimodal.jpeg import (
                encode_baseline,
                jpeg_pixels,
            )

            return encode_baseline(
                resize_pixels(jpeg_pixels(blob), width, height)
            )
        if mtype == "image/gif":
            from mapreduce_minhash_lsh_spark.multimodal.gif import (
                encode_gif87a,
                gif_pixels,
            )

            # NN resample draws only source pixels, so the resized
            # image's palette is a subset of the original's (<= 256)
            return encode_gif87a(
                resize_pixels(gif_pixels(blob), width, height)
            )
        if mtype == "image/tiff":
            from mapreduce_minhash_lsh_spark.multimodal.tiff import (
                encode_tiff,
                tiff_pixels,
            )

            return encode_tiff(
                resize_pixels(tiff_pixels(blob), width, height)
            )
        if mtype == "image/webp":
            from mapreduce_minhash_lsh_spark.multimodal.webp import (
                encode_vp8l,
                webp_pixels,
            )

            return encode_vp8l(
                resize_pixels(webp_pixels(blob), width, height)
            )
        if mtype.startswith("image/"):
            return decode_image(blob)  # pragma: no cover - raises
        return blob

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["media"] = [
                one(bytes(b), t) for b, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pdf

    return media.select("id", "media", "media_type").mapInPandas(
        batches, schema=MEDIA_MIX_SCHEMA
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Lossy-WebP/HEIC resize still needs PIL/opencv — kept as the
    explicit stub; lossless WebP (round 10), JPEG, PNG, GIF, TIFF
    (round 9: including LZW/PackBits/Deflate strips) and the
    uncompressed containers have the REAL :func:`resize_images` above."""
    raise NotImplementedError(
        "lossy-WebP(VP8)/HEIC resize requires codecs unavailable in "
        "this environment; lossless-WebP/JPEG/PNG/GIF/TIFF/BMP/PPM "
        "resize is real (resize_images)"
    )


FRAME_SCHEMA = "id long, frame_idx int, frame binary, n_frames int"
FRAME_SIZE = 32  # bytes per pseudo-frame in the deterministic stand-in


def frame_sample(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Video frame-sampling: emit every k-th frame of each blob as its
    own row (binary), via the same Arrow-batched mapInPandas contract
    as extract_features.

    For ISO-BMFF (MP4) blobs the frames are the REAL samples sliced out
    of mdat via the stsz/stsc/stco tables (round 10,
    multimodal/mp4.py) — codec-encoded bytes at true frame boundaries.
    Other blobs fall back to fixed-size byte chunks (FRAME_SIZE), the
    original plumbing stand-in; either way the row-explosion shape,
    schema and batching are exactly what an ffmpeg-backed frame DECODER
    would drop into.
    """
    from mapreduce_minhash_lsh_spark.multimodal.mp4 import mp4_frames

    def chunk_frames(blob: bytes) -> list[bytes]:
        if blob[4:8] == b"ftyp":
            return mp4_frames(blob)
        return [
            blob[i : i + FRAME_SIZE] for i in range(0, len(blob), FRAME_SIZE)
        ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for rid, blob in zip(pdf["id"], pdf["media"]):
                frames = chunk_frames(bytes(blob) if blob is not None else b"")
                n = len(frames)
                for idx in range(0, n, every_k):
                    out_rows.append((rid, idx, frames[idx], n))
            yield pd.DataFrame(
                out_rows, columns=["id", "frame_idx", "frame", "n_frames"]
            )

    return media.select("id", "media").mapInPandas(batches, schema=FRAME_SCHEMA)
