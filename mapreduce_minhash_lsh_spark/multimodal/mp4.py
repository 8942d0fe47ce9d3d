"""MP4 / ISO-BMFF container parsing — stdlib only (round 10).

A training-data pipeline rarely needs to DECODE video to curate it: it
filters on container metadata (duration, track layout, codec fourcc)
and samples frames at container granularity.  The ISO base-media box
structure is plain struct parsing — fully expressible without ffmpeg —
so this module makes the container layer real and leaves only the
codec layer (H.264/HEVC entropy decode) environmental:

* ``probe_mp4``: box walk -> brand, movie timescale/duration, per-track
  handler + codec fourcc + sample count (mvhd/tkhd/mdhd/hdlr/stsd/stsz).
* ``mp4_frames``: the real frame boundaries — stsz sample sizes joined
  with stco/co64 chunk offsets through the stsc run map — so frame
  sampling slices ACTUAL samples out of mdat instead of fixed-width
  byte chunks.  The frame BYTES stay codec-encoded; decoding them is
  the documented stub (binary.decode_audio / decode_image scope).
* ``make_mp4``: a minimal valid single-track file (ftyp + mdat + moov
  with a complete stbl) for fixtures and round trips.
"""

from __future__ import annotations

import struct


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B3x", version) + payload)


def iter_boxes(blob: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for each box in range."""
    pos = start
    end = len(blob) if end is None else end
    while pos + 8 <= end:
        size = struct.unpack(">I", blob[pos : pos + 4])[0]
        typ = blob[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            size = struct.unpack(">Q", blob[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("MP4: truncated or corrupt box structure")
        yield typ, body, pos + size
        pos += size


def _find(blob: bytes, path: list[bytes], start: int, end: int):
    """All payload ranges matching a nested box path."""
    if not path:
        yield start, end
        return
    for typ, body, stop in iter_boxes(blob, start, end):
        if typ == path[0]:
            yield from _find(blob, path[1:], body, stop)


def probe_mp4(blob: bytes) -> dict:
    """Container metadata without touching any codec: major brand,
    movie timescale/duration (+ microseconds), and per-track handler,
    codec fourcc and sample count."""
    if len(blob) < 12:
        raise ValueError("MP4: not an ISO-BMFF file")
    boxes = {typ: (body, stop) for typ, body, stop in iter_boxes(blob)}
    if b"ftyp" not in boxes or b"moov" not in boxes:
        raise ValueError("MP4: missing ftyp or moov box")
    fb, _ = boxes[b"ftyp"]
    brand = blob[fb : fb + 4].decode("latin-1")
    mb, me = boxes[b"moov"]
    timescale = duration = 0
    for body, stop in _find(blob, [b"mvhd"], mb, me):
        version = blob[body]
        if version == 1:
            timescale, duration = struct.unpack(">IQ", blob[body + 20 : body + 32])
        else:
            timescale, duration = struct.unpack(">II", blob[body + 12 : body + 20])
    tracks = []
    for tb, te in _find(blob, [b"trak"], mb, me):
        handler = codec = "?"
        n_samples = 0
        for hb, _hs in _find(blob, [b"mdia", b"hdlr"], tb, te):
            handler = blob[hb + 8 : hb + 12].decode("latin-1")
        for sb, _ss in _find(blob, [b"mdia", b"minf", b"stbl", b"stsd"], tb, te):
            count = struct.unpack(">I", blob[sb + 4 : sb + 8])[0]
            if count:
                codec = blob[sb + 12 : sb + 16].decode("latin-1")
        for zb, _zs in _find(blob, [b"mdia", b"minf", b"stbl", b"stsz"], tb, te):
            n_samples = struct.unpack(">I", blob[zb + 8 : zb + 12])[0]
        tracks.append({"handler": handler, "codec": codec, "n_samples": n_samples})
    if not timescale:
        raise ValueError("MP4: moov has no mvhd")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_us": duration * 1_000_000 // timescale,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def mp4_frames(blob: bytes) -> list[bytes]:
    """The real samples of the first track, sliced out of mdat via the
    stsz/stsc/stco(co64) tables.  Bytes remain codec-encoded."""
    boxes = {typ: (body, stop) for typ, body, stop in iter_boxes(blob)}
    mb, me = boxes[b"moov"]
    for tb, te in _find(blob, [b"trak"], mb, me):
        stbl = list(_find(blob, [b"mdia", b"minf", b"stbl"], tb, te))
        if not stbl:
            continue
        sb, se = stbl[0]
        sizes: list[int] = []
        offsets: list[int] = []
        stsc: list[tuple[int, int]] = []
        for typ, body, stop in iter_boxes(blob, sb, se):
            if typ == b"stsz":
                fixed, count = struct.unpack(">II", blob[body + 4 : body + 12])
                sizes = (
                    [fixed] * count
                    if fixed
                    else list(
                        struct.unpack(
                            f">{count}I", blob[body + 12 : body + 12 + 4 * count]
                        )
                    )
                )
            elif typ in (b"stco", b"co64"):
                count = struct.unpack(">I", blob[body + 4 : body + 8])[0]
                w, f = (8, "Q") if typ == b"co64" else (4, "I")
                offsets = list(
                    struct.unpack(
                        f">{count}{f}", blob[body + 8 : body + 8 + w * count]
                    )
                )
            elif typ == b"stsc":
                count = struct.unpack(">I", blob[body + 4 : body + 8])[0]
                for i in range(count):
                    first, per, _desc = struct.unpack(
                        ">III", blob[body + 8 + 12 * i : body + 20 + 12 * i]
                    )
                    stsc.append((first, per))
        if not sizes or not offsets:
            continue
        # expand the stsc run map to samples-per-chunk for each chunk
        per_chunk = []
        for i, (first, per) in enumerate(stsc):
            last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(offsets)
            per_chunk.extend([per] * (last - first + 1))
        frames = []
        s = 0
        for chunk_off, per in zip(offsets, per_chunk):
            pos = chunk_off
            for _ in range(per):
                if s >= len(sizes):
                    break
                frames.append(blob[pos : pos + sizes[s]])
                pos += sizes[s]
                s += 1
        return frames
    raise ValueError("MP4: no track with a usable sample table")


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def make_mp4(
    frames: list[bytes],
    timescale: int = 600,
    sample_duration: int = 25,
    handler: bytes = b"vide",
    codec: bytes = b"mp4v",
    width: int = 64,
    height: int = 48,
) -> bytes:
    """Minimal valid single-track ISO-BMFF file: ftyp + mdat + moov with
    a complete sample table (one chunk, explicit sizes)."""
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat = _box(b"mdat", b"".join(frames))
    data_offset = len(ftyp) + 8
    duration = n * sample_duration
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
        + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I8x", duration)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"graft\x00")
    if handler == b"vide":
        mhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
        entry = _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 24, -1),
        )
    else:
        mhd = _full(b"smhd", 0, struct.pack(">HH", 0, 0))
        entry = _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HH4x", 2, 16)
            + struct.pack(">I", 8000 << 16),
        )
    # url box with the self-contained flag (full box, flags = 1)
    url = struct.pack(">I", 12) + b"url " + struct.pack(">B3s", 0, b"\x00\x00\x01")
    dref = _full(b"dref", 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, sample_duration))
    stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, struct.pack(">II", 1, data_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", mhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
