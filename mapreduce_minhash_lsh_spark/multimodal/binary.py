"""Binary-column (image/audio/video) processing plumbing.

Design for 100 TB multimodal data: media travel as opaque ``binary``
columns with a typed metadata struct alongside; decode / feature-extract
/ resize / frame-sample run as Arrow-batched pandas iterators inside
``mapInPandas`` (one Python worker per partition, whole record-batches
per hop — never per-row UDF calls).  Partition sizing note: binary blobs
make rows wide, so the scan should target ~64-128 MB input splits
(spark.sql.files.maxPartitionBytes) to keep Arrow batches bounded.

The actual media codecs (PIL/ffmpeg/soundfile) are NOT available in this
container, so ``decode_image``/``decode_audio`` raise NotImplementedError
by default and the tests exercise the real Spark plumbing (schema,
batching, partitioning) through ``fake_decode`` — a deterministic
stand-in that derives "features" from the raw bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

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
    """Real image decode — requires PIL/opencv, not present in this
    container.  STUB: the Spark-side plumbing around it is real and
    tested through fake_decode."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode"
    )


def decode_audio(blob: bytes):  # pragma: no cover - requires codec libs
    raise NotImplementedError(
        "audio codecs unavailable in this environment; use fake_decode"
    )


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


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: the transform signature and batching are
    real; the pixel work needs a codec -> NotImplementedError at execute
    time, surfaced eagerly here for a clear error."""
    raise NotImplementedError(
        "resize requires image codecs unavailable in this environment; "
        "the mapInPandas pattern is identical to extract_features"
    )


FRAME_SCHEMA = "id long, frame_idx int, frame binary, n_frames int"
FRAME_SIZE = 32  # bytes per pseudo-frame in the deterministic stand-in


def frame_sample(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: emit every k-th frame of each blob
    as its own row (binary), via the same Arrow-batched mapInPandas
    contract as extract_features.

    Without a real container/codec the "frames" are fixed-size byte
    chunks (FRAME_SIZE) — the row-explosion shape, schema, and batching
    are exactly what an ffmpeg-backed decoder drops into; swap
    ``chunk_frames`` for the codec call and nothing else changes.
    """

    def chunk_frames(blob: bytes) -> list[bytes]:
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
