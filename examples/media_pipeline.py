#!/usr/bin/env python3
"""Multimodal MEDIA flow: binary columns through the real codec chain.

The multimodal half of the training-data story: media arrive as opaque
``binary`` columns with typed metadata, and every transform is an
Arrow-batched ``mapInPandas`` over real container bytes — the
dependency-free codecs this repo ships (WAV incl. G.711/ADPCM; FLAC;
BMP and binary PPM via struct+numpy; PNG via zlib + scanline
unfiltering; baseline JPEG via huffman + 8x8 DCT in numpy; GIF via
LZW; TIFF incl. LZW/PackBits/Deflate strips; lossless WebP — full
VP8L; MP4 container probe; AIFF + Sun AU):

  1. synthesize a mixed-format media relation (WAV/BMP/PPM) plus PNG,
     JPEG, GIF, TIFF, WebP, compressed-audio, FLAC and MP4 relations,
     one real container per document,
  2. normalize every image to a fixed thumbnail size — decode →
     NN-resample → re-encode INTO ITS OWN FORMAT (audio passes through),
  3. extract typed features from the resized bytes (width/height/mean
     for images; rate/frames/duration/RMS for audio),
  4. join features back to the documents table and profile by media
     type — the (media metadata × text metadata) join every multimodal
     training set needs.

    python3 examples/media_pipeline.py [SF_DIR]

The decode/resample steps are per-row Python INSIDE Arrow batches — one
interpreter hop per record batch, the contract SCALE.md §4 sizes; a
PIL/ffmpeg-backed decoder drops into the same mapInPandas signature
without touching any Spark-side plumbing.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.multimodal.binary import (
    extract_media_features,
    resize_images,
    synth_aiff_au_media,
    synth_audio_media,
    synth_flac_media,
    synth_gif_media,
    synth_jpeg_media,
    synth_media,
    synth_mp4_media,
    synth_png_media,
    synth_tiff_media,
    synth_webp_media,
)
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def run(spark, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")

    # 1. One real container per document, four synth relations: the
    #    WAV/BMP/PPM mix plus one each of the compressed formats.
    media = (
        synth_media(docs)
        .unionByName(
            synth_png_media(docs).withColumn("id", F.col("id") + 10_000_000)
        )
        .unionByName(
            synth_jpeg_media(docs).withColumn("id", F.col("id") + 20_000_000)
        )
        .unionByName(
            synth_gif_media(docs).withColumn("id", F.col("id") + 30_000_000)
        )
        .unionByName(
            synth_tiff_media(docs).withColumn("id", F.col("id") + 40_000_000)
        )
        .unionByName(
            synth_webp_media(docs).withColumn("id", F.col("id") + 50_000_000)
        )
        .unionByName(
            synth_audio_media(docs).withColumn("id", F.col("id") + 60_000_000)
        )
        .unionByName(
            synth_flac_media(docs).withColumn("id", F.col("id") + 70_000_000)
        )
        .unionByName(
            synth_mp4_media(docs).withColumn("id", F.col("id") + 80_000_000)
        )
        .unionByName(
            synth_aiff_au_media(docs).withColumn("id", F.col("id") + 90_000_000)
        )
    )

    # 2. Thumbnail normalization: every image becomes 8x6 in its own
    #    container format; audio rows pass through byte-identical.
    thumbs = resize_images(media, 8, 6)

    # 3. Typed features from the RESIZED bytes.
    feats = extract_media_features(thumbs)

    # 4. Profile by media type; join image features back to their docs.
    profile = (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("mean_pixel"), 2).alias("avg_pixel"),
            F.round(F.avg("rms"), 2).alias("avg_rms"),
            F.round(F.avg("duration_us"), 0).alias("avg_duration_us"),
        )
        .orderBy("media_type")
    )
    joined = (
        feats.where(F.col("width").isNotNull())
        .withColumn("doc_id", F.col("id") % 10_000_000)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "media_type")
        .agg(F.count("*").alias("n_images"))
    )
    return profile, joined


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="media-pipeline", shuffle_partitions=8)
    profile, joined = run(spark, sf_dir)
    profile.show(truncate=False)
    joined.orderBy("lang", "media_type").show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
