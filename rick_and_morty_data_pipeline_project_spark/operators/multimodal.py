"""Multimodal (image/audio/video) column plumbing.

Media is modeled as opaque ``binary`` content plus a typed metadata
struct — the layout a 100 TB multimodal corpus uses (content in parquet
binary columns or object-store URIs, metadata queryable without touching
bytes).  Real codecs (PIL/ffmpeg) are not available in this container,
so the *decode* step is stubbed: ``decode_media`` raises
``NotImplementedError`` unless the deterministic fake decoder is
requested.  Everything Spark-side — schema, Arrow batching, partition
behavior, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png | wav | mp4 | ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("content", BinaryType()),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, mean_byte double, checksum string"
)


def synthesize_media(
    df: DataFrame, id_col: str, text_col: str, mixed_kinds: bool = False
) -> DataFrame:
    """Derive a deterministic fake media table from a text corpus: the
    binary content is the md5-chained expansion of the text (stands in
    for real bytes; stable across engines and runs).

    ``mixed_kinds=True`` assigns image/audio/video round-robin by id
    (audio/video rows get a deterministic ``duration_ms``) so temporal
    operators (frame sampling) have rows to work on; the default stays
    all-image for backward-compatible oracles."""
    h = F.md5(F.col(text_col))
    content = F.to_binary(F.concat(h, F.md5(h), F.md5(F.md5(h))), F.lit("hex"))
    if mixed_kinds:
        kind = (
            F.when(F.col(id_col) % 3 == 0, F.lit("image"))
            .when(F.col(id_col) % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
        )
        duration = F.when(
            F.col(id_col) % 3 != 0,
            (F.length(F.col(text_col)) * 37 % 9000 + 1000).cast("int"),
        ).otherwise(F.lit(None).cast("int"))
    else:
        kind = F.lit("image")
        duration = F.lit(None).cast("int")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.lit("fake").alias("format"),
        (F.length(F.col(text_col)) % 64 + 16).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 48 + 16).cast("int").alias("height"),
        duration.alias("duration_ms"),
        content.alias("content"),
    )


def resize_dims(
    df: DataFrame, max_w: int = 64, max_h: int = 48
) -> DataFrame:
    """Aspect-preserving resize planning: fit each media row into a
    (max_w × max_h) box, never upscaling.  The target-dimension math is
    pure JVM metadata arithmetic (real, SQL-oracle-checked, and the
    piece a 100 TB pipeline runs over the whole catalog to budget the
    decode pass); the pixel resample itself is codec work and stubbed
    exactly like :func:`decode_media` (``fake=False`` path there)."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width").cast("double"),
        F.lit(float(max_h)) / F.col("height").cast("double"),
        F.lit(1.0),
    )
    return df.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("int")
        .alias("new_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("int")
        .alias("new_height"),
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (0..duration_ms step ``every_ms``, inclusive).  The
    explode is the real Spark-side plumbing — narrow, fan-out ∝
    frames-per-video, no shuffle; at 100 TB this is the map stage that
    feeds the (stubbed) codec extraction, here stood in by a
    deterministic per-frame fingerprint over the fake content bytes."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        "duration_ms",
        "content",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames.select(
        "media_id",
        "frame_ms",
        F.md5(
            F.concat(
                F.lower(F.hex("content")),
                F.lit("#"),
                F.col("frame_ms").cast("string"),
            )
        ).alias("frame_fingerprint"),
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media content via Arrow-batched mapInPandas.

    ``fake=True`` runs the deterministic stand-in decoder (byte stats +
    md5 checksum). ``fake=False`` requires real codec libraries, which
    are not installed here → NotImplementedError (clearly-marked stub).
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/ffmpeg, not available "
            "in this environment; use fake=True for the deterministic stub"
        )

    def batches(it: Iterator):
        import hashlib

        import pandas as pd

        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len).astype("int64"),
                    "mean_byte": content.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "checksum": content.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)
