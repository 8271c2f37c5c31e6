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


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic fake media table from a text corpus: the
    binary content is the md5-chained expansion of the text (stands in
    for real bytes; stable across engines and runs)."""
    h = F.md5(F.col(text_col))
    content = F.to_binary(F.concat(h, F.md5(h), F.md5(F.md5(h))), F.lit("hex"))
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("fake").alias("format"),
        (F.length(F.col(text_col)) % 64 + 16).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 48 + 16).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        content.alias("content"),
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
