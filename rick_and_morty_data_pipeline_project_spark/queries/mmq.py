"""Multimodal-column query family (SURVEY.md §2.10).

Media is an opaque binary column + typed metadata struct synthesized
deterministically from the documents corpus (operators/multimodal.py).
Metadata queries never touch the bytes (the 100 TB access pattern);
the decode path exercises real Arrow-batched mapInPandas plumbing with
a deterministic fake decoder (real codecs are stubbed — see
operators/multimodal.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.multimodal import (
    decode_media,
    decode_real_media,
    resize_dims,
    sample_frames,
    synthesize_media,
    synthesize_real_media,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import Q, t


def multimodal_metadata_stats(spark, sf_dir):
    """Metadata-only aggregation over a media table: group by (kind,
    format), count + dimension averages + total payload bytes.  The
    byte count comes from ``length(content)`` — column-pruned parquet
    would read only the binary column's sizes, never decode."""
    d = t(spark, sf_dir, "documents")
    m = synthesize_media(d, "doc_id", "text")
    return m.groupBy("kind", "format").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.avg(F.col("width").cast("double")).alias("avg_width"),
        F.avg(F.col("height").cast("double")).alias("avg_height"),
        F.sum(F.length("content")).alias("total_bytes"),
    )


MM_META_SQL = """
SELECT 'image' AS kind, 'fake' AS format,
       COUNT(*) AS n_media,
       AVG(CAST(length(text) % 64 + 16 AS DOUBLE)) AS avg_width,
       AVG(CAST(length(text) % 48 + 16 AS DOUBLE)) AS avg_height,
       CAST(SUM(octet_length(unhex(md5(text) || md5(md5(text)) || md5(md5(md5(text)))))) AS BIGINT) AS total_bytes
FROM documents
GROUP BY 1, 2
"""


def multimodal_decode_features(spark, sf_dir):
    """Arrow-batched mapInPandas decode → per-media byte stats +
    checksum.  Fully oracled: the fake content is the md5-chain hex
    expansion of the text, so the DuckDB twin recomputes mean_byte by
    hex-pair arithmetic (exact integer sum / count — bitwise float
    parity) and the checksum over the same lowercase hex; the Python
    decode in the Spark arm runs on the actual binary column, so the
    match certifies the mapInPandas byte plumbing end to end."""
    d = t(spark, sf_dir, "documents")
    m = synthesize_media(d, "doc_id", "text")
    return decode_media(m, fake=True)


MM_DECODE_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, 'image' AS kind,
         md5(text) || md5(md5(text)) || md5(md5(md5(text))) AS hx
  FROM documents
)
SELECT media_id, kind,
       CAST(octet_length(from_hex(hx)) AS BIGINT) AS n_bytes,
       list_aggregate(
         list_transform(
           generate_series(0, CAST(octet_length(from_hex(hx)) AS INT) - 1),
           i -> CAST('0x' || substr(hx, 2 * i + 1, 2) AS INT)
         ), 'avg') AS mean_byte,
       md5(hx) AS checksum
FROM m
"""


def multimodal_resize_dims(spark, sf_dir):
    """Resize planning over the media catalog: aspect-preserving fit
    into a 64×48 box, metadata-only (no byte access — see
    operators/multimodal.resize_dims)."""
    d = t(spark, sf_dir, "documents")
    m = synthesize_media(d, "doc_id", "text")
    return resize_dims(m, 64, 48)


MM_RESIZE_SQL = """
WITH meta AS (
  SELECT doc_id AS media_id, 'image' AS kind,
         CAST(length(text) % 64 + 16 AS INT) AS width,
         CAST(length(text) % 48 + 16 AS INT) AS height
  FROM documents
),
scaled AS (
  SELECT *, least(64.0 / width, 48.0 / height, 1.0) AS scale FROM meta
)
SELECT media_id, kind, width, height,
       CAST(greatest(floor(width * scale), 1) AS INT) AS new_width,
       CAST(greatest(floor(height * scale), 1) AS INT) AS new_height
FROM scaled
"""


def multimodal_frame_samples(spark, sf_dir):
    """Frame sampling over the mixed-kind media table: one row per
    (video, sampled timestamp) with a deterministic frame fingerprint
    standing in for the stubbed codec extraction."""
    d = t(spark, sf_dir, "documents")
    m = synthesize_media(d, "doc_id", "text", mixed_kinds=True)
    return sample_frames(m, every_ms=1000)


MM_FRAMES_SQL = """
WITH media AS (
  SELECT doc_id AS media_id,
         CAST(length(text) * 37 % 9000 + 1000 AS INT) AS duration_ms,
         md5(text) || md5(md5(text)) || md5(md5(md5(text))) AS content_hex
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id, CAST(f.f AS INT) AS frame_ms,
       md5(content_hex || '#' || CAST(f.f AS VARCHAR)) AS frame_fingerprint
FROM media, LATERAL (SELECT unnest(generate_series(0, duration_ms, 1000)) AS f) f
"""


def multimodal_decode_real(spark, sf_dir):
    """REAL container decode: genuine PPM images and RIFF/WAV PCM16
    audio (stdlib parsers — see operators/multimodal.decode_real_media).
    Rows-only oracle (byte-level decode isn't SQL-expressible); header
    round-trip and sample-level parity are unit-tested in
    tests/test_multimodal.py."""
    d = t(spark, sf_dir, "documents")
    m = synthesize_real_media(d, "doc_id", "text")
    return decode_real_media(m)


def multimodal_jpeg_headers(spark, sf_dir):
    """Codec-free JPEG header metadata over the real-container media
    table: frame dimensions, component count, baseline-vs-progressive
    (SOF0/1 vs SOF2), and the EXIF Orientation tag parsed from the
    APP1 TIFF directory in BOTH byte orders
    (operators/multimodal.parse_jpeg_headers).  Fully oracled: the
    fixture derives every field from ``doc_id`` arithmetic, so the
    DuckDB twin recomputes what the byte-level marker walk must
    recover — an arithmetic oracle over a genuine binary parse."""
    from rick_and_morty_data_pipeline_project_spark.operators.multimodal import (
        parse_jpeg_headers,
    )

    d = t(spark, sf_dir, "documents")
    m = synthesize_real_media(d, "doc_id", "text").filter(
        F.col("format") == "jpeg"
    )
    return parse_jpeg_headers(m)


def multimodal_mp4_boxes(spark, sf_dir):
    """Codec-free ISO-BMFF (MP4) container audit over the video media
    table: major brand, movie timescale + duration (both mvhd
    versions), track count, the vide-handler track's 16.16 fixed-point
    dimensions, and total mdat payload bytes (largesize form included)
    — parsed from genuine box structures by
    operators/multimodal.parse_mp4_boxes.  Fully oracled: the fixture
    derives every field from ``doc_id`` arithmetic, so the DuckDB twin
    recomputes what the byte-level box walk must recover — the same
    arithmetic-oracle-over-real-binary-parse pattern as
    ``multimodal_jpeg_headers``.  Closes the reference's last stubbed
    media format at the container level; SAMPLE decode (H.264 entropy)
    genuinely needs a codec and stays refused in decode_real_media."""
    from rick_and_morty_data_pipeline_project_spark.operators.multimodal import (
        parse_mp4_boxes,
        synthesize_mp4_media,
    )

    d = t(spark, sf_dir, "documents")
    m = synthesize_mp4_media(d, "doc_id", "text")
    return parse_mp4_boxes(m)


MM_MP4_BOXES_SQL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
       CAST(1000 * (doc_id % 3 + 1) AS BIGINT) AS timescale,
       CAST(doc_id * 37 % 9000 + 1000 AS BIGINT) AS duration_ms,
       CAST(doc_id % 2 + 1 AS INT) AS n_tracks,
       CAST(doc_id % 32 + 16 AS INT) AS width,
       CAST(doc_id % 24 + 16 AS INT) AS height,
       CAST(doc_id % 64 + 32 AS BIGINT) AS mdat_bytes
FROM documents
"""


def multimodal_jpeg_decode_audit(spark, sf_dir):
    """Driver-checkable contract of the pure-Python baseline JPEG
    codec (operators/jpegcodec.py): for every baseline JPEG in the
    real-container media table, decode the actual entropy stream and
    assert the decoded image matches the pre-encode material — decoded
    dims equal the arithmetic dims (DuckDB-checkable columns) and
    every decoded pixel sits within the flat-quant loss bound of the
    deterministic material bytes the fixture encoded, reported as a
    boolean the oracle pins TRUE.  A codec regression (DCT, Huffman,
    stuffing, color transform) turns the row red.

    Bound: ≤5 LSB.  Measured error over 4,000 fixture-shaped images
    AND the full sf0.1 fixture set maxes at 3; the adversarial
    flat-quant worst case (all 64 coefficient roundings of all three
    planes aligned through the color transform) is far looser but
    unattainable for md5-derived content.  A driver gate needs margin
    over the observed maximum — 3 exactly-at-the-bound fixtures per
    4,000 showed ≤3 had none, and an unlucky corpus would turn the row
    red with no codec regression.

    Scale: narrow mapInPandas over the binary column — decode is
    per-row CPU, no shuffle; only the 4-column audit result moves.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from rick_and_morty_data_pipeline_project_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
    )
    from rick_and_morty_data_pipeline_project_spark.operators.multimodal import (
        material_stream as material,
    )

    d = t(spark, sf_dir, "documents")
    m = (
        synthesize_real_media(d, "doc_id", "text")
        .filter(F.col("format") == "jpeg")
        .filter(F.col("media_id") % 3 != 0)  # baseline fixtures only
        .join(
            d.select(F.col("doc_id").alias("media_id"), "text"), "media_id"
        )
    )

    def batches(it):
        for pdf in it:
            rows = []
            for mid, content, text in zip(
                pdf["media_id"], pdf["content"], pdf["text"]
            ):
                mid = int(mid)
                w, h, rgb = decode_baseline_jpeg(bytes(content))
                src = np.frombuffer(
                    material(
                        hashlib.md5(text.encode()).hexdigest(), w * h * 3
                    ),
                    dtype=np.uint8,
                ).reshape(h, w, 3)
                ok = bool(
                    int(np.abs(rgb.astype(int) - src.astype(int)).max()) <= 5
                )
                rows.append((mid, w, h, ok))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "decode_ok"]
            )

    return m.mapInPandas(
        batches,
        "media_id long, width int, height int, decode_ok boolean",
    )


MM_JPEG_DECODE_AUDIT_SQL = """
SELECT doc_id AS media_id,
       CAST(doc_id % 20 + 8 AS INT) AS width,
       CAST(doc_id % 15 + 8 AS INT) AS height,
       TRUE AS decode_ok
FROM documents
WHERE doc_id % 4 = 3 AND doc_id % 3 <> 0
"""


MM_JPEG_HEADERS_SQL = """
SELECT doc_id AS media_id,
       CAST(doc_id % 20 + 8 AS INT) AS width,
       CAST(doc_id % 15 + 8 AS INT) AS height,
       CAST(3 AS INT) AS n_components,
       doc_id % 3 = 0 AS progressive,
       CASE WHEN doc_id % 8 = 3 THEN 'MM' ELSE 'II' END AS byte_order,
       CAST(doc_id % 8 + 1 AS INT) AS orientation
FROM documents
WHERE doc_id % 4 = 3
"""


QUERIES: dict[str, Q] = {
    "multimodal_metadata_stats": Q(multimodal_metadata_stats, MM_META_SQL),
    "multimodal_jpeg_headers": Q(multimodal_jpeg_headers, MM_JPEG_HEADERS_SQL),
    "multimodal_mp4_boxes": Q(multimodal_mp4_boxes, MM_MP4_BOXES_SQL),
    "multimodal_jpeg_decode_audit": Q(
        multimodal_jpeg_decode_audit, MM_JPEG_DECODE_AUDIT_SQL
    ),
    "multimodal_decode_features": Q(multimodal_decode_features, MM_DECODE_SQL),
    "multimodal_resize_dims": Q(multimodal_resize_dims, MM_RESIZE_SQL),
    "multimodal_frame_samples": Q(multimodal_frame_samples, MM_FRAMES_SQL),
    "multimodal_decode_real": Q(multimodal_decode_real, None),
}
