"""Multimodal (image/audio/video) column plumbing.

Media is modeled as opaque ``binary`` content plus a typed metadata
struct — the layout a 100 TB multimodal corpus uses (content in parquet
binary columns or object-store URIs, metadata queryable without touching
bytes).

Decode has three tiers:
* **Real** — formats the Python stdlib can genuinely parse: WAV
  (``wave`` module, real RIFF containers with PCM16 samples), PPM
  (P6 header + raw pixels), PNG (zlib-inflated 8-bit RGB with real
  chunk CRCs), and JPEG dimensions (SOF marker scan — header bytes
  are real; pixel decode would need a DCT codec).
  ``synthesize_real_media`` builds genuine container bytes;
  ``decode_real_media`` parses them back with actual decoders — no
  external codec needed.
* **Fake** — a deterministic byte-stats stand-in (``decode_media(
  fake=True)``) used where oracle determinism matters.
* **Stubbed** — only SAMPLE decode of codec formats now: MP4 *container*
  structure is real (``synthesize_mp4_media`` builds genuine ISO-BMFF
  box trees, ``parse_mp4_boxes`` walks them back — brand, versioned
  mvhd, per-track tkhd/hdlr, largesize mdat), but the H.264 entropy
  stream inside genuinely requires a codec and stays a clearly-marked
  ``NotImplementedError`` in ``decode_real_media``.  Baseline JPEG
  pixels are no longer stubbed — ``operators/jpegcodec.py`` implements
  the DCT codec in pure Python/numpy (encode for the fixtures, decode
  here); progressive JPEG (SOF2) remains header-only by refusal.

Everything Spark-side — schema, Arrow batching, partition behavior, UDF
signatures — is real and tested in all three tiers.
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


REAL_DECODED_SCHEMA = (
    "media_id long, kind string, format string, n_bytes long, "
    "width int, height int, n_samples int, mean_value double"
)


def material_stream(seed: str, n: int) -> bytes:
    """Deterministic byte material: chained md5 digests from a hex-seed
    string.  THE single definition — the fixture generator below, the
    ``multimodal_jpeg_decode_audit`` pre-encode check, and the
    decode-real unit test all regenerate the same stream from this
    function; a drifted copy would make the audit compare against the
    wrong reference."""
    import hashlib

    out = b""
    h = seed.encode()
    while len(out) < n:
        h = hashlib.md5(h).digest()
        out += h
    return out[:n]


def synthesize_real_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build GENUINE container bytes (fixture generator, Arrow-batched),
    round-robin by id % 4: PPM (P6) images, RIFF/WAV PCM16 audio, PNG
    (real zlib-deflated 8-bit RGB, CRC-correct chunks — any viewer opens
    it), and JPEG — baseline ones (id % 3 != 0) are REAL decodable
    JPEGs produced by the pure-Python DCT encoder
    (operators/jpegcodec.py; any viewer opens them too), progressive
    ones (id % 3 == 0) carry a structurally-valid SOF2 marker stream
    with filler entropy (header-parse fixtures).  Bytes are derived
    deterministically from md5(text), so the table is stable across
    runs/engines — this is real media, not a fake byte blob."""
    from rick_and_morty_data_pipeline_project_spark.operators.parallelism import (
        fan_out,
    )

    # fan_out BEFORE the codec stage (r14): the JPEG/PNG/WAV encoders
    # are genuinely expensive per-row Python (measured 4.6 s of encode
    # CPU for the 833 sf0.1 baseline JPEGs alone), and the local
    # single-file scan would run them 1-way.  Only the narrow
    # (media_id, md5-hex) relation crosses the balancing exchange — the
    # container bytes are produced post-exchange and still never
    # shuffle; at cluster scale the guard is a no-op.
    src = fan_out(
        df.select(
            F.col(id_col).alias("media_id"), F.md5(F.col(text_col)).alias("_h")
        )
    )

    def batches(it: Iterator):
        import io
        import struct
        import wave
        import zlib

        import pandas as pd

        material = material_stream

        def png_chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        for pdf in it:
            rows = []
            for mid, h in zip(pdf["media_id"], pdf["_h"]):
                mid = int(mid)
                sel = mid % 4
                if sel == 0:
                    w, ht = mid % 16 + 4, mid % 12 + 4
                    pixels = material(h, w * ht * 3)
                    content = f"P6\n{w} {ht}\n255\n".encode() + pixels
                    rows.append(
                        (mid, "image", "ppm", w, ht, None, content)
                    )
                elif sel == 1:
                    n_frames = mid % 50 + 20
                    pcm = material(h, n_frames * 2)
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wv:
                        wv.setnchannels(1)
                        wv.setsampwidth(2)
                        wv.setframerate(8000)
                        wv.writeframes(pcm)
                    dur = int(n_frames * 1000 / 8000)
                    rows.append(
                        (mid, "audio", "wav", None, None, dur, buf.getvalue())
                    )
                elif sel == 2:
                    w, ht = mid % 14 + 4, mid % 10 + 4
                    raw = material(h, w * ht * 3)
                    scanlines = b"".join(
                        b"\x00" + raw[y * w * 3 : (y + 1) * w * 3]
                        for y in range(ht)
                    )
                    ihdr = struct.pack(">IIBBBBB", w, ht, 8, 2, 0, 0, 0)
                    content = (
                        b"\x89PNG\r\n\x1a\n"
                        + png_chunk(b"IHDR", ihdr)
                        + png_chunk(b"IDAT", zlib.compress(scanlines))
                        + png_chunk(b"IEND", b"")
                    )
                    rows.append(
                        (mid, "image", "png", w, ht, None, content)
                    )
                else:
                    w, ht = mid % 20 + 8, mid % 15 + 8
                    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
                    # Real EXIF APP1: TIFF header + one-entry IFD0
                    # carrying Orientation (tag 0x0112) = mid % 8 + 1,
                    # alternating byte order so parsers must honor
                    # II/MM, not assume one.  JPEG mids are always
                    # ≡ 3 (mod 4), so alternate on mid % 8 — a mid % 2
                    # rule would leave the MM writer dead code.
                    orientation = mid % 8 + 1
                    if mid % 8 == 3:
                        bo, e = b"MM", ">"
                    else:
                        bo, e = b"II", "<"
                    ifd0 = (
                        struct.pack(e + "H", 1)
                        + struct.pack(e + "HHI", 0x0112, 3, 1)
                        + struct.pack(e + "H", orientation)
                        + b"\x00\x00"
                        + struct.pack(e + "I", 0)  # next-IFD: none
                    )
                    app1 = (
                        b"Exif\x00\x00"
                        + bo
                        + struct.pack(e + "H", 42)
                        + struct.pack(e + "I", 8)
                        + ifd0
                    )
                    app_segs = (
                        b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
                        + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
                    )
                    if mid % 3 == 0:
                        # Every third JPEG is progressive (SOF2): the
                        # header-only dimension/metadata parse must
                        # treat baseline and progressive alike, and the
                        # decoder's honest SOF2 refusal stays exercised.
                        # Synthetic entropy data (never decoded).
                        sof2 = (
                            bytes([8])
                            + struct.pack(">HH", ht, w)
                            + bytes([3])
                            + bytes([1, 0x11, 0])
                            + bytes([2, 0x11, 1])
                            + bytes([3, 0x11, 1])
                        )
                        sos = bytes([3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0])
                        entropy = material(h, 24)
                        content = (
                            b"\xff\xd8" + app_segs
                            + b"\xff\xc2"
                            + struct.pack(">H", len(sof2) + 2) + sof2
                            + b"\xff\xda"
                            + struct.pack(">H", len(sos) + 2) + sos
                            + entropy.replace(b"\xff", b"\xfe")
                            + b"\xff\xd9"
                        )
                    else:
                        # Baseline JPEGs are REAL: deterministic pixel
                        # material encoded through the pure-Python DCT
                        # codec (operators/jpegcodec.py), same APP0/
                        # APP1 EXIF blocks, same dimensions — the
                        # header-walk oracle's doc-id arithmetic is
                        # unchanged, and decode_real_media now
                        # recovers actual pixels.
                        import numpy as _np

                        from rick_and_morty_data_pipeline_project_spark.operators.jpegcodec import (
                            encode_baseline_jpeg,
                        )

                        pixels = _np.frombuffer(
                            material(h, w * ht * 3), dtype=_np.uint8
                        ).reshape(ht, w, 3)
                        content = encode_baseline_jpeg(
                            pixels, app_segments=app_segs
                        )
                    rows.append(
                        (mid, "image", "jpeg", w, ht, None, content)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "format",
                    "width",
                    "height",
                    "duration_ms",
                    "content",
                ],
            )

    return src.mapInPandas(batches, schema=MEDIA_SCHEMA)


def decode_real_media(df: DataFrame) -> DataFrame:
    """REAL decode via Arrow-batched ``mapInPandas``: WAV through the
    stdlib ``wave`` reader (actual RIFF parsing — sample rate, width,
    and frames come from the container, not metadata), PPM through its
    P6 header, PNG fully through stdlib ``zlib`` (chunk walk with IHDR
    dims, IDAT inflate, per-scanline filter strip — supports the
    filter-0 non-interlaced 8-bit RGB layout; other filter types need a
    full reconstructor and raise), and JPEG through the pure-Python
    baseline DCT decoder (operators/jpegcodec.py: DQT/DHT parse,
    Huffman + zigzag + dequant + IDCT + YCbCr→RGB — real pixels, real
    ``mean_value``; progressive SOF2 streams fall back to the
    header-only marker scan with NULL ``mean_value``).  ``mean_value``
    is the mean PCM16 amplitude (audio) or mean pixel byte (decoded
    images).  Formats needing external codecs (mp4 & co) raise —
    this path covers what the stdlib can truly parse, which proves the
    decode plumbing end-to-end."""

    def batches(it: Iterator):
        import io
        import struct
        import wave
        import zlib

        import pandas as pd

        def png_dims_pixels(content: bytes):
            assert content[:8] == b"\x89PNG\r\n\x1a\n", "bad PNG signature"
            w = h = None
            idat = b""
            i = 8
            while i + 8 <= len(content):
                (length,) = struct.unpack(">I", content[i : i + 4])
                tag = content[i + 4 : i + 8]
                data = content[i + 8 : i + 8 + length]
                if tag == b"IHDR":
                    w, h, depth, ctype, _, _, interlace = struct.unpack(
                        ">IIBBBBB", data
                    )
                    if (depth, ctype, interlace) != (8, 2, 0):
                        raise NotImplementedError(
                            "PNG decode here covers 8-bit RGB "
                            "non-interlaced; other layouts need a full "
                            "reconstructor"
                        )
                elif tag == b"IDAT":
                    idat += data
                elif tag == b"IEND":
                    break
                i += 12 + length  # len + tag + data + crc
            raw = zlib.decompress(idat)
            stride = w * 3 + 1
            pixels = bytearray()
            for y in range(h):
                row = raw[y * stride : (y + 1) * stride]
                if row[0] != 0:
                    raise NotImplementedError(
                        f"PNG filter type {row[0]} not supported "
                        "(fixtures write filter 0)"
                    )
                pixels += row[1:]
            return w, h, bytes(pixels)

        def jpeg_dims(content: bytes):
            assert content[:2] == b"\xff\xd8", "bad JPEG SOI"
            i = 2
            while i + 4 <= len(content):
                if content[i] != 0xFF:
                    raise ValueError("desynced JPEG marker stream")
                # the spec allows any number of 0xFF fill bytes before
                # the marker code — skip them or a padded (valid) file
                # reads the fill byte as its marker and desyncs
                while i + 4 <= len(content) and content[i + 1] == 0xFF:
                    i += 1
                marker = content[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                    return w, h
                if marker == 0xDA:  # SOS before any SOF: no dims
                    break
                (seglen,) = struct.unpack(">H", content[i + 2 : i + 4])
                i += 2 + seglen
            raise ValueError("JPEG without a SOF frame header")

        def decode_one(mid, kind, fmt, content):
            content = bytes(content)
            if fmt == "wav":
                with wave.open(io.BytesIO(content), "rb") as wv:
                    n = wv.getnframes()
                    raw = wv.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                mean = float(sum(samples)) / n if n else 0.0
                return (mid, kind, fmt, len(content), None, None, n, mean)
            if fmt == "ppm":
                header, rest = content.split(b"\n", 1)
                assert header == b"P6", header
                dims, rest = rest.split(b"\n", 1)
                _maxval, pixels = rest.split(b"\n", 1)
                w, h = (int(x) for x in dims.split())
                mean = float(sum(pixels)) / len(pixels) if pixels else 0.0
                return (mid, kind, fmt, len(content), w, h, None, mean)
            if fmt == "png":
                w, h, pixels = png_dims_pixels(content)
                mean = float(sum(pixels)) / len(pixels) if pixels else 0.0
                return (mid, kind, fmt, len(content), w, h, None, mean)
            if fmt == "jpeg":
                from rick_and_morty_data_pipeline_project_spark.operators.jpegcodec import (
                    JpegNoScan,
                    decode_baseline_jpeg,
                )

                try:
                    w, h, rgb = decode_baseline_jpeg(content)
                    mean = float(rgb.astype("float64").mean())
                except (NotImplementedError, JpegNoScan):
                    # progressive/subsampled (refused feature) or a
                    # metadata-only stream (SOF but no scan): header-
                    # only — dims from the marker walk, no pixel stats.
                    # Any OTHER ValueError is a corrupt scan and stays
                    # loud, never silently dims-only.
                    w, h = jpeg_dims(content)
                    mean = None
                return (mid, kind, fmt, len(content), w, h, None, mean)
            raise NotImplementedError(
                f"format {fmt!r} needs external codecs (PIL/ffmpeg), "
                f"not available here"
            )

        for pdf in it:
            rows = [
                decode_one(int(m), k, f, c)
                for m, k, f, c in zip(
                    pdf["media_id"], pdf["kind"], pdf["format"], pdf["content"]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "format",
                    "n_bytes",
                    "width",
                    "height",
                    "n_samples",
                    "mean_value",
                ],
            )

    return df.mapInPandas(batches, schema=REAL_DECODED_SCHEMA)


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
                    # fingerprint over the LOWERCASE HEX of the bytes,
                    # not the raw blob: engine-portable (DuckDB's md5
                    # only takes strings), equally collision-resistant,
                    # and therefore fully SQL-oracle-able
                    "checksum": content.map(
                        lambda b: hashlib.md5(
                            bytes(b).hex().encode()
                        ).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


JPEG_HEADER_SCHEMA = (
    "media_id long, width int, height int, n_components int, "
    "progressive boolean, byte_order string, orientation int"
)


def parse_jpeg_headers(df: DataFrame) -> DataFrame:
    """Codec-free JPEG header metadata via Arrow-batched
    ``mapInPandas``: one marker walk per blob yields frame dimensions,
    component count, the baseline/progressive distinction
    (SOF0/1 vs SOF2 — the scan-order property download pipelines key
    retry/transcode decisions on), and the EXIF Orientation tag parsed
    from the APP1 TIFF directory honoring BOTH byte orders (``II`` and
    ``MM`` — a little-endian-only parser silently misreads half the
    web's cameras).  No pixel decode anywhere: headers are a few
    hundred bytes, so at 100 TB this reads marker segments and skips
    entropy data, and the binary column itself never shuffles (the
    parse is a narrow map; only the 7-column metadata result moves).

    Rows that are not JPEG (or fail the walk) are passed through with
    NULL metadata rather than failing the batch — corpus-scale media
    tables always contain breakage, and a poison blob must not kill
    the job.
    """

    def batches(it: Iterator):
        import struct

        import pandas as pd

        def exif_orientation(data: bytes):
            # data: APP1 payload after the 2-byte length
            if data[:6] != b"Exif\x00\x00":
                return None, None
            tiff = data[6:]
            if tiff[:2] == b"MM":
                e = ">"
            elif tiff[:2] == b"II":
                e = "<"
            else:
                return None, None
            bo = tiff[:2].decode()
            (magic,) = struct.unpack(e + "H", tiff[2:4])
            if magic != 42:
                return bo, None
            (ifd_off,) = struct.unpack(e + "I", tiff[4:8])
            if ifd_off + 2 > len(tiff):
                return bo, None
            (n_entries,) = struct.unpack(
                e + "H", tiff[ifd_off : ifd_off + 2]
            )
            for j in range(n_entries):
                at = ifd_off + 2 + 12 * j
                entry = tiff[at : at + 12]
                if len(entry) < 12:
                    break
                tag, typ, cnt = struct.unpack(e + "HHI", entry[:8])
                if tag == 0x0112 and typ == 3 and cnt == 1:
                    (val,) = struct.unpack(e + "H", entry[8:10])
                    return bo, int(val)
            return bo, None

        _EMPTY = {
            "width": None,
            "height": None,
            "n_components": None,
            "progressive": None,
            "byte_order": None,
            "orientation": None,
        }

        def parse_one(content: bytes):
            # The tolerance contract lives HERE, not in the callers:
            # truncated segments raise struct.error/IndexError from any
            # depth of the walk, and one poison blob must yield a row
            # (never a failed Arrow batch) that KEEPS whatever fields
            # parsed before the corruption — a valid SOF followed by a
            # truncated tail still reports its dimensions.
            out = dict(_EMPTY)
            try:
                _walk(content, out)
            except (struct.error, IndexError, ValueError):
                pass
            return out

        def _walk(content: bytes, out: dict):
            if content[:2] != b"\xff\xd8":
                return out
            i = 2
            while i + 4 <= len(content):
                if content[i] != 0xFF:
                    return out
                while i + 4 <= len(content) and content[i + 1] == 0xFF:
                    i += 1
                marker = content[i + 1]
                if marker == 0xDA:  # SOS: entropy data follows
                    break
                (seglen,) = struct.unpack(">H", content[i + 2 : i + 4])
                seg = content[i + 4 : i + 2 + seglen]
                if marker in (0xC0, 0xC1, 0xC2):
                    h, w = struct.unpack(">HH", seg[1:5])
                    # dims land in `out` BEFORE the components byte is
                    # touched — a segment truncated after the dims
                    # still yields them (partial retention)
                    out["width"], out["height"] = int(w), int(h)
                    out["progressive"] = marker == 0xC2
                    out["n_components"] = int(seg[5])
                elif marker == 0xE1:
                    try:
                        bo, orient = exif_orientation(seg)
                        out["byte_order"] = bo
                        out["orientation"] = orient
                    except (struct.error, IndexError):
                        pass  # corrupt EXIF must not cost us later SOF
                i += 2 + seglen
            return out

        for pdf in it:
            parsed = [parse_one(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [p["width"] for p in parsed],
                    "height": [p["height"] for p in parsed],
                    "n_components": [p["n_components"] for p in parsed],
                    "progressive": [p["progressive"] for p in parsed],
                    "byte_order": [p["byte_order"] for p in parsed],
                    "orientation": [p["orientation"] for p in parsed],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        batches, schema=JPEG_HEADER_SCHEMA
    )


MP4_BOX_SCHEMA = (
    "media_id long, brand string, timescale long, duration_ms long, "
    "n_tracks int, width int, height int, mdat_bytes long"
)


def synthesize_mp4_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build GENUINE ISO-BMFF (MP4) container bytes, one video file per
    row, Arrow-batched.  These are real box structures — ``ftyp`` with
    a major brand, ``moov`` holding a versioned ``mvhd`` (every fifth
    file uses the version-1 64-bit layout, so a version-0-only parser
    fails loudly on the fixtures), one or two ``trak`` trees whose
    ``tkhd`` carries 16.16 fixed-point dimensions and whose
    ``mdia``/``hdlr`` names the handler (``vide``/``soun``), and an
    ``mdat`` payload (every seventh file writes it with the
    ``size == 1`` + 64-bit largesize header form that >4 GiB media
    files require — at 100 TB corpus scale largesize ``mdat`` is the
    norm, not the exception).  Every metadata field derives from
    ``doc_id`` arithmetic so the DuckDB twin can recompute what the
    byte-level box walk must recover:

    * brand            isom / mp42 by ``id % 2``
    * timescale        ``1000 * (id % 3 + 1)`` — duration_ms is exact
    * duration_ms      ``id * 37 % 9000 + 1000`` (the frame-sample law)
    * n_tracks         ``id % 2 + 1`` (video always; audio on even)
    * width × height   ``id % 32 + 16`` × ``id % 24 + 16``
    * mdat payload     ``id % 64 + 32`` deterministic material bytes

    Sample data is deterministic material (no H.264 entropy coding —
    SAMPLE decode genuinely needs a codec and stays refused in
    ``decode_real_media``), but the container structure is the real
    format: box sizes account for every byte, a standards-conforming
    demuxer walks these files.
    """
    from rick_and_morty_data_pipeline_project_spark.operators.parallelism import (
        fan_out,
    )

    # fan_out for the same reason as synthesize_real_media: per-row
    # Python box assembly on an otherwise 1-partition local scan; only
    # (media_id, md5-hex) crosses the exchange, bytes never shuffle.
    src = fan_out(
        df.select(
            F.col(id_col).alias("media_id"), F.md5(F.col(text_col)).alias("_h")
        )
    )

    def batches(it: Iterator):
        import struct

        import pandas as pd

        _MATRIX = struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )

        def box(tag: bytes, payload: bytes, large: bool = False) -> bytes:
            if large:
                return (
                    struct.pack(">I", 1)
                    + tag
                    + struct.pack(">Q", len(payload) + 16)
                    + payload
                )
            return struct.pack(">I", len(payload) + 8) + tag + payload

        def fullbox(tag: bytes, version: int, payload: bytes) -> bytes:
            return box(tag, bytes([version]) + b"\x00\x00\x00" + payload)

        def hdlr(handler: bytes, name: bytes) -> bytes:
            return fullbox(
                b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12 + name + b"\x00"
            )

        def tkhd(track_id: int, dur: int, w: int, h: int, vol: int) -> bytes:
            return fullbox(
                b"tkhd",
                0,
                struct.pack(">III", 1, 2, track_id)
                + b"\x00" * 4
                + struct.pack(">I", dur)
                + b"\x00" * 8
                + struct.pack(">HHHH", 0, 0, vol, 0)
                + _MATRIX
                + struct.pack(">II", w << 16, h << 16),
            )

        for pdf in it:
            rows = []
            for mid, h in zip(pdf["media_id"], pdf["_h"]):
                mid = int(mid)
                brand = b"isom" if mid % 2 == 0 else b"mp42"
                k = mid % 3 + 1
                timescale = 1000 * k
                duration_ms = mid * 37 % 9000 + 1000
                dur_units = duration_ms * k
                w, ht = mid % 32 + 16, mid % 24 + 16
                ftyp = box(
                    b"ftyp", brand + struct.pack(">I", 512) + b"isom" + brand
                )
                if mid % 5 == 0:
                    # version-1 mvhd: 64-bit creation/modification
                    # times and duration (the post-2040 / long-running
                    # capture layout)
                    mvhd = fullbox(
                        b"mvhd",
                        1,
                        struct.pack(
                            ">QQIQ", 1, 2, timescale, dur_units
                        )
                        + struct.pack(">IHH", 0x10000, 0x100, 0)
                        + b"\x00" * 8
                        + _MATRIX
                        + b"\x00" * 24
                        + struct.pack(">I", mid % 2 + 2),
                    )
                else:
                    mvhd = fullbox(
                        b"mvhd",
                        0,
                        struct.pack(
                            ">IIII", 1, 2, timescale, dur_units
                        )
                        + struct.pack(">IHH", 0x10000, 0x100, 0)
                        + b"\x00" * 8
                        + _MATRIX
                        + b"\x00" * 24
                        + struct.pack(">I", mid % 2 + 2),
                    )
                video = box(
                    b"trak",
                    tkhd(1, dur_units, w, ht, 0)
                    + box(b"mdia", hdlr(b"vide", b"VideoHandler")),
                )
                traks = video
                if mid % 2 == 1:
                    traks += box(
                        b"trak",
                        tkhd(2, dur_units, 0, 0, 0x100)
                        + box(b"mdia", hdlr(b"soun", b"SoundHandler")),
                    )
                moov = box(b"moov", mvhd + traks)
                payload = material_stream(h, mid % 64 + 32)
                mdat = box(b"mdat", payload, large=(mid % 7 == 0))
                rows.append(
                    (
                        mid,
                        "video",
                        "mp4",
                        w,
                        ht,
                        duration_ms,
                        ftyp + moov + mdat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "format",
                    "width",
                    "height",
                    "duration_ms",
                    "content",
                ],
            )

    return src.mapInPandas(batches, schema=MEDIA_SCHEMA)


def parse_mp4_boxes(df: DataFrame) -> DataFrame:
    """Codec-free ISO-BMFF (MP4) structure parse via Arrow-batched
    ``mapInPandas``: one box walk per blob yields the major brand
    (``ftyp``), movie timescale and duration in milliseconds from the
    versioned ``mvhd`` (both the version-0 32-bit and version-1 64-bit
    layouts — a v0-only parser misreads long-running captures), the
    track count with the video track's 16.16 fixed-point dimensions
    resolved through each ``trak``'s ``mdia``/``hdlr`` handler type
    (``vide`` — NOT "the track with nonzero width", which disguised
    subtitle tracks break), and total ``mdat`` payload bytes honoring
    the ``size == 1`` 64-bit largesize header form.

    No sample decode anywhere: the walk touches box headers and the
    few-hundred-byte ``moov`` tree, skipping sample data entirely — at
    100 TB this is the access pattern that makes container audits
    cheap (metadata bytes move, media bytes don't), and the parse is a
    narrow map: only the 8-column result shuffles.

    Rows that are not ISO-BMFF (or break mid-walk) pass through with
    whatever fields parsed before the corruption and NULLs elsewhere —
    corpus-scale media tables always contain breakage, and a poison
    blob must not kill the batch (same tolerance contract as
    ``parse_jpeg_headers``).
    """

    def batches(it: Iterator):
        import struct

        import pandas as pd

        def walk(buf: bytes, lo: int, hi: int):
            """Yield (type, payload_lo, payload_hi) for boxes in
            buf[lo:hi], honoring largesize and size==0 (to-end)."""
            i = lo
            while i + 8 <= hi:
                (size,) = struct.unpack(">I", buf[i : i + 4])
                tag = buf[i + 4 : i + 8]
                body = i + 8
                if size == 1:
                    (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
                    body = i + 16
                elif size == 0:
                    size = hi - i
                end = i + size
                if size < 8 or end > hi:
                    raise ValueError("box overruns container")
                yield tag, body, end
                i = end

        _EMPTY = {
            "brand": None,
            "timescale": None,
            "duration_ms": None,
            "n_tracks": None,
            "width": None,
            "height": None,
            "mdat_bytes": None,
        }

        def parse_one(content: bytes):
            # Tolerance contract: struct.error/IndexError/ValueError
            # from any depth leaves the fields parsed so far in place.
            out = dict(_EMPTY)
            try:
                _parse(content, out)
            except (struct.error, IndexError, ValueError):
                pass
            return out

        def _parse(buf: bytes, out: dict):
            for tag, lo, hi in walk(buf, 0, len(buf)):
                if tag == b"ftyp":
                    out["brand"] = buf[lo : lo + 4].decode("ascii")
                elif tag == b"mdat":
                    out["mdat_bytes"] = (out["mdat_bytes"] or 0) + (hi - lo)
                elif tag == b"moov":
                    n_tracks = 0
                    for t2, l2, h2 in walk(buf, lo, hi):
                        if t2 == b"mvhd":
                            ver = buf[l2]
                            if ver == 1:
                                ts, dur = struct.unpack(
                                    ">IQ", buf[l2 + 20 : l2 + 32]
                                )
                            else:
                                ts, dur = struct.unpack(
                                    ">II", buf[l2 + 12 : l2 + 20]
                                )
                            out["timescale"] = int(ts)
                            if ts:
                                out["duration_ms"] = int(dur * 1000 // ts)
                        elif t2 == b"trak":
                            n_tracks += 1
                            dims = handler = None
                            for t3, l3, h3 in walk(buf, l2, h2):
                                if t3 == b"tkhd":
                                    ver = buf[l3]
                                    # width/height are the last 8 bytes
                                    # in both tkhd versions
                                    wfx, hfx = struct.unpack(
                                        ">II", buf[h3 - 8 : h3]
                                    )
                                    dims = (wfx >> 16, hfx >> 16)
                                elif t3 == b"mdia":
                                    for t4, l4, _h4 in walk(buf, l3, h3):
                                        if t4 == b"hdlr":
                                            handler = buf[
                                                l4 + 8 : l4 + 12
                                            ].decode("ascii", "replace")
                            if handler == "vide" and dims is not None:
                                out["width"], out["height"] = (
                                    int(dims[0]),
                                    int(dims[1]),
                                )
                    out["n_tracks"] = n_tracks

        for pdf in it:
            parsed = [parse_one(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "brand": [p["brand"] for p in parsed],
                    "timescale": [p["timescale"] for p in parsed],
                    "duration_ms": [p["duration_ms"] for p in parsed],
                    "n_tracks": [p["n_tracks"] for p in parsed],
                    "width": [p["width"] for p in parsed],
                    "height": [p["height"] for p in parsed],
                    "mdat_bytes": [p["mdat_bytes"] for p in parsed],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        batches, schema=MP4_BOX_SCHEMA
    )
