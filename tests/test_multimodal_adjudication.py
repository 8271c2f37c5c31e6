"""Pin of the FROZEN multimodal refusal set (COVERAGE.md §"Multimodal
refusals — FROZEN at 2", round 11).

Two decode surfaces are formally adjudicated CLOSED as refusals, the
same way the rows-only core was frozen at 4:

1. **Progressive-JPEG pixel decode** (SOF2): refused inside
   ``operators/jpegcodec.decode_baseline_jpeg``; the ``decode_real_media``
   pipeline degrades DETERMINISTICALLY to header-only dimensions
   (``mean_value`` NULL), never to wrong pixels.
2. **MP4 sample decode** (codec payloads inside the container):
   refused by ``decode_media(fake=False)`` / the real decoder's
   format gate; the CONTAINER level (ISO-BMFF box trees) is fully
   implemented and oracled (``parse_mp4_boxes``).

These tests pin the refusal boundary exactly: the guards must stay
loud NotImplementedError (silent wrong output is the failure mode
being excluded), and the progressive fallback must keep producing
header dims.  Widening or narrowing the frozen set must update BOTH
the COVERAGE.md adjudication table and this file in the same change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.operators.jpegcodec import (
    decode_baseline_jpeg,
)
from rick_and_morty_data_pipeline_project_spark.operators.multimodal import (
    decode_media,
    synthesize_media,
)


def _minimal_progressive_jpeg() -> bytes:
    """SOI + SOF2 (progressive, 3-component 8×8) + EOI — enough marker
    structure to reach the SOF2 guard."""
    sof2_payload = bytes(
        [8, 0, 8, 0, 8, 3]  # precision, h, w, ncomp
        + [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]  # 3 components, 4:4:4
    )
    sof2 = b"\xff\xc2" + (len(sof2_payload) + 2).to_bytes(2, "big") + sof2_payload
    return b"\xff\xd8" + sof2 + b"\xff\xd9"


def test_progressive_jpeg_pixels_refused_loudly():
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_baseline_jpeg(_minimal_progressive_jpeg())


def test_mp4_sample_decode_refused_loudly(spark):
    # the real-codec path is gated: fake=False must refuse before any
    # executor work is scheduled, pointing at the missing codecs
    src = spark.range(1).select(
        F.col("id"), F.lit("sample text").alias("txt")
    )
    df = synthesize_media(src, "id", "txt")
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_media(df, fake=False)


def test_frozen_refusal_set_is_exactly_the_adjudicated_messages():
    """Derive every ``raise NotImplementedError(<literal>)`` from the
    multimodal family's SOURCE and pin the exact message set.  A new
    refusal (whole-surface or sub-feature) cannot ship without going
    red here and updating BOTH this frozen set and the COVERAGE.md
    adjudication table in the same change."""
    import ast
    import inspect

    from rick_and_morty_data_pipeline_project_spark.operators import (
        jpegcodec,
        multimodal,
    )

    found: set[str] = set()
    for mod in (jpegcodec, multimodal):
        tree = ast.parse(inspect.getsource(mod))
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Raise)
                and isinstance(node.exc, ast.Call)
                and isinstance(node.exc.func, ast.Name)
                and node.exc.func.id == "NotImplementedError"
            ):
                continue
            parts = []
            for arg in node.exc.args:
                for sub in ast.walk(arg):
                    if isinstance(sub, ast.Constant) and isinstance(
                        sub.value, str
                    ):
                        parts.append(sub.value)
            found.add("".join(parts))

    frozen = {
        # the TWO adjudicated whole-surface refusals (COVERAGE.md
        # §"Multimodal refusals — FROZEN at 2"):
        "progressive JPEG (SOF2) needs successive-approximation "
        "passes — baseline only",
        "real image/audio decoding requires PIL/ffmpeg, not available "
        "in this environment; use fake=True for the deterministic stub",
        # sub-feature guards of IMPLEMENTED surfaces (loud refusals of
        # codec variants, not whole surfaces):
        "16-bit quant tables",
        "-bit precision",
        "-component JPEG",
        "chroma subsampling (only 4:4:4 supported)",
        "restart intervals (DRI)",
        "scan order differs from frame order",
        "PNG decode here covers 8-bit RGB non-interlaced; other "
        "layouts need a full reconstructor",
        "PNG filter type  not supported (fixtures write filter 0)",
        "format  needs external codecs (PIL/ffmpeg), not available here",
    }
    assert found == frozen, (
        f"multimodal refusal surface drifted: "
        f"new={sorted(found - frozen)} removed={sorted(frozen - found)} "
        "— update COVERAGE.md's adjudication table and this pin together"
    )


def test_progressive_fallback_keeps_header_dims(spark):
    # a progressive stream flowing through the real decode pipeline
    # must come out header-only (dims present, mean NULL) — the
    # deterministic degradation the adjudication promises
    from pyspark.sql import Row

    from rick_and_morty_data_pipeline_project_spark.operators.multimodal import (
        decode_real_media,
    )

    df = spark.createDataFrame(
        [
            Row(
                media_id=1,
                kind="image",
                format="jpeg",
                content=bytearray(_minimal_progressive_jpeg()),
            )
        ]
    )
    row = decode_real_media(df).collect()[0]
    assert (row["width"], row["height"]) == (8, 8)
    assert row["mean_value"] is None
