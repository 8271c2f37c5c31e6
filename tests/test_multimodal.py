"""Multimodal plumbing: binary columns + metadata, Arrow-batched decode."""

from __future__ import annotations

import hashlib

import pytest

from rick_and_morty_data_pipeline_project_spark.operators.multimodal import (
    decode_media,
    synthesize_media,
)
from tests.conftest import SF_SMALL


def test_media_roundtrip(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20)
    media = synthesize_media(docs, "doc_id", "text")
    schema = dict(media.dtypes)
    assert schema["content"] == "binary"
    assert schema["width"] == "int"

    decoded = decode_media(media, fake=True).collect()
    assert len(decoded) == 20
    row = decoded[0]
    assert row["n_bytes"] == 48  # 3 chained md5 digests = 48 bytes
    assert 0 <= row["mean_byte"] <= 255

    # checksum must agree with a driver-side recompute of the same bytes
    content = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert row["checksum"] == hashlib.md5(content[row["media_id"]]).hexdigest()


def test_real_decode_is_stubbed(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(1)
    media = synthesize_media(docs, "doc_id", "text")
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)
