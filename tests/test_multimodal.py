"""Multimodal operators: plumbing real, codec stubbed."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest
from pyspark.sql.utils import PythonException

from cruncher_spark.operators.multimodal import (
    attach_media,
    decode_features,
    frame_sample,
    resize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (100 * i + i), "en", "web", 100 * i + i) for i in range(1, 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return attach_media(docs)


def test_payload_is_binary_and_metadata_typed(media):
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["width"] == "int" and dtypes["sample_rate"] == "int"
    rows = {r.media_id: r for r in media.collect()}
    assert rows[3].kind == "image" and rows[4].kind == "audio"
    assert rows[5].kind == "video" and rows[5].n_frames is not None
    assert rows[3].sample_rate is None  # audio-only metadata


def test_decode_features_deterministic_and_batchwise(media):
    out = {r.media_id: r for r in decode_features(media).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, payload in src.items():
        assert out[mid].f_hash == hashlib.md5(payload).hexdigest()
        assert out[mid].size_bytes == len(payload)


def test_real_decode_raises_not_implemented(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media, real_decode=True).collect()


def test_resize_truncates_only(media):
    out = resize_media(media, max_bytes=300)
    lens = {
        r.media_id: r.n for r in out.select(
            "media_id", F.octet_length("payload").alias("n")
        ).collect()
    }
    orig = {
        r.media_id: r.n for r in media.select(
            "media_id", F.octet_length("payload").alias("n")
        ).collect()
    }
    for mid in orig:
        assert lens[mid] == min(orig[mid], 300)


def test_frame_sample_strides_and_tail(media):
    frames = frame_sample(media, frame_size=100, every_n=2).collect()
    assert frames, "expected at least one video payload"
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    videos = {
        r.media_id: r.n
        for r in media.where(F.col("kind") == "video")
        .select("media_id", F.octet_length("payload").alias("n"))
        .collect()
    }
    for mid, rows in by_media.items():
        n = videos[mid]
        expect_frames = (n - 1) // 200 + 1
        assert len(rows) == expect_frames
        sizes = [r.frame_bytes for r in sorted(rows, key=lambda r: r.frame_no)]
        assert all(s == 100 for s in sizes[:-1])
        assert sizes[-1] == min(100, n - 200 * (expect_frames - 1))
