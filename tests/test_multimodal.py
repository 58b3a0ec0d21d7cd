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


# --- real stdlib codecs ----------------------------------------------------


def test_png_roundtrip_pixel_exact():
    import numpy as np

    from cruncher_spark.functions.codecs import png_decode, png_encode

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(arr)), arr)


def test_png_decode_handles_sub_and_up_filters():
    """Decoder accepts filters 1 (Sub) and 2 (Up), a superset of what our
    encoder emits — re-filter a known image by hand and decode it."""
    import struct
    import zlib

    import numpy as np

    from cruncher_spark.functions.codecs import _chunk, _PNG_SIG, png_decode

    arr = (np.arange(12).reshape(3, 4) * 17 % 256).astype(np.uint8)
    # row 0: None, row 1: Sub, row 2: Up
    r0 = b"\x00" + arr[0].tobytes()
    sub = [int(arr[1][0])] + [
        (int(arr[1][x]) - int(arr[1][x - 1])) & 0xFF for x in range(1, 4)
    ]
    r1 = b"\x01" + bytes(sub)
    up = [(int(arr[2][x]) - int(arr[1][x])) & 0xFF for x in range(4)]
    r2 = b"\x02" + bytes(up)
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(r0 + r1 + r2))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(png), arr)


def test_wav_roundtrip_sample_exact():
    import numpy as np

    from cruncher_spark.functions.codecs import wav_decode, wav_encode

    samples = (np.arange(1000, dtype=np.int64) * 37 % 65536 - 32768).astype(
        np.int16
    )
    rate, back = wav_decode(wav_encode(samples, 16000))
    assert rate == 16000
    assert np.array_equal(back, samples)


def test_resize_nearest_dims_and_content():
    import numpy as np

    from cruncher_spark.functions.codecs import resize_nearest

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = resize_nearest(arr, 4, 4)
    assert out.shape == (4, 4)
    assert np.array_equal(out, arr[::2, ::2])


def test_real_payload_decode_roundtrip(spark):
    """attach_media(real_payloads=True) emits valid PNG/WAV/AVI that
    decode_features_real parses back to the generation metadata."""
    from cruncher_spark.operators.multimodal import (
        VIDEO_DIM_DIV,
        attach_media,
        decode_features_real,
    )
    from cruncher_spark.sources.tables import Star

    docs = Star(spark, "/root/testdata/sf0.001").documents.limit(60)
    media = attach_media(docs, real_payloads=True)
    meta = {
        r.media_id: r
        for r in media.select(
            "media_id", "kind", "width", "height", "sample_rate",
            "n_samples", "n_frames",
        ).collect()
    }
    decoded = decode_features_real(media).collect()
    assert decoded
    kinds = {r.kind for r in decoded}
    assert kinds == {"image", "audio", "video"}
    for r in decoded:
        m = meta[r.media_id]
        if r.kind == "image":
            assert (r.width, r.height) == (m.width, m.height)
            assert 0 <= r.px_sum <= 255 * m.width * m.height
        elif r.kind == "audio":
            assert r.sample_rate == m.sample_rate
            assert r.n_samples == m.n_samples
        else:
            assert (r.width, r.height) == (
                m.width // VIDEO_DIM_DIV, m.height // VIDEO_DIM_DIV
            )
            assert r.n_frames == m.n_frames
            assert r.fps == 10 + r.media_id % 20


def test_avi_codec_roundtrip():
    import numpy as np

    from cruncher_spark.functions.codecs import (
        avi_decode,
        avi_encode,
        avi_index,
    )

    rng = np.random.RandomState(11)
    # odd width exercises the 4-byte DIB row padding
    frames = rng.randint(0, 256, (4, 10, 7), dtype=np.uint8)
    data = avi_encode(frames, fps=24)
    fps, back = avi_decode(data)
    assert fps == 24
    assert np.array_equal(back, frames)
    idx = avi_index(data)
    assert (idx["n_frames"], idx["height"], idx["width"]) == (4, 10, 7)
    assert len(idx["frames"]) == 4
    # the index addresses real frame bytes: sizes match the padded raster
    assert all(size == 8 * 10 for _off, size in idx["frames"])  # stride(7)=8


def test_frame_sample_real_reads_container_index(spark):
    from cruncher_spark.operators.multimodal import (
        attach_media,
        frame_sample_real,
    )
    from cruncher_spark.sources.tables import Star

    docs = Star(spark, "/root/testdata/sf0.001").documents.limit(60)
    media = attach_media(docs, real_payloads=True)
    n_frames = {
        r.media_id: r.n_frames
        for r in media.where("kind = 'video'").select(
            "media_id", "n_frames"
        ).collect()
    }
    sampled = frame_sample_real(media, every_n=2).collect()
    assert sampled
    by_media: dict[int, list] = {}
    for r in sampled:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rows in by_media.items():
        # every-2nd-frame positions, exactly
        assert sorted(r.frame_no for r in rows) == list(
            range(0, n_frames[mid], 2)
        )
        # decoded gradient frame: exact analytic pixel sum
        for r in rows:
            w, h, c = r.frame_w, r.frame_h, mid + 7 * r.frame_no
            want = sum(
                (c + x + y) % 256 for y in range(h) for x in range(w)
            )
            assert r.px_sum == want
