"""Property-based round-trip tests for the pure-stdlib media codecs.

Hypothesis generates adversarial shapes (1-pixel images, odd widths that
exercise DIB/PNG padding, single-sample audio, single-frame video) that
hand-picked fixtures miss. Every encoder must round-trip bit-exactly
through its decoder — the property the oracle gates rely on when they
predict decoded stats analytically.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cruncher_spark.functions.codecs import (
    avi_decode,
    avi_encode,
    avi_index,
    png_decode,
    png_encode,
    resize_nearest,
    wav_decode,
    wav_encode,
)


def _pixels(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip(h, w, seed):
    px = _pixels(h, w, seed)
    assert np.array_equal(png_decode(png_encode(px)), px)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip(n, rate, seed):
    samples = (
        np.random.RandomState(seed)
        .randint(-32768, 32768, n)
        .astype(np.int16)
    )
    rate2, back = wav_decode(wav_encode(samples, rate))
    assert rate2 == rate
    assert np.array_equal(back, samples)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 8),
    h=st.integers(1, 32),
    w=st.integers(1, 33),  # odd widths exercise 4-byte DIB row padding
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_and_index(n, h, w, fps, seed):
    frames = np.random.RandomState(seed).randint(
        0, 256, (n, h, w), dtype=np.uint8
    )
    data = avi_encode(frames, fps)
    fps2, back = avi_decode(data)
    assert fps2 == fps
    assert np.array_equal(back, frames)
    idx = avi_index(data)
    assert (idx["n_frames"], idx["height"], idx["width"]) == (n, h, w)
    assert len(idx["frames"]) == n
    # index entries address non-overlapping in-bounds byte ranges
    spans = sorted(idx["frames"])
    for (o1, s1), (o2, _s2) in zip(spans, spans[1:]):
        assert o1 + s1 <= o2
    assert spans[-1][0] + spans[-1][1] <= len(data)


def test_avi_index_absolute_offsets_and_00dc():
    """Foreign AVIs write idx1 offsets as absolute file positions and may
    tag raw DIB frames '00dc'; avi_index must handle both conventions."""
    import struct

    frames = np.arange(2 * 6 * 5, dtype=np.uint8).reshape(2, 6, 5)
    data = bytearray(avi_encode(frames, fps=12))
    # locate idx1 and the movi fourcc
    idx_pos = bytes(data).rindex(b"idx1")
    movi_pos = bytes(data).index(b"LIST", 12)
    while bytes(data)[movi_pos + 8 : movi_pos + 12] != b"movi":
        movi_pos = bytes(data).index(b"LIST", movi_pos + 1)
    movi_fourcc = movi_pos + 8
    (n_entries,) = (struct.unpack("<I", data[idx_pos + 4 : idx_pos + 8])[0] // 16,)
    for e in range(n_entries):
        at = idx_pos + 8 + 16 * e
        ckid, flags, off, size = struct.unpack("<4sIII", data[at : at + 16])
        # rewrite: movi-relative → absolute, fourcc 00db → 00dc (both in
        # idx1 AND the movi chunk headers, as a real muxer would tag them)
        data[at : at + 16] = struct.pack(
            "<4sIII", b"00dc", flags, movi_fourcc + off, size
        )
        chunk_at = movi_fourcc + off
        assert bytes(data[chunk_at : chunk_at + 4]) == b"00db"
        data[chunk_at : chunk_at + 4] = b"00dc"
    fps, back = avi_decode(bytes(data))
    assert fps == 12
    assert np.array_equal(back, frames)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    nh=st.integers(1, 40),
    nw=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_nearest_properties(h, w, nh, nw, seed):
    px = _pixels(h, w, seed)
    out = resize_nearest(px, nw, nh)
    assert out.shape == (nh, nw)
    # nearest-neighbor introduces no new values
    assert set(np.unique(out)) <= set(np.unique(px))
    # identity resize is exact
    assert np.array_equal(resize_nearest(px, w, h), px)


# -- baseline JPEG + Motion-JPEG AVI ------------------------------------------


def test_jpeg_dct_is_orthonormal():
    from cruncher_spark.functions.jpeg import _C

    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_jpeg_zigzag_is_the_standard_scan():
    from cruncher_spark.functions.jpeg import _ZIGZAG

    assert _ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    base=st.integers(0, 55),
)
def test_jpeg_roundtrip_smooth_content_within_tolerance(h, w, base):
    """Band-limited (gradient) content round-trips within quantization
    error at high quality; arbitrary dims exercise edge-replication
    padding."""
    from cruncher_spark.functions.jpeg import jpeg_decode, jpeg_encode

    span = max(1, (h - 1) + (w - 1))
    y, x = np.mgrid[0:h, 0:w]
    img = (base + (x + y) * 200 // span).astype(np.uint8)
    data = jpeg_encode(img, quality=95)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = jpeg_decode(data)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_jpeg_roundtrip_noise_bounded(seed):
    """Worst-case (white noise) content still decodes with error bounded
    by the quantization table, proving the entropy coding itself is
    lossless — all loss comes from quantization."""
    from cruncher_spark.functions.jpeg import jpeg_decode, jpeg_encode

    px = _pixels(32, 32, seed)
    out = jpeg_decode(jpeg_encode(px, quality=95))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 16


def test_jpeg_rejects_non_jpeg():
    import pytest

    from cruncher_spark.functions.jpeg import jpeg_decode

    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG not a jpeg")


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 6),
    h=st.integers(8, 32),
    w=st.integers(8, 32),
    fps=st.integers(1, 60),
)
def test_mjpeg_avi_roundtrip_and_seek(n, h, w, fps):
    from cruncher_spark.functions.codecs import (
        avi_decode,
        avi_encode_mjpeg,
        avi_index,
    )
    from cruncher_spark.functions.jpeg import jpeg_decode

    span = max(1, (h - 1) + (w - 1) + (n - 1))
    f, y, x = np.mgrid[0:n, 0:h, 0:w]
    frames = ((x + y + f) * 200 // span).astype(np.uint8)
    data = avi_encode_mjpeg(frames, fps, quality=95)
    idx = avi_index(data)
    assert idx["codec"] == "MJPG" and idx["n_frames"] == n
    assert idx["fps"] == fps
    got_fps, out = avi_decode(data)
    assert got_fps == fps and out.shape == frames.shape
    assert np.abs(out.astype(int) - frames.astype(int)).max() <= 3
    # index-seek: one frame's byte range decodes standalone
    off, size = idx["frames"][n - 1]
    one = jpeg_decode(data[off : off + size])
    assert np.abs(one.astype(int) - frames[n - 1].astype(int)).max() <= 3
