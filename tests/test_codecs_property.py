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
