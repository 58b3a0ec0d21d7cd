"""dHash image dedup: hand-verifiable bits, grouping, Hamming recall."""

from __future__ import annotations

import numpy as np
import pytest

from cruncher_spark.functions.codecs import png_encode
from cruncher_spark.operators.imagehash import (
    GRID_H,
    GRID_W,
    MAX_HAMMING,
    dhash_bits,
    dhash_dedup_groups,
    dhash_images,
)


def test_dhash_bits_known_patterns():
    # strictly increasing rows: every difference bit set
    grad = np.tile(np.arange(16, dtype=np.uint8) * 10, (14, 1))
    assert dhash_bits(grad) == (1 << (GRID_W * GRID_H)) - 1
    # constant image: no difference bit set
    assert dhash_bits(np.full((14, 16), 7, dtype=np.uint8)) == 0
    # strictly decreasing rows: no bit set (strict > comparison)
    assert dhash_bits(grad[:, ::-1].copy()) == 0


def test_dhash_bits_single_row_flip():
    # brighten one sampled cell of one grid row; only that row's two
    # adjacent difference bits can change
    base = np.tile(np.arange(18, dtype=np.uint8) * 5, (14, 1))
    a = dhash_bits(base)
    mod = base.copy()
    iy = 3 * 14 // GRID_H  # grid row 3's sampled scanline
    mod[iy, :] = base[iy, ::-1]  # reverse that scanline only
    b = dhash_bits(mod)
    changed = a ^ b
    row_mask = ((1 << GRID_W) - 1) << (3 * GRID_W)
    assert changed != 0 and changed & ~row_mask == 0


def _media(spark, arrays):
    rows = [(i, bytearray(png_encode(a))) for i, a in enumerate(arrays)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_spark_hash_matches_local(spark):
    rng = np.random.RandomState(3)
    arrays = [
        rng.randint(0, 256, size=(20, 30)).astype(np.uint8) for _ in range(6)
    ]
    got = {
        r["media_id"]: r["dhash"]
        for r in dhash_images(_media(spark, arrays)).collect()
    }
    assert got == {i: dhash_bits(a) for i, a in enumerate(arrays)}


def test_groups_and_neighbors(spark):
    rng = np.random.RandomState(9)
    base = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
    twin = base.copy()  # identical -> same hash, same group
    h0 = dhash_bits(base)
    # build a true 1-bit Hamming neighbor by brightening one sampled cell
    near = base.copy()
    tries = 0
    while True:
        cand = near.copy()
        iy = 0
        ix = tries * 32 // (GRID_W + 1)
        cand[iy, ix] = 255 if cand[iy, ix] < 128 else 0
        if 0 < bin(dhash_bits(cand) ^ h0).count("1") <= MAX_HAMMING:
            near = cand
            break
        tries += 1
        assert tries <= GRID_W
    far = 255 - base  # inverted: far away in Hamming space
    out = dhash_dedup_groups(
        dhash_images(_media(spark, [base, twin, near, far]))
    ).collect()
    rows = {r["rep"]: r for r in out}
    assert rows[0]["n_members"] == 2  # base + twin collapsed
    assert rows[0]["n_neighbors"] >= 1  # near found via banding
    assert rows[2]["n_neighbors"] >= 1  # symmetric
    assert rows[3]["n_members"] == 1


def test_pigeonhole_recall_property(spark):
    # any pair within MAX_HAMMING must be counted — flip exactly
    # MAX_HAMMING random bit positions via direct hash manipulation
    import pandas as pd

    rng = np.random.RandomState(17)
    h = int(rng.randint(0, 2**56, dtype=np.int64))
    flips = rng.choice(GRID_W * GRID_H, size=MAX_HAMMING, replace=False)
    h2 = h
    for j in flips:
        h2 ^= 1 << int(j)
    hashes = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "dhash": [h, h2]})
    )
    out = {r["rep"]: r["n_neighbors"] for r in dhash_dedup_groups(hashes).collect()}
    assert out == {1: 1, 2: 1}


def test_audio_energy_bits_profiles():
    from cruncher_spark.operators.imagehash import audio_energy_bits

    # loud first half, quiet second half: first-half bits set
    loud = np.concatenate(
        [np.full(570, 1000, np.int16), np.full(570, 10, np.int16)]
    )
    h = audio_energy_bits(loud)
    assert h != 0
    assert all((h >> f) & 1 for f in range(25))  # early frames above mean
    assert not any((h >> f) & 1 for f in range(31, 56))  # late below
    # constant clip: no frame exceeds the mean strictly
    assert audio_energy_bits(np.full(570, 123, np.int16)) == 0


def test_audio_fingerprints_spark_matches_local(spark):
    from cruncher_spark.functions.codecs import wav_encode
    from cruncher_spark.operators.imagehash import (
        audio_energy_bits,
        audio_fingerprints,
    )

    rng = np.random.RandomState(5)
    clips = [
        rng.randint(-3000, 3000, size=n).astype(np.int16)
        for n in (57, 300, 1024)
    ]
    rows = [
        (i, bytearray(wav_encode(c, 8000))) for i, c in enumerate(clips)
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["dhash"] for r in audio_fingerprints(media).collect()
    }
    assert got == {i: audio_energy_bits(c) for i, c in enumerate(clips)}


def test_video_frame_hashes_and_overlap(spark):
    from cruncher_spark.functions.codecs import avi_encode
    from cruncher_spark.operators.imagehash import (
        video_frame_hashes,
        video_overlap_report,
    )

    rng = np.random.RandomState(11)
    shared = rng.randint(0, 256, size=(12, 16)).astype(np.uint8)
    a = np.stack([shared, rng.randint(0, 256, (12, 16)).astype(np.uint8)])
    b = np.stack([rng.randint(0, 256, (12, 16)).astype(np.uint8), shared])
    c = rng.randint(0, 256, size=(3, 12, 16)).astype(np.uint8)  # disjoint
    rows = [
        (i, bytearray(avi_encode(frames, 10)))
        for i, frames in enumerate([a, b, c])
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fh = video_frame_hashes(media)
    per = {
        (r["media_id"], r["frame_no"]): r["fhash"] for r in fh.collect()
    }
    assert per[(0, 0)] == dhash_bits(shared) == per[(1, 1)]
    out = {r["media_id"]: r for r in video_overlap_report(fh).collect()}
    assert out[0]["n_frames"] == 2 and out[2]["n_frames"] == 3
    assert out[0]["n_overlapping_videos"] >= 1  # shares `shared` with b
    assert out[1]["n_overlapping_videos"] >= 1


def test_video_overlap_df_cap(spark):
    import pandas as pd
    from cruncher_spark.operators.imagehash import video_overlap_report

    # hash 7 shared by 3 videos (> cap=2: boilerplate, capped out),
    # hash 9 shared by videos 1 and 2 only (a real re-encode signal)
    rows = [(1, 0, 7), (2, 0, 7), (3, 0, 7), (1, 1, 9), (2, 1, 9), (4, 0, 5)]
    fh = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "frame_no", "fhash"])
    )
    out = {
        r["media_id"]: r["n_overlapping_videos"]
        for r in video_overlap_report(fh, df_cap=2).collect()
    }
    assert out == {1: 1, 2: 1, 3: 0, 4: 0}


def test_cross_modal_match(spark):
    from cruncher_spark.functions.codecs import avi_encode, png_encode
    from cruncher_spark.operators.imagehash import (
        cross_modal_matches,
        dhash_images,
        video_frame_hashes,
    )

    rng = np.random.RandomState(33)
    still = rng.randint(0, 256, size=(24, 32)).astype(np.uint8)
    other = rng.randint(0, 256, size=(24, 32)).astype(np.uint8)
    video = np.stack([other, still])  # frame 1 reuses the still
    images = spark.createDataFrame(
        [(100, bytearray(png_encode(still))), (101, bytearray(png_encode(255 - still)))],
        "media_id long, payload binary",
    )
    videos = spark.createDataFrame(
        [(200, bytearray(avi_encode(video, 10)))], "media_id long, payload binary"
    )
    out = cross_modal_matches(
        dhash_images(images), video_frame_hashes(videos)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["dhash"] == dhash_bits(still)
    assert (r["img_rep"], r["vid_rep"], r["n_images"], r["n_videos"]) == (
        100, 200, 1, 1,
    )


def test_dhash_single_pixel_locality_property():
    # a single-pixel change can affect at most the two adjacent
    # difference comparisons that sample that pixel on its grid row —
    # so the hash moves by at most 2 bits (the locality that makes
    # dHash a PERCEPTUAL hash rather than a checksum)
    rng = np.random.RandomState(41)
    for _ in range(50):
        h_, w_ = rng.randint(8, 40), rng.randint(9, 60)
        img = rng.randint(0, 256, size=(h_, w_)).astype(np.uint8)
        a = dhash_bits(img)
        y, x = rng.randint(0, h_), rng.randint(0, w_)
        mod = img.copy()
        mod[y, x] = rng.randint(0, 256)
        assert bin(a ^ dhash_bits(mod)).count("1") <= 2


def test_audio_hash_negation_invariance_property():
    # energy is sign-invariant: negating every sample leaves all frame
    # energies — and therefore the fingerprint — unchanged
    from cruncher_spark.operators.imagehash import audio_energy_bits

    rng = np.random.RandomState(43)
    for n in (57, 130, 999):
        s = rng.randint(-30000, 30000, size=n).astype(np.int16)
        neg = (-s.astype(np.int32)).clip(-32768, 32767).astype(np.int16)
        # avoid the one asymmetric int16 value so negation is exact
        s[s == -32768] = -32767
        neg = (-s).astype(np.int16)
        assert audio_energy_bits(s) == audio_energy_bits(neg)
