"""Perceptual media dedup: integer-exact fingerprints + banded Hamming join.

Two fingerprint families share one dedup tail
(:func:`dhash_dedup_groups`): image dHash and an audio energy-delta
fingerprint (:func:`audio_energy_bits` — per-frame energy, bit f set
iff frame f+1 is louder than frame f; the sign-of-delta skeleton of
Shazam-class audio fingerprinting, kept integer-exact the same way
dHash is). Video frame-level dedup composes the image path over
sampled frames.

The image half is the image-column counterpart of the text near-dup family
(`operators/dedup.py`): a 56-bit dHash per image — resample to an
(GRID_W+1) x GRID_H grid by nearest-neighbor integer indexing, bit j set
iff the right neighbor is brighter — then exact-duplicate grouping on
the hash and SimHash-style band-joined Hamming neighbors between
DISTINCT hashes. dHash is deliberately integer-exact end to end (pure
indexing and uint8 comparisons, no float DCT), so any engine — and the
DuckDB oracle, which re-derives the hash in plain SQL from the
fixtures' analytic pixel formula without touching the PNG codec —
reproduces it bit-for-bit. A float pHash would hang cross-engine
equality on last-bit DCT rounding; dHash has no such edge.

Scale shape (mirrors `dedup.py simhash_dup_pairs`):

- hashing is a zero-shuffle ``mapInPandas`` decode pass (the one
  unavoidable Python boundary — the codec);
- identical images collapse FIRST (hash group-by, map-side combined) so
  a million copies of one logo cost one row downstream;
- near-dup candidates come from an equi-join on ``N_BANDS`` hash chunks
  over the DISTINCT-hash table (pigeonhole: Hamming <= N_BANDS-1
  guarantees a shared chunk — banded recall is COMPLETE at the
  ``max_hamming`` this module fixes), verified by exact
  ``bit_count(xor)``; nothing all-pairs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: dHash grid: GRID_W difference bits per row x GRID_H rows = 56 bits —
#: bit 63 stays clear so the hash lives in a BIGINT without sign games
GRID_W = 8
GRID_H = 7

#: banding: 8 chunks x 7 bits; pigeonhole-complete through Hamming 7
N_BANDS = 8
BAND_BITS = 7
MAX_HAMMING = N_BANDS - 1

DHASH_SCHEMA = "media_id long, dhash long"


def dhash_bits(pixels) -> int:
    """56-bit dHash of an (H, W) uint8 array. Pure integer ops."""
    h, w = pixels.shape
    v = 0
    for gy in range(GRID_H):
        iy = gy * h // GRID_H
        row = pixels[iy]
        for gx in range(GRID_W):
            a = row[gx * w // (GRID_W + 1)]
            b = row[(gx + 1) * w // (GRID_W + 1)]
            if b > a:
                v |= 1 << (gy * GRID_W + gx)
    return v


#: target frame count for the audio fingerprint: frame width w =
#: max(1, n_samples // AUDIO_FRAMES) gives >= AUDIO_FRAMES frames (so a
#: full 56-bit hash) whenever the clip has at least that many samples
AUDIO_FRAMES = 57


def audio_energy_bits(samples) -> int:
    """56-bit audio fingerprint: bit f set iff frame f is louder than
    the clip mean (aHash-style, compared by exact integer
    cross-multiplication ``e[f] * n_frames > total_energy`` — no
    division, no floats).

    Frame energy is a sum of squared int16 samples, accumulated in
    Python ints so it cannot overflow at any clip length — exact, so
    any engine reproduces the hash bit-for-bit (the property the
    DuckDB oracle leans on). The energy-vs-MEAN comparison (not
    energy-vs-next-frame) keeps the bits informative on monotonically
    decaying clips, where every delta sign is identical. Trailing
    samples that do not fill a frame are dropped, mirroring the SQL's
    ``i < (n // w) * w`` guard.
    """
    import numpy as np

    n = int(samples.shape[0])
    w = max(1, n // AUDIO_FRAMES)
    nf = n // w
    s = samples[: nf * w].astype(np.int64)
    e = [int(x) for x in (s * s).reshape(nf, w).sum(axis=1)]
    total = sum(e)
    v = 0
    for f in range(min(nf, GRID_W * GRID_H)):
        if e[f] * nf > total:
            v |= 1 << f
    return v


def audio_fingerprints(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, dhash) via one Arrow-batched WAV decode+hash pass."""

    def hash_batches(batches):
        import pandas as pd

        from cruncher_spark.functions.codecs import wav_decode

        for pdf in batches:
            ids, hashes = [], []
            for r in pdf.itertuples(index=False):
                ids.append(int(getattr(r, id_col)))
                _, samples = wav_decode(bytes(getattr(r, payload_col)))
                hashes.append(audio_energy_bits(samples))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.select(id_col, payload_col).mapInPandas(
        hash_batches, DHASH_SCHEMA
    )


def dhash_images(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, dhash) via one Arrow-batched decode+hash pass."""

    def hash_batches(batches):
        import pandas as pd

        from cruncher_spark.functions.codecs import png_decode

        for pdf in batches:
            ids, hashes = [], []
            for r in pdf.itertuples(index=False):
                ids.append(int(getattr(r, id_col)))
                hashes.append(
                    dhash_bits(png_decode(bytes(getattr(r, payload_col))))
                )
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.select(id_col, payload_col).mapInPandas(
        hash_batches, DHASH_SCHEMA
    )


VIDEO_FRAME_SCHEMA = "media_id long, frame_no int, fhash long"


def video_frame_hashes(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, frame_no, fhash): dHash of EVERY decoded video frame.

    One Arrow-batched AVI decode pass; each frame is hashed with the
    same :func:`dhash_bits` grid as still images, so a video frame and
    a still image of the same content collide — which is exactly what
    cross-modal reuse detection wants.
    """

    def hash_batches(batches):
        import pandas as pd

        from cruncher_spark.functions.codecs import avi_decode

        for pdf in batches:
            ids, fnos, hashes = [], [], []
            for r in pdf.itertuples(index=False):
                _, frames = avi_decode(bytes(getattr(r, payload_col)))
                for fno, frame in enumerate(frames):
                    ids.append(int(getattr(r, id_col)))
                    fnos.append(fno)
                    hashes.append(dhash_bits(frame))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": fnos, "fhash": hashes}
            )

    return media.select(id_col, payload_col).mapInPandas(
        hash_batches, VIDEO_FRAME_SCHEMA
    )


def video_overlap_report(
    frame_hashes: DataFrame, df_cap: int = 1000
) -> DataFrame:
    """Per video: frame counts + how many OTHER videos share a frame.

    Shared-frame detection is an equi-join on the distinct
    (video, frame-hash) table — the containment skeleton of video
    dedup (two videos sharing any exact frame hash are re-encodes,
    clips, or concatenations of common footage). Output: (media_id,
    n_frames, n_distinct_hashes, n_overlapping_videos).

    The join expands each hash group to its pair set, so a frame hash
    shared by h videos costs h² — for a viral intro/logo frame shared
    by a million videos that is a 10^12-pair scale-killer. Hashes
    shared by MORE than ``df_cap`` videos are therefore excluded from
    the overlap count (the posting-list df-cap of
    `operators/dedup.py fingerprint_span_pairs`): footage that common
    is boilerplate, not a re-encode signal, exactly like a stopword in
    text retrieval. The per-hash group-size aggregate that enforces
    the cap is itself map-side combined and hash-keyed — bounded.
    """
    nf = frame_hashes.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    vf = frame_hashes.select("media_id", "fhash").distinct()
    nd = vf.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_distinct_hashes")
    )
    hot = (
        vf.groupBy("fhash")
        .agg(F.count(F.lit(1)).alias("nv"))
        .where(F.col("nv") > df_cap)
        .select("fhash")
    )
    # no broadcast hint: hot is bounded by |vf|/df_cap but that can
    # still be big at 100 TB — AQE picks broadcast when it fits
    joinable = vf.join(hot, "fhash", "left_anti")
    other = joinable.select(
        F.col("media_id").alias("other_id"), F.col("fhash")
    )
    ov = (
        joinable.join(other, "fhash")
        .where(F.col("media_id") != F.col("other_id"))
        .groupBy("media_id")
        .agg(F.countDistinct("other_id").alias("n_overlapping_videos"))
    )
    return (
        nf.join(nd, "media_id")
        .join(ov, "media_id", "left")
        .select(
            "media_id",
            "n_frames",
            "n_distinct_hashes",
            F.coalesce("n_overlapping_videos", F.lit(0)).alias(
                "n_overlapping_videos"
            ),
        )
    )


def cross_modal_matches(
    image_hashes: DataFrame, frame_hashes: DataFrame
) -> DataFrame:
    """Stills that appear as video frames: the cross-modal reuse join.

    Both modalities hash with the same dHash grid, so a still image and
    a video frame of the same content produce the same 56-bit value —
    detection is then a GROUP-LEVEL equi-join: each side collapses to
    its distinct-hash table first (hash-keyed counts + min-id
    representative, map-side combined), and the join output is one row
    per SHARED hash value. No pair expansion ever happens — a hash
    shared by a million images and a million videos still costs two
    aggregate rows and one joined row — so unlike
    :func:`video_overlap_report` this needs no df-cap.

    Output: (dhash, n_images, img_rep, n_videos, vid_rep).
    """
    ig = image_hashes.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("media_id").alias("img_rep"),
    )
    vg = (
        frame_hashes.select(
            F.col("media_id").alias("video_id"), F.col("fhash").alias("dhash")
        )
        .distinct()
        .groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.min("video_id").alias("vid_rep"),
        )
    )
    return ig.join(vg, "dhash").select(
        "dhash", "n_images", "img_rep", "n_videos", "vid_rep"
    )


def _chunks(col: Column) -> Column:
    mask = (1 << BAND_BITS) - 1
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(col, b * BAND_BITS)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for b in range(N_BANDS)
        ]
    )


def dhash_dedup_groups(hashes: DataFrame) -> DataFrame:
    """Exact-dup groups + banded near-dup neighbor counts.

    Output one row per DISTINCT hash: (rep, n_members, n_neighbors,
    dhash) — ``rep`` the smallest member id, ``n_neighbors`` the number
    of other distinct hashes within Hamming ``MAX_HAMMING`` (complete
    by pigeonhole over the band join).
    """
    g = hashes.groupBy("dhash").agg(
        F.min("media_id").alias("rep"), F.count(F.lit(1)).alias("n_members")
    )
    banded = g.select("dhash", F.explode(_chunks(F.col("dhash"))).alias("c")).select(
        "dhash",
        F.col("c.band_idx").alias("band_idx"),
        F.col("c.chunk").alias("chunk"),
    )
    a = banded.select(F.col("dhash").alias("ha"), "band_idx", "chunk")
    b = banded.select(F.col("dhash").alias("hb"), "band_idx", "chunk")
    # hamming filter BEFORE the multi-band pair dedup: far pairs (the
    # bulk of candidate volume) never reach the distinct shuffle — the
    # ordering simhash_dup_pairs pins for the same reason
    near = (
        a.join(b, ["band_idx", "chunk"])
        .where(F.col("ha") != F.col("hb"))
        .where(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= MAX_HAMMING
        )
        .groupBy("ha", "hb")
        .agg(F.first(F.lit(1)))
        .groupBy("ha")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    return g.join(near, g.dhash == near.ha, "left").select(
        "rep",
        "n_members",
        F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
        "dhash",
    )
