"""PerceptualDedupIngest: streaming image dedup vs a hash reference.

The reference replays the pinned retention rule directly on dHash
values (hamming <= 7 against retained history or a smaller-id batch
peer, min-id chains) — fully integer, so equality with the Spark
pipeline (which routes the hash's +-1 bit vector through the inherited
embedding machinery) is deterministic and proves the cosine/banding
change of representation is exact.
"""

from __future__ import annotations

import numpy as np
import pytest

from cruncher_spark.functions.codecs import png_encode
from cruncher_spark.operators.imagehash import MAX_HAMMING, dhash_bits

BITS = 56


def _img(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(32, 40)).astype(np.uint8)


def _near(base: np.ndarray, nbits: int) -> np.ndarray:
    """Flip sampled cells until the dHash moved by 1..nbits bits."""
    h0 = dhash_bits(base)
    out = base.copy()
    for t in range(20):
        cand = out.copy()
        iy = (t % 7) * 32 // 7
        ix = (t % 8) * 40 // 9
        cand[iy, ix] = 255 - cand[iy, ix]
        d = bin(dhash_bits(cand) ^ h0).count("1")
        if 0 < d <= nbits:
            return cand
        if d == 0:
            out = cand
    raise AssertionError("could not build a near image")


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _reference(batches):
    """{media_id: dhash} retained + {dup: (kept, via)} decisions."""
    retained: dict[int, int] = {}
    decisions: dict[int, tuple[int, str]] = {}
    for batch in batches:
        hashes = {i: dhash_bits(img) for i, img in batch}
        dropped = {}
        for i, h in sorted(hashes.items()):
            hist = [
                r
                for r, rh in retained.items()
                if r != i and _hamming(h, rh) <= MAX_HAMMING
            ]
            if hist:
                dropped[i] = (min(hist), "history")
                continue
            peers = [
                j
                for j, jh in hashes.items()
                if j < i and _hamming(h, jh) <= MAX_HAMMING
            ]
            if peers:
                dropped[i] = (min(peers), "batch")
        for i, h in hashes.items():
            if i not in dropped:
                retained[i] = h
        decisions.update(dropped)
    return retained, decisions


@pytest.fixture(scope="module")
def img_env(spark, tmp_path_factory):
    from cruncher_spark.streaming.neardup import PerceptualDedupIngest

    state = tmp_path_factory.mktemp("imgdedup")
    ingest = PerceptualDedupIngest(spark, str(state))

    base_a, base_b = _img(1), _img(2)
    batches = [
        [(10, base_a), (11, base_b), (12, _img(3))],
        # 20 = exact copy of A (history dup), 21 = near B, 22 = fresh,
        # 23 = near 22 (batch chain -> min id 22)
        [(20, base_a.copy()), (21, _near(base_b, MAX_HAMMING)),
         (22, _img(4)), (23, _near(_img(4), MAX_HAMMING))],
    ]
    for bid, batch in enumerate(batches):
        media = spark.createDataFrame(
            [(i, bytearray(png_encode(img))) for i, img in batch],
            "media_id long, payload binary",
        )
        ingest.process_image_batch(media, bid)
    return ingest, _reference(batches)


def test_retained_matches_reference(img_env):
    ingest, (ref_retained, _) = img_env
    got = {r["vec_id"] for r in ingest.retained().collect()}
    assert got == set(ref_retained)


def test_decisions_match_reference(img_env):
    ingest, (_, ref_decisions) = img_env
    got = {
        r["vec_id"]: (r["dup_of"], r["via"])
        for r in ingest.decisions().collect()
    }
    assert got == ref_decisions
    assert any(v == "history" for _, v in got.values())
    assert any(v == "batch" for _, v in got.values())


def test_replay_is_ledger_noop(img_env, spark):
    ingest, (ref_retained, ref_decisions) = img_env
    # replay batch 1 verbatim: ledger makes the survivor merge a no-op
    # and the scope-addressed index/decision writes are idempotent
    batch = [(20, _img(1)), (21, _near(_img(2), MAX_HAMMING))]
    media = spark.createDataFrame(
        [(i, bytearray(png_encode(img))) for i, img in batch],
        "media_id long, payload binary",
    )
    ingest.process_image_batch(media, 1)
    assert {r["vec_id"] for r in ingest.retained().collect()} == set(
        ref_retained
    )


def test_bit_vector_cosine_is_hamming(spark):
    # the change of representation: cosine over +-1 vectors at 0.74
    # accepts exactly hamming <= 7
    from cruncher_spark.streaming.neardup import PerceptualDedupIngest

    ing = PerceptualDedupIngest.__new__(PerceptualDedupIngest)
    for h, want in [(MAX_HAMMING, True), (MAX_HAMMING + 1, False)]:
        a = [1.0] * BITS
        b = [1.0] * BITS
        for j in range(h):
            b[j] = -1.0
        dot = sum(x * y for x, y in zip(a, b))
        cos = dot / BITS
        assert (cos >= 0.74) is want


def test_audio_ingest_hook(spark, tmp_path):
    # only the modality hook differs from the image filter (whose suite
    # pins the shared semantics); pin the hook: an exact-copy clip drops
    # against history, a distinct clip survives
    from cruncher_spark.functions.codecs import wav_encode
    from cruncher_spark.streaming.neardup import AudioDedupIngest

    rng = np.random.RandomState(21)
    a = rng.randint(-20000, 20000, size=600).astype(np.int16)
    b = rng.randint(-20000, 20000, size=800).astype(np.int16)
    ingest = AudioDedupIngest(spark, str(tmp_path / "audiostate"))
    m1 = spark.createDataFrame(
        [(1, bytearray(wav_encode(a, 8000))), (2, bytearray(wav_encode(b, 8000)))],
        "media_id long, payload binary",
    )
    ingest.process_image_batch(m1, 0)
    m2 = spark.createDataFrame(
        [(3, bytearray(wav_encode(a, 8000)))], "media_id long, payload binary"
    )
    ingest.process_image_batch(m2, 1)
    assert {r["vec_id"] for r in ingest.retained().collect()} == {1, 2}
    dec = {r["vec_id"]: (r["dup_of"], r["via"]) for r in ingest.decisions().collect()}
    assert dec == {3: (1, "history")}
