"""EmbeddingDedupIngest vs a sequential reference replay.

The python reference mirrors the Spark fold arithmetic EXACTLY (same
left-to-right double fold over float32 inputs for projections and
cosine), so band keys and verification decisions are bit-identical and
the equality assertion is deterministic — no threshold luck.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

DIM = 64
N_BANDS = 4
BAND_PLANES = 8
MIN_COS = 0.98


def _vec(seed: int) -> list[float]:
    rng = np.random.default_rng(seed)
    return [float(np.float32(x)) for x in rng.normal(size=DIM)]


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cos(a: list[float], b: list[float]) -> float:
    return _fold_dot(a, b) / (
        math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
    )


def _band_keys(v: list[float]) -> list[tuple[int, int]]:
    from cruncher_spark.operators.similarity import _hyperplane_signs

    planes = _hyperplane_signs(DIM, N_BANDS * BAND_PLANES)
    out = []
    for band in range(N_BANDS):
        key = 0
        for p in range(BAND_PLANES):
            signs = planes[band * BAND_PLANES + p]
            if _fold_dot(v, [float(s) for s in signs]) > 0:
                key += 1 << p
        out.append((band, key))
    return out


def _matches(a: list[float], b: list[float]) -> bool:
    return bool(set(_band_keys(a)) & set(_band_keys(b))) and _cos(a, b) >= MIN_COS


def _reference(batches):
    retained: dict[int, list[float]] = {}
    decisions: dict[int, tuple[int, str]] = {}
    for batch in batches:
        in_batch = dict(batch)
        kept_now = []
        for i, v in in_batch.items():
            hist = sorted(r for r, rv in retained.items() if _matches(v, rv))
            peers = sorted(
                p for p, pv in in_batch.items() if p < i and _matches(v, pv)
            )
            if hist:
                decisions[i] = (hist[0], "history")
            elif peers:
                decisions[i] = (peers[0], "batch")
            else:
                kept_now.append(i)
        retained.update({i: in_batch[i] for i in kept_now})
    return retained, decisions


@pytest.fixture(scope="module")
def emb_env(spark, tmp_path_factory):
    from cruncher_spark.streaming.neardup import EmbeddingDedupIngest

    base = {i: _vec(i) for i in range(8)}
    scaled = [x * 2.5 for x in base[1]]  # same direction, cosine ~1.0
    b0 = [(0, base[0]), (1, base[1]), (2, base[2]), (3, base[3])]
    b1 = [
        (10, base[0]),   # exact dup of retained 0
        (11, scaled),    # direction-dup of retained 1
        (12, base[4]),
        (13, base[4]),   # in-batch dup -> collapses to 12
        (14, base[5]),
    ]
    b2 = [
        (20, base[4]),   # dup of retained 12
        (21, base[6]),
    ]
    batches = [b0, b1, b2]

    root = tmp_path_factory.mktemp("embdedup")
    nd = EmbeddingDedupIngest(spark, str(root / "state"))
    for k, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
        )
        nd.process_batch(df, k)

    ref_retained, ref_decisions = _reference(batches)
    return nd, batches, ref_retained, ref_decisions


def test_retained_matches_reference(emb_env):
    nd, _, ref_retained, _ = emb_env
    got = {r.vec_id for r in nd.retained().collect()}
    assert got == set(ref_retained)
    assert {0, 1, 2, 3, 12, 14, 21} <= got
    assert not {10, 11, 13, 20} & got


def test_decisions_match_reference(emb_env):
    nd, _, _, ref_decisions = emb_env
    got = {r.vec_id: (r.dup_of, r.via) for r in nd.decisions().collect()}
    assert got == ref_decisions
    assert got[10] == (0, "history")
    assert got[11] == (1, "history")
    assert got[13] == (12, "batch")
    assert got[20] == (12, "history")


def test_replay_is_ledger_noop_and_compaction_safe(emb_env, spark):
    nd, batches, ref_retained, _ = emb_env
    before = sorted(r.vec_id for r in nd.retained().collect())
    df = spark.createDataFrame(
        [(i, v) for i, v in batches[1]], "vec_id long, embedding array<float>"
    )
    nd.process_batch(df, 1)  # replay → ledger no-op
    assert sorted(r.vec_id for r in nd.retained().collect()) == before

    assert nd.compact_index() >= 2
    # post-compaction batch still sees full history
    nd.process_batch(
        spark.createDataFrame(
            [(30, _vec(2)), (31, _vec(7))], "vec_id long, embedding array<float>"
        ),
        50,
    )
    got = {r.vec_id for r in nd.retained().collect()}
    assert 31 in got and 30 not in got  # 30 duplicates retained 2
