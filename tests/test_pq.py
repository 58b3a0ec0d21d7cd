"""Product quantization: fit determinism, encode correctness vs numpy,
compressed-domain retrieval quality on separable clusters."""

from __future__ import annotations

import numpy as np
import pytest

from cruncher_spark.operators.similarity import fit_pq_codebooks, pq_topk

DIM, N_SUB, KW = 16, 4, 4
W = DIM // N_SUB


def _cluster_vectors(n_per=6):
    """4 well-separated cluster centers, members = center + tiny fixed
    offsets — PQ must keep cluster members nearer than foreign vectors."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, DIM)) * 5
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(n_per):
            off = rng.normal(size=DIM) * 0.05
            rows.append((vid, [float(x) for x in c + off], ci))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def sample():
    return [(vid, v) for vid, v, _ in _cluster_vectors()]


def test_fit_is_deterministic(sample):
    a = fit_pq_codebooks(sample, N_SUB, KW)
    b = fit_pq_codebooks(sample, N_SUB, KW)
    assert a == b
    assert len(a) == N_SUB and len(a[0]) == KW and len(a[0][0]) == W


def test_fit_rejects_bad_shapes(sample):
    with pytest.raises(ValueError):
        fit_pq_codebooks(sample, 5, KW)  # 16 not divisible by 5
    with pytest.raises(ValueError):
        fit_pq_codebooks(sample[:2], N_SUB, KW)  # sample smaller than k


def test_pq_topk_recovers_cluster_structure(spark):
    rows = _cluster_vectors()
    books = fit_pq_codebooks([(vid, v) for vid, v, _ in rows], N_SUB, KW)
    df = spark.createDataFrame(
        [(vid, v) for vid, v, _ in rows], "vec_id long, embedding array<double>"
    )
    queries = df.filter((df.vec_id % 6) == 0)  # first member of each cluster
    got = pq_topk(df, queries, books, k=3).collect()
    cluster = {vid: ci for vid, _, ci in rows}
    same = sum(1 for r in got if cluster[r["query_id"]] == cluster[r["neighbor_id"]])
    # separable clusters: compressed-domain ranking keeps neighbors in-cluster
    assert same == len(got) and len(got) == 4 * 3


def test_scores_bounded_like_cosine(spark):
    rows = _cluster_vectors()
    books = fit_pq_codebooks([(vid, v) for vid, v, _ in rows], N_SUB, KW)
    df = spark.createDataFrame(
        [(vid, v) for vid, v, _ in rows], "vec_id long, embedding array<double>"
    )
    got = pq_topk(df, df.limit(4), books, k=5).collect()
    # quantization error can push the cosine estimate slightly past 1
    assert all(-1.1 <= r["score"] <= 1.1 for r in got)
