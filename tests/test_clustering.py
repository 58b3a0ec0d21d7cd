"""Distributed k-means: recovers planted blobs, partitioning-invariant.

The registry gate (`kmeans_clusters`) pins cross-engine bit-exactness
against the unrolled DuckDB oracle; these tests pin the semantics the
oracle can't see: cluster recovery on separable data, determinism under
arbitrary input partitioning, and the empty-cluster keep-old rule.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cruncher_spark.operators.clustering import kmeans_assign


def _blob_df(spark, centers, n_per, spread=0.05, dim=8, seed=7):
    rng = random.Random(seed)
    rows = []
    vid = 0
    for b, center in enumerate(centers):
        for _ in range(n_per):
            vec = [
                round(center[d % len(center)] + rng.uniform(-spread, spread), 6)
                for d in range(dim)
            ]
            rows.append((vid, b, vec))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<float>"
    )


def test_recovers_separated_blobs(spark):
    # three tight blobs far apart; k-means with k=3 must put each blob in
    # exactly one cluster (whatever the cluster labels end up being)
    df = _blob_df(spark, centers=[(0.0,), (5.0,), (-5.0,)], n_per=20)
    out = kmeans_assign(df, "vec_id", "embedding", k=3, iters=3)
    got = {
        r["blob"]: r["clusters"]
        for r in df.join(out, df.vec_id == out.vec_id)
        .groupBy("blob")
        .agg(F.collect_set("cluster").alias("clusters"))
        .collect()
    }
    assert all(len(cs) == 1 for cs in got.values())
    assert len({cs[0] for cs in got.values()}) == 3


def test_partitioning_invariance(spark):
    df = _blob_df(spark, centers=[(0.0,), (3.0,)], n_per=25)
    a = kmeans_assign(df.coalesce(1), "vec_id", "embedding", k=2, iters=2)
    b = kmeans_assign(
        df.repartition(16, "vec_id"), "vec_id", "embedding", k=2, iters=2
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_cluster_keeps_centroid(spark):
    # two coincident seed vectors: the higher-id seed's cluster goes empty
    # on round 1 (ties assign to the smaller cluster id) and must keep its
    # original centroid rather than NaN/NULL out
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.1, 0.1]), (3, [0.2, 0.2])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, "vec_id", "embedding", k=2, iters=2).collect()
    assert len(out) == 4
    assert all(r["d2r"] is not None for r in out)
    # cluster 1's centroid stayed at the coincident seed point, so vec 1
    # still ties between cluster 0's moved mean and cluster 1's unmoved
    # seed — the important bit is nothing nulled and ids stayed stable
    assert {r["vec_id"] for r in out} == {0, 1, 2, 3}


@pytest.mark.parametrize("k", [1, 4])
def test_k_bounds(spark, k):
    df = _blob_df(spark, centers=[(0.0,), (2.0,)], n_per=10)
    out = kmeans_assign(df, "vec_id", "embedding", k=k, iters=1)
    clusters = {r["cluster"] for r in out.collect()}
    assert clusters <= set(range(k))
