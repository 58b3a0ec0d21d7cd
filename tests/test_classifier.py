"""Trained logistic-regression classifier: learning signal + the
decimal-sum determinism the oracle relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cruncher_spark.operators.classifier import (
    hashed_doc_features,
    score_logreg,
    train_logreg,
)


@pytest.fixture(scope="module")
def labeled_docs(spark):
    rows = []
    for i in range(100):
        rows.append((i, "crisp clear prose reads well and flows nicely", 1))
        rows.append(
            (100 + i, "zz qq buy now click spam spam free free offer", 0)
        )
    return spark.createDataFrame(rows, "doc_id long, text string, y long")


def test_training_separates_classes(labeled_docs):
    feats = hashed_doc_features(labeled_docs, dim=64)
    w = train_logreg(feats, labeled_docs.select("doc_id", "y"), dim=64, iters=5)
    scored = score_logreg(feats, w).join(
        labeled_docs.select("doc_id", "y"), "doc_id"
    )
    rows = scored.collect()
    pos = [r.score for r in rows if r.y == 1]
    neg = [r.score for r in rows if r.y == 0]
    assert min(pos) > max(neg)  # perfectly separable vocabularies
    acc = sum((r.score >= 0.5) == (r.y == 1) for r in rows) / len(rows)
    assert acc == 1.0


def test_training_is_partitioning_invariant(labeled_docs):
    labels = labeled_docs.select("doc_id", "y")

    def weights(df):
        f = hashed_doc_features(df, dim=64)
        return {
            r.bucket: r.w
            for r in train_logreg(f, labels, dim=64, iters=3).collect()
        }

    a = weights(labeled_docs.repartition(13))
    b = weights(labeled_docs.coalesce(1))
    assert a == b  # bit-exact: decimal sums are order-independent


def test_scores_are_probabilities(labeled_docs):
    feats = hashed_doc_features(labeled_docs, dim=64)
    w = train_logreg(feats, labeled_docs.select("doc_id", "y"), dim=64, iters=2)
    s = score_logreg(feats, w).agg(
        F.min("score").alias("lo"), F.max("score").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert 0.0 <= s.lo <= s.hi <= 1.0
    assert s.n == labeled_docs.count()


def test_lazy_form_equals_checkpointed(labeled_docs):
    labels = labeled_docs.select("doc_id", "y")
    feats = hashed_doc_features(labeled_docs, dim=64)
    eager = {
        r.bucket: r.w for r in train_logreg(feats, labels, dim=64, iters=3).collect()
    }
    lazy = {
        r.bucket: r.w
        for r in train_logreg(
            feats, labels, dim=64, iters=3, checkpoint=False
        ).collect()
    }
    assert eager == lazy
