"""BM25 retrieval: ranking semantics and physical-plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cruncher_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_higher_tf_first(spark):
    docs = _docs(
        spark,
        [
            (1, "cat dog cat cat filler filler filler filler"),
            (2, "cat filler filler filler filler filler filler filler"),
            (3, "filler filler filler filler filler filler filler filler"),
        ],
    )
    got = bm25_topk(docs, ["cat"], k=3).collect()
    assert [r["doc_id"] for r in got] == [1, 2]  # doc 3 never matches
    assert got[0]["score"] > got[1]["score"]


def test_bm25_rare_term_outweighs_common(spark):
    # "rare" appears in 1 of 4 docs, "common" in all — one hit of the rare
    # term must outscore one hit of the common term at equal doc length
    docs = _docs(
        spark,
        [
            (1, "rare common pad pad"),
            (2, "common pad pad pad"),
            (3, "common pad pad pad"),
            (4, "common pad pad pad"),
        ],
    )
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["rare"], k=4).collect()}
    got_common = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, ["common"], k=4).collect()
    }
    assert got[1] > got_common[2]


def test_bm25_topk_uses_take_ordered_not_global_sort(spark):
    docs = _docs(spark, [(i, "cat filler") for i in range(50)])
    plan = bm25_topk(docs, ["cat"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_length_normalization(spark):
    # same tf, shorter doc scores higher (b > 0)
    docs = _docs(
        spark,
        [
            (1, "cat pad"),
            (2, "cat pad pad pad pad pad pad pad pad pad pad pad"),
        ],
    )
    got = [r["doc_id"] for r in bm25_topk(docs, ["cat"], k=2).collect()]
    assert got == [1, 2]
