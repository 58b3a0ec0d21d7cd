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


# ---------------------------------------------------------------------------
# exact phrase search
# ---------------------------------------------------------------------------


def test_phrase_counts_overlapping_occurrences(spark):
    from cruncher_spark.operators.retrieval import phrase_match_counts

    docs = _docs(spark, [(1, "a a a a"), (2, "a b a a"), (3, "b b b b")])
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_counts(docs, ["a", "a"]).collect()
    }
    assert got == {1: 3, 2: 1}  # overlapping starts each count; 3 absent


def test_phrase_is_word_boundary_exact(spark):
    from cruncher_spark.operators.retrieval import phrase_match_counts

    # 'low hash' must NOT match inside 'slow hash'
    docs = _docs(spark, [(1, "slow hash batch"), (2, "low hash batch")])
    got = [r["doc_id"] for r in phrase_match_counts(docs, ["low", "hash"]).collect()]
    assert got == [2]


def test_phrase_longer_than_doc_and_single_term(spark):
    from cruncher_spark.operators.retrieval import phrase_match_counts

    docs = _docs(spark, [(1, "x y"), (2, "x y z w")])
    # phrase longer than doc 1: doc 1 must be excluded before sequence()
    got = [r["doc_id"] for r in phrase_match_counts(docs, ["x", "y", "z"]).collect()]
    assert got == [2]
    # k=1 degenerates to term counting
    one = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_counts(docs, ["x"]).collect()
    }
    assert one == {1: 1, 2: 1}


def test_phrase_plan_has_no_shuffle(spark):
    from cruncher_spark.operators.retrieval import phrase_match_counts

    docs = _docs(spark, [(1, "a b c")])
    plan = phrase_match_counts(docs, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle narrow scan


def test_rrf_fuse_hand_case(spark):
    """RRF semantics pinned by hand: doc 1 ranks 1st+2nd -> 1/61+1/62;
    doc 2 only in list A (1/62); doc 3 only in list B (1/61); fusion
    favors multi-list presence, ties break by id."""
    from cruncher_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank int")
    got = {r.doc_id: (r.rrf, r.n_lists) for r in rrf_fuse([a, b]).collect()}
    assert got[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert got[2] == (round(1 / 62, 6), 1)
    assert got[3] == (round(1 / 61, 6), 1)
    order = [r.doc_id for r in rrf_fuse([a, b]).collect()]
    assert order == [1, 3, 2]  # fused score desc, 3 (1/61) beats 2 (1/62)


def test_rrf_fuse_topk_and_single_list(spark):
    from cruncher_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "doc_id long, rank int"
    )
    out = rrf_fuse([a], k=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert all(r.n_lists == 1 for r in out)
