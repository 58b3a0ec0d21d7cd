"""Tests for the training-data assembly operators: source-mixture
sampling (determinism, mixture shape, map-side-only plan) and sequence
packing (per-shard range contiguity, window math)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, n=2000, sources=("a", "b", "c")):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in sources]),
            (F.col("id") % len(sources) + 1).cast("int"),
        ).alias("source"),
    )


def test_mixture_sample_deterministic_and_shaped(spark):
    from cruncher_spark.operators.curation import mixture_sample

    docs = _docs(spark)
    w = F.when(F.col("source") == "a", F.lit(8)).otherwise(F.lit(1))
    out = mixture_sample(docs, w, budget=600, id_col="doc_id")
    ids1 = {r.doc_id for r in out.collect()}
    # determinism across physical partitioning: same rows after a reshuffle
    out2 = mixture_sample(docs.repartition(13), w, budget=600, id_col="doc_id")
    assert {r.doc_id for r in out2.collect()} == ids1

    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # target shares: a=8/10*600=480 of 667 source-a rows; b=c=60 each.
    # hash acceptance is binomial around the floored rate — allow 20%.
    assert abs(by_src["a"] - 480) < 480 * 0.2
    assert abs(by_src["b"] - 60) < 60 * 0.5
    assert abs(by_src["c"] - 60) < 60 * 0.5


def test_mixture_sample_rate_cap(spark):
    """A source whose target exceeds its size is fully kept (rate capped
    at basis), never oversampled."""
    from cruncher_spark.operators.curation import mixture_sample

    docs = _docs(spark, n=100, sources=("rare", "big"))  # 50 rows each
    w = F.when(F.col("source") == "rare", F.lit(100)).otherwise(F.lit(1))
    out = mixture_sample(docs, w, budget=1000, id_col="doc_id")
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["rare"] == 50  # capped: every rare row kept exactly once


def test_sequence_pack_ranges_are_contiguous(spark):
    from cruncher_spark.operators.curation import sequence_pack

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 1).alias("tok"),
    )
    out = sequence_pack(
        docs, pack_tokens=64, n_shards=4, token_count_col=F.col("tok")
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(out) == 500 and len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rows:
            # token stream is gapless: each doc starts where the previous
            # one ended, and the pack window math is plain integer division
            assert r.start_tok == pos and r.end_tok == pos + r.n_tokens
            assert r.first_pack == r.start_tok // 64
            assert r.last_pack == (r.end_tok - 1) // 64
            pos = r.end_tok
