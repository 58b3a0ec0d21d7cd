"""Bloom-filter semi-join: result exactness, pruning power, edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from cruncher_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def test_bloom_semi_join_equals_plain_semi_join(spark):
    fact = spark.range(0, 20000).select(
        (F.col("id") % 4096).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.range(0, 4096, 7).select(F.col("id").alias("k"))  # ~585 keys
    got = bloom_semi_join(fact, keys, "k").orderBy("payload").collect()
    want = (
        fact.join(keys.distinct(), "k", "left_semi").orderBy("payload").collect()
    )
    assert got == want
    assert len(got) > 0


def test_bloom_probe_has_no_false_negatives_and_prunes(spark):
    keys = spark.range(0, 1000).select((F.col("id") * 13).alias("k"))
    bitmap = bloom_build(keys, "k")
    probe = spark.range(0, 13000).select(F.col("id").alias("k"))
    hits = probe.filter(bloom_might_contain(F.col("k"), bitmap))
    n_hits = hits.count()
    n_true = probe.join(keys.distinct(), "k", "left_semi").count()
    # every inserted key must pass (no false negatives)
    assert hits.join(keys.distinct(), "k", "left_semi").count() == n_true
    # pruning is the operator's whole point: false positives bounded well
    # below the non-member population (64Ki bits / 5 hashes at 1k keys
    # gives fpp << 1%; allow generous slack for hash clustering)
    assert n_hits - n_true < 0.05 * (13000 - n_true)


def test_bloom_null_keys_never_match(spark):
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k")
    probe = spark.sql("SELECT CAST(NULL AS LONG) AS k UNION ALL SELECT 5L")
    got = probe.filter(bloom_might_contain(F.col("k"), bitmap)).collect()
    assert [r["k"] for r in got] == [5]
