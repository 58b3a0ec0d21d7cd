"""Schema-evolution-tolerant loading: old- and new-schema parquet files in
one table directory read as one logical schema (mergeSchema), with
optional constant backfill for added columns."""

from __future__ import annotations

import pyspark.sql.functions as F

from cruncher_spark.sources.tables import load_evolving


def test_merge_schema_unions_generations(spark, tmp_path):
    d = tmp_path / "tbl"
    v1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, amount double")
    v2 = spark.createDataFrame(
        [(3, 30.0, "eu"), (4, 40.0, "us")], "id long, amount double, region string"
    )
    v1.coalesce(1).write.parquet(str(d / "gen=1"))
    v2.coalesce(1).write.parquet(str(d / "gen=2"))

    df = load_evolving(spark, f"{d}/gen=*")
    assert set(df.columns) == {"id", "amount", "region"}
    rows = {r.id: (r.amount, r.region) for r in df.collect()}
    # old-generation rows surface the added column as NULL
    assert rows[1] == (10.0, None) and rows[3] == (30.0, "eu")


def test_defaults_backfill_added_column(spark, tmp_path):
    d = tmp_path / "tbl2"
    spark.createDataFrame([(1, 1.0)], "id long, amount double").write.parquet(
        str(d / "a")
    )
    spark.createDataFrame(
        [(2, 2.0, 5)], "id long, amount double, retries int"
    ).write.parquet(str(d / "b"))

    df = load_evolving(spark, f"{d}/*", defaults={"retries": 0})
    got = {r.id: r.retries for r in df.collect()}
    assert got == {1: 0, 2: 5}
    # aggregates need no null-handling after backfill
    assert df.agg(F.sum("retries")).first()[0] == 5


def test_pruning_survives_schema_merge(spark, tmp_path):
    """Column pruning + predicate pushdown still reach the merged scan —
    the files written before the column existed read as nulls without
    breaking the pushed filter on a common column."""
    d = tmp_path / "tbl3"
    spark.createDataFrame([(1, 1.0)], "id long, amount double").write.parquet(
        str(d / "a")
    )
    spark.createDataFrame(
        [(2, 2.0, "x")], "id long, amount double, tag string"
    ).write.parquet(str(d / "b"))

    df = load_evolving(spark, f"{d}/*").where(F.col("id") > 1).select("id", "tag")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan
    assert [(r.id, r.tag) for r in df.collect()] == [(2, "x")]
