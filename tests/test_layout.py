"""Physical-layout tests: these assert on the PLAN, not just results —
partition pruning must show up as PartitionFilters with a pruned file
count, and bucketed joins must run with zero Exchange nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cruncher_spark.sources import (
    read_date_range,
    write_bucketed,
    write_date_partitioned,
)
from cruncher_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.collect()  # run THIS plan so AQE's final form is inspected
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("layout") / "events_by_date")
    events = load_table(spark, SF_DIR, "events")
    write_date_partitioned(events, out, "ts")
    return out


def test_date_partition_prunes_files(spark, part_dir):
    full = spark.read.parquet(part_dir)
    n_dates = full.select("p_date").distinct().count()
    assert n_dates > 3  # fixture must actually span dates

    row = full.select(F.min("p_date"), F.max("p_date")).collect()[0]
    lo, hi = str(row[0]), str(row[1])
    narrow = read_date_range(spark, part_dir, lo, lo)  # single-day window
    plan = _executed_plan(narrow)
    assert "PartitionFilters: [" in plan and "p_date" in plan

    # the one-day scan must read strictly fewer partitions than exist
    scanned = {str(r[0]) for r in narrow.select("p_date").distinct().collect()}
    assert scanned == {lo}
    # row-level check: pruned read ≡ post-hoc filter of the full table
    assert (
        narrow.count()
        == full.where(F.col("p_date") == F.lit(lo)).count()
        > 0
    )
    assert hi not in scanned


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")

    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(wh / "li"))
    write_bucketed(orders, "ord_b", "l_orderkey", 8, path=str(wh / "ord"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")

    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: neither side shuffles
    assert "SelectedBucketsCount" in plan

    # and the result is the plain join's result
    expected = li.join(orders, "l_orderkey").count()
    n = spark.read.parquet(str(wh / "li")).join(
        spark.read.parquet(str(wh / "ord")), "l_orderkey"
    ).count()
    assert n == expected


def test_bucketed_groupby_has_no_shuffle(spark, tmp_path_factory):
    """Aggregation on the bucket key also skips its shuffle — the layout
    pays off for recurring rollups, not only joins."""
    wh = tmp_path_factory.mktemp("bucketed_agg")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "li_agg_b", "l_orderkey", 8, path=str(wh / "li"))
    try:
        agg = (
            spark.table("li_agg_b")
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _executed_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_agg_b")
    assert "Exchange" not in plan
    assert agg.count() == li.select("l_orderkey").distinct().count()


def _file_ranges(path, cols):
    """Per-parquet-file (min, max) footer stats for each column."""
    import pyarrow.parquet as pq
    from pathlib import Path

    out = []
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_layout_narrows_both_dims(spark, tmp_path_factory):
    """Z-order interleave gives locally-narrow min/max footer ranges on
    EVERY interleaved column, where a single-column sort narrows only its
    own column — the property parquet min/max skipping prunes on."""
    from cruncher_spark.sources.layout import write_zordered

    wh = tmp_path_factory.mktemp("zorder")
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    write_zordered(grid, str(wh / "z"), ["x", "y"], bits=6, n_files=16)

    def avg_width(path, col):
        rs = _file_ranges(path, ["x", "y"])
        return sum((r[col][1] - r[col][0]) / 63.0 for r in rs) / len(rs)

    # 16 z-range files over a 64x64 grid => each file covers ~1/16 of the
    # area, so ~1/4 of each side
    assert avg_width(str(wh / "z"), "x") < 0.6
    assert avg_width(str(wh / "z"), "y") < 0.6

    # baseline: sorting by x alone leaves y ranges at full width
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(wh / "xsort"))
    )
    assert avg_width(str(wh / "xsort"), "x") < 0.2
    assert avg_width(str(wh / "xsort"), "y") > 0.9


def test_zorder_key_is_morton_interleave(spark):
    from cruncher_spark.sources.layout import zorder_key

    df = spark.createDataFrame([(3, 5)], "x long, y long").select(
        zorder_key(["x", "y"], bits=4).alias("z")
    )
    # x=0b0011, y=0b0101 -> interleave x bit i at 2i, y bit i at 2i+1:
    # bits: x0=1->b0, y0=1->b1, x1=1->b2, y1=0->b3, x2=0->b4, y2=1->b5
    expect = 0b100111
    assert df.collect()[0].z == expect


def test_binned_zcell_stats_show_locality(spark):
    """binned_zcell_stats' per-cell min/max really are narrow on BOTH
    dimensions (the pruning property), cells partition all rows, and the
    bin arithmetic survives non-zero-based, non-power-of-two domains."""
    from cruncher_spark.sources.layout import binned_zcell_stats

    n = 5000
    rows = spark.range(n).select(
        (F.col("id") * 7919 % 1000 + 100).alias("a"),      # 100..1099
        (F.col("id") * 104729 % 365 + 2000).alias("b"),    # 2000..2364
    )
    stats = binned_zcell_stats(rows, "a", "b", bits=6, cell_bits=3).collect()

    assert sum(r.n for r in stats) == n
    assert len(stats) <= 64  # 2**(2*cell_bits) cells max
    # each 8x8-supercell covers 1/8 of each axis plus bin rounding slack
    for r in stats:
        assert r.max_d1 - r.min_d1 <= 1000 / 8 + 1000 / 64 + 1, r
        assert r.max_d2 - r.min_d2 <= 365 / 8 + 365 / 64 + 1, r
