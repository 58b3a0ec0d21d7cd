"""CDC apply on PointTable: upsert row images, deletes, replay idempotence."""

from __future__ import annotations

from cruncher_spark.merge.upsert import MergePolicy, PointTable


def _pt(spark, tmp_path):
    return PointTable(
        spark,
        str(tmp_path / "pt"),
        key=["k"],
        policies={"n": MergePolicy.ADD},
        num_buckets=8,
    )


def _state(pt):
    return {r.k: (r.n, r.tag) for r in pt.read().collect()}


def test_cdc_upsert_and_delete(spark, tmp_path):
    pt = _pt(spark, tmp_path)
    pt.merge(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k long, n long, tag string"
        )
    )

    changes = spark.createDataFrame(
        [
            (2, 99, "B", "upsert"),   # full-image replace (NOT additive)
            (4, 40, "d", "upsert"),   # insert
            (3, 0, "", "delete"),     # key removed
        ],
        "k long, n long, tag string, op string",
    )
    assert pt.apply_cdc(changes, batch_id="cdc-1")
    assert _state(pt) == {1: (10, "a"), 2: (99, "B"), 4: (40, "d")}


def test_cdc_replay_is_idempotent(spark, tmp_path):
    pt = _pt(spark, tmp_path)
    pt.merge(
        spark.createDataFrame([(1, 10, "a")], "k long, n long, tag string"),
        batch_id="seed",
    )
    changes = spark.createDataFrame(
        [(1, 77, "z", "upsert")], "k long, n long, tag string, op string"
    )
    assert pt.apply_cdc(changes, batch_id="cdc-1")
    assert not pt.apply_cdc(changes, batch_id="cdc-1")  # replay dropped
    assert _state(pt) == {1: (77, "z")}


def test_cdc_delete_can_empty_a_bucket(spark, tmp_path):
    pt = _pt(spark, tmp_path)
    pt.merge(spark.createDataFrame([(5, 1, "x")], "k long, n long, tag string"))
    changes = spark.createDataFrame(
        [(5, 0, "", "delete")], "k long, n long, tag string, op string"
    )
    assert pt.apply_cdc(changes)
    assert pt.read().count() == 0


def test_cdc_on_empty_table_inserts(spark, tmp_path):
    pt = _pt(spark, tmp_path)
    pt.merge(
        spark.createDataFrame([], "k long, n long, tag string")
    )
    changes = spark.createDataFrame(
        [(9, 9, "q", "upsert"), (8, 8, "p", "delete")],
        "k long, n long, tag string, op string",
    )
    assert pt.apply_cdc(changes)
    assert _state(pt) == {9: (9, "q")}


def test_time_travel_retention(spark, tmp_path):
    """retain_versions keeps historical versions readable (hard-linked, so
    shared bucket files cost no extra storage) and GCs past the window."""
    pt = PointTable(
        spark, str(tmp_path / "tt"), key=["k"],
        policies={"n": MergePolicy.ADD, "tag": MergePolicy.OVERWRITE},
        num_buckets=4, retain_versions=2,
    )
    pt.merge(spark.createDataFrame([(1, 10, "a")], "k long, n long, tag string"))
    pt.merge(spark.createDataFrame([(1, 5, "a")], "k long, n long, tag string"))
    pt.merge(spark.createDataFrame([(2, 7, "b")], "k long, n long, tag string"))

    assert pt.versions() == [2, 3]  # v1 GC'd past the 2-version window
    assert _state(pt) == {1: (15, "a"), 2: (7, "b")}
    # time travel: version 2 predates key 2's arrival
    old = {r.k: (r.n, r.tag) for r in pt.read(version=2).collect()}
    assert old == {1: (15, "a")}
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        pt.read(version=1)
