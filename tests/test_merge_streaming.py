"""Merge layer + streaming shell: incremental state ≡ one-shot batch."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from cruncher_spark.merge import MergePolicy, PointTable
from cruncher_spark.plans.crunch import (
    GLOBAL_POINT_KEY,
    crunch_global_delta,
    crunch_team_fame,
)
from cruncher_spark.streaming import CrunchWorker


def _now():
    return F.lit("2026-08-10 12:00:00").cast("timestamp")


GLOBAL_POLICIES = {"updated_at": MergePolicy.KEEP}


def _global_point(spark, tmp_path, name="gp"):
    return PointTable(
        spark,
        str(tmp_path / name),
        key=GLOBAL_POINT_KEY,
        policies=GLOBAL_POLICIES,
        num_buckets=4,
    )


def _ids(tables, n=60):
    return [
        r.api_id for r in tables["participant"].select("api_id").limit(n).collect()
    ]


def _assert_frames_equal(a, b, drop=()):
    if drop:
        a, b = a.drop(*drop), b.drop(*drop)
    assert sorted(a.columns) == sorted(b.columns)
    b = b.select(*a.columns)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def _mysql_add_fold(deltas, key):
    """Fold a list of delta frames the way ON DUPLICATE KEY UPDATE does:
    per key, a measure is NULL if ANY contributing delta is NULL
    (MySQL ``NULL + x = NULL``), else the exact sum."""
    u = deltas[0]
    for d in deltas[1:]:
        u = u.unionByName(d)
    dtypes = dict(u.dtypes)

    def fold(c):
        s = (
            F.sum(F.col(c).cast("decimal(28,6)"))
            if dtypes[c] == "double"
            else F.sum(c)
        )
        return (
            F.when(F.max(F.col(c).isNull().cast("int")) == 1, F.lit(None))
            .otherwise(s)
            .cast(dtypes[c])
            .alias(c)
        )

    measures = [c for c in u.columns if c not in key and c != "updated_at"]
    return u.groupBy(*key).agg(
        F.max("updated_at").alias("updated_at"),
        *[fold(c) for c in measures],
    )


def test_incremental_merge_equals_batch_fold(spark, crunch_tables, tmp_path):
    """Three sequential merges == the ON-DUPLICATE fold of the three
    deltas (crunch_global.sql:68-87) — including the reference's
    NULL-poisoning add (a cell touched by an all-NULL-winner batch stays
    NULL) and per-batch impact_score rounding."""
    ids = _ids(crunch_tables, 60)
    point = _global_point(spark, tmp_path)
    deltas = [
        crunch_global_delta(crunch_tables, ids[lo : lo + 20], now=_now())
        for lo in range(0, 60, 20)
    ]
    for i, d in enumerate(deltas):
        point.merge(d, batch_id=f"b{i}")
    expected = _mysql_add_fold(deltas, list(GLOBAL_POINT_KEY))
    _assert_frames_equal(point.read(), expected)


def test_replay_is_idempotent_with_ledger(spark, crunch_tables, tmp_path):
    ids = _ids(crunch_tables, 20)
    delta = crunch_global_delta(crunch_tables, ids, now=_now())
    point = _global_point(spark, tmp_path)
    assert point.merge(delta, batch_id="b0") is True
    before = point.read().agg(F.sum("played")).collect()[0][0]
    assert point.merge(delta, batch_id="b0") is False  # redelivery
    after = point.read().agg(F.sum("played")).collect()[0][0]
    assert before == after


def test_replay_double_counts_without_ledger(spark, crunch_tables, tmp_path):
    """batch_id=None reproduces the reference's at-least-once semantics
    (worker.js:167-182): a replayed batch adds twice."""
    ids = _ids(crunch_tables, 20)
    delta = crunch_global_delta(crunch_tables, ids, now=_now())
    point = _global_point(spark, tmp_path)
    point.merge(delta, batch_id=None)
    before = point.read().agg(F.sum("played")).collect()[0][0]
    point.merge(delta, batch_id=None)
    assert point.read().agg(F.sum("played")).collect()[0][0] == 2 * before


def test_max_and_overwrite_policies(spark, tmp_path):
    point = PointTable(
        spark,
        str(tmp_path / "pt"),
        key=["k"],
        policies={"seen": MergePolicy.MAX, "fame": MergePolicy.OVERWRITE,
                  "label": MergePolicy.KEEP},
        num_buckets=1,
    )
    df1 = spark.createDataFrame(
        [(1, 10, 5.0, "first"), (2, 20, 6.0, "first")],
        "k int, seen int, fame double, label string",
    )
    df2 = spark.createDataFrame(
        [(1, 5, 9.0, "second"), (3, 30, 7.0, "second")],
        "k int, seen int, fame double, label string",
    )
    point.merge(df1, batch_id="a")
    point.merge(df2, batch_id="b")
    rows = {r.k: r for r in point.read().collect()}
    assert rows[1].seen == 10 and rows[1].fame == 9.0 and rows[1].label == "first"
    assert rows[2].seen == 20 and rows[2].fame == 6.0
    assert rows[3].seen == 30 and rows[3].fame == 7.0


def test_team_fame_overwrite_merge(spark, crunch_tables, tmp_path):
    """S4: team fame is recompute-and-overwrite (crunch_team.sql:41-42)."""
    point = PointTable(
        spark,
        str(tmp_path / "fame"),
        key=["tm_id"],
        policies={"fame": MergePolicy.OVERWRITE},
        num_buckets=1,
    )
    fame1 = crunch_team_fame(crunch_tables, 1, today=F.lit("2026-08-10"))
    point.merge(fame1, batch_id="t1-run1")
    fame2 = crunch_team_fame(crunch_tables, 1, today=F.lit("2026-08-12"))
    point.merge(fame2, batch_id="t1-run2")
    expect = {r.tm_id: r.fame for r in fame2.collect()}
    got = {r.tm_id: r.fame for r in point.read().collect() if r.tm_id in expect}
    assert got == expect


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    """O(delta) merge: a delta touching one key rewrites only that key's
    hash bucket; every other bucket's files are hard-linked (same inode —
    zero data movement) into the new version, and the ledger commits in
    the same atomic pointer flip (no applied-but-unrecorded window)."""
    import os

    point = PointTable(
        spark, str(tmp_path / "pt"), key=["k"], num_buckets=8,
    )
    base = spark.createDataFrame(
        [(i, 1) for i in range(64)], "k int, n int"
    )
    point.merge(base, batch_id="seed")

    def bucket_inodes():
        cur = point._current_version()
        return {
            d.name: {f.name: os.stat(f).st_ino for f in d.iterdir() if f.is_file()}
            for d in (cur / "data").iterdir()
            if d.is_dir()
        }

    before = bucket_inodes()
    point.merge(
        spark.createDataFrame([(3, 10)], "k int, n int"), batch_id="one-key"
    )
    after = bucket_inodes()

    from pyspark.sql import functions as SF

    touched = point.spark.createDataFrame([(3,)], "k int").select(
        SF.pmod(SF.hash("k"), SF.lit(8)).alias("b")
    ).collect()[0][0]
    touched_dir = f"pt_bucket={touched}"

    assert touched_dir in before and touched_dir in after
    for name, inodes in after.items():
        if name == touched_dir:
            assert inodes != before[name]  # rewritten
        else:
            assert inodes == before[name]  # hard-linked, byte-identical

    # merged value landed; all other rows untouched
    rows = {r.k: r.n for r in point.read().collect()}
    assert rows[3] == 11 and rows[5] == 1 and len(rows) == 64
    # ledger committed atomically with the data
    assert point.applied_batches() == {"seed", "one-key"}


def test_rebucket_rescales_layout_preserving_state(spark, tmp_path):
    """rebucket() changes the hash layout behind one atomic pointer flip:
    state and ledger survive byte-for-value, merges keep working at the
    new bucket count, and replay idempotence is preserved."""
    point = PointTable(spark, str(tmp_path / "pt"), key=["k"], num_buckets=4)
    point.merge(
        spark.createDataFrame([(i, i * 10) for i in range(40)], "k int, n int"),
        batch_id="seed",
    )
    before = {r.k: r.n for r in point.read().collect()}

    point.rebucket(16)
    cur = point._current_version()
    assert json.loads((cur / "meta.json").read_text())["num_buckets"] == 16
    n_dirs = len([d for d in (cur / "data").iterdir() if d.is_dir()])
    assert n_dirs > 4  # actually spread over the wider layout
    assert {r.k: r.n for r in point.read().collect()} == before
    # ledger carried forward: replaying the seed batch is still a no-op
    assert point.applied_batches() == {"seed"}
    assert point.merge(
        spark.createDataFrame([(0, 999)], "k int, n int"), batch_id="seed"
    ) is False

    # a fresh handle (new process) picks the persisted bucket count up
    reopened = PointTable(spark, str(tmp_path / "pt"), key=["k"])
    reopened.merge(
        spark.createDataFrame([(2, 1), (99, 5)], "k int, n int"), batch_id="b2"
    )
    assert reopened.num_buckets == 16
    rows = {r.k: r.n for r in reopened.read().collect()}
    assert rows[2] == 21 and rows[99] == 5 and len(rows) == 41

    # downscale works too (compaction direction)
    reopened.rebucket(2)
    rows2 = {r.k: r.n for r in reopened.read().collect()}
    assert rows2 == rows
    assert reopened.applied_batches() == {"seed", "b2"}


# --- streaming ------------------------------------------------------------


@pytest.fixture()
def id_stream_dir(tmp_path, crunch_tables):
    ids = _ids(crunch_tables, 60)
    d = tmp_path / "ids_in"
    d.mkdir()
    for i, lo in enumerate(range(0, 60, 20)):
        (d / f"batch_{i}.txt").write_text("\n".join(ids[lo : lo + 20]) + "\n")
    return d, ids


def test_stream_accumulates_to_batch_result(
    spark, crunch_tables, tmp_path, id_stream_dir
):
    d, ids = id_stream_dir
    point = _global_point(spark, tmp_path, "gp_stream")
    worker = CrunchWorker(
        spark,
        crunch_tables,
        lambda tables, batch: crunch_global_delta(tables, batch, now=_now()),
        point,
        quarantine_dir=str(tmp_path / "dlq"),
        notify_dir=str(tmp_path / "notify"),
        notify_routing_key="global",
    )
    q = worker.start_file_stream(
        str(d),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(300)
    assert worker.batches_processed == 3 and worker.batches_failed == 0
    deltas = [
        crunch_global_delta(crunch_tables, ids[lo : lo + 20], now=_now())
        for lo in range(0, 60, 20)
    ]
    expected = _mysql_add_fold(deltas, list(GLOBAL_POINT_KEY))
    _assert_frames_equal(point.read(), expected)
    notifies = spark.read.parquet(str(tmp_path / "notify"))
    assert notifies.count() == 3
    assert notifies.select("routing_key").distinct().collect()[0][0] == "global"


def test_kafka_shaped_stream_accumulates(
    spark, crunch_tables, tmp_path, id_stream_dir
):
    """S1 Kafka branch: the sandbox has no broker/connector jar, so the
    identical decode + pipeline runs over a stream with the EXACT kafka
    source schema (binary key/value + topic/partition/offset/timestamp),
    fed from files. Verifies decode_kafka_values + _start_stream — every
    line of the Kafka path except format("kafka").load() itself."""
    d, ids = id_stream_dir
    point = _global_point(spark, tmp_path, "gp_kafka")
    worker = CrunchWorker(
        spark,
        crunch_tables,
        lambda tables, batch: crunch_global_delta(tables, batch, now=_now()),
        point,
        quarantine_dir=str(tmp_path / "dlq_k"),
    )
    # file stream reshaped to the kafka source's columns/types
    kafka_shaped = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
        .select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit("crunch").alias("topic"),
            F.lit(0).cast("int").alias("partition"),
            F.lit(0).cast("long").alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).cast("int").alias("timestampType"),
        )
    )
    q = worker._start_stream(
        CrunchWorker.decode_kafka_values(kafka_shaped),
        str(tmp_path / "ckpt_k"),
        available_now=True,
    )
    q.awaitTermination(300)
    assert worker.batches_processed == 3 and worker.batches_failed == 0
    deltas = [
        crunch_global_delta(crunch_tables, ids[lo : lo + 20], now=_now())
        for lo in range(0, 60, 20)
    ]
    expected = _mysql_add_fold(deltas, list(GLOBAL_POINT_KEY))
    _assert_frames_equal(point.read(), expected)


def test_kafka_reader_configures(spark, crunch_tables, tmp_path):
    """The format("kafka") reader builds with prefetch/offset options; the
    connector jar is absent in the sandbox, so .load() is expected to fail
    with DATA_SOURCE_NOT_FOUND there (and succeed where it is deployed)."""
    point = _global_point(spark, tmp_path, "gp_kr")
    worker = CrunchWorker(spark, crunch_tables, lambda t, b: b, point)
    reader = worker.kafka_reader(
        "broker:9092", "crunch", max_offsets_per_trigger=1000
    )
    assert reader is not None
    try:
        reader.load()
    except Exception as e:  # noqa: BLE001 - connector absent is acceptable
        assert "kafka" in str(e).lower()


def test_stream_poison_and_dlq(spark, crunch_tables, tmp_path, id_stream_dir):
    d, ids = id_stream_dir
    (d / "batch_poison.txt").write_text("x" * 2000 + "\n")
    point = _global_point(spark, tmp_path, "gp_poison")
    boom = {"n": 0}

    def plan(tables, batch):
        # inject on the 2nd NON-EMPTY batch: the file source breaks
        # equal-mtime ties nondeterministically, so a positional "2nd
        # batch" can land on the poison-only batch — whose post-filter id
        # set is empty, quarantining 0 crunch_failed rows (observed flake)
        if batch.count() > 0:
            boom["n"] += 1
            if boom["n"] == 2:  # fail exactly one micro-batch
                raise RuntimeError("injected crunch failure")
        return crunch_global_delta(tables, batch, now=_now())

    worker = CrunchWorker(
        spark,
        crunch_tables,
        plan,
        point,
        quarantine_dir=str(tmp_path / "dlq2"),
    )
    q = worker.start_file_stream(
        str(d),
        str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(300)
    assert worker.batches_failed == 1
    dlq = spark.read.parquet(str(tmp_path / "dlq2"))
    reasons = {r.reason for r in dlq.select("reason").distinct().collect()}
    assert "poison" in reasons and "crunch_failed" in reasons
    # every poisoned message is quarantined, none crunched
    assert dlq.where(F.col("reason") == "poison").count() == 1


def test_restart_from_checkpoint_is_exactly_once(spark, crunch_tables, tmp_path):
    """Stop the worker, add new batches, start a FRESH worker instance on
    the same checkpoint + table: already-committed batches are neither
    re-read (source checkpoint) nor re-applied if redelivered (ledger),
    and the final state equals the one-shot fold of all batches."""
    ids = _ids(crunch_tables, 60)
    d = tmp_path / "ids"
    d.mkdir()
    for i, lo in enumerate(range(0, 40, 20)):
        (d / f"b{i}.txt").write_text("\n".join(ids[lo : lo + 20]) + "\n")

    point = _global_point(spark, tmp_path, "gp_restart")

    def make_worker():
        return CrunchWorker(
            spark,
            crunch_tables,
            lambda tables, batch: crunch_global_delta(tables, batch, now=_now()),
            point,
        )

    w1 = make_worker()
    q1 = w1.start_file_stream(
        str(d), str(tmp_path / "ckpt"), max_files_per_trigger=1,
        available_now=True,
    )
    q1.awaitTermination(300)
    assert w1.batches_processed == 2

    # new data lands while the worker is down
    (d / "b2.txt").write_text("\n".join(ids[40:60]) + "\n")

    w2 = make_worker()
    q2 = w2.start_file_stream(
        str(d), str(tmp_path / "ckpt"), max_files_per_trigger=1,
        available_now=True,
    )
    q2.awaitTermination(300)
    # the restarted instance processed ONLY the new batch
    assert w2.batches_processed == 1 and w2.batches_failed == 0

    deltas = [
        crunch_global_delta(crunch_tables, ids[lo : lo + 20], now=_now())
        for lo in range(0, 60, 20)
    ]
    expected = _mysql_add_fold(deltas, list(GLOBAL_POINT_KEY))
    _assert_frames_equal(point.read(), expected)


def test_two_streams_one_point_table_do_not_collide_on_epochs(
    spark, crunch_tables, tmp_path
):
    """ADVICE r4: ledger batch ids must be scoped per stream. Two workers
    feeding ONE PointTable both start at epoch 0; unscoped ids would make
    the second stream's every batch a 'duplicate' of the first's and
    silently drop it. Each stream here carries DISJOINT ids, so the
    merged total proves both actually applied."""
    ids = _ids(crunch_tables, 40)
    point = _global_point(spark, tmp_path, "gp_shared")

    def feed(sub_ids, tag):
        d = tmp_path / f"in_{tag}"
        d.mkdir()
        (d / "b0.txt").write_text("\n".join(sub_ids) + "\n")
        worker = CrunchWorker(
            spark,
            crunch_tables,
            lambda tables, batch: crunch_global_delta(tables, batch, now=_now()),
            point,
        )
        q = worker.start_file_stream(
            str(d), str(tmp_path / f"ckpt_{tag}"), available_now=True
        )
        q.awaitTermination(300)
        assert worker.batches_processed == 1 and worker.batches_failed == 0
        return worker

    w1 = feed(ids[:20], "a")
    w2 = feed(ids[20:], "b")
    assert w1.stream_id != w2.stream_id  # derived from checkpoint paths

    expected = _mysql_add_fold(
        [
            crunch_global_delta(crunch_tables, ids[:20], now=_now()),
            crunch_global_delta(crunch_tables, ids[20:], now=_now()),
        ],
        list(GLOBAL_POINT_KEY),
    )
    _assert_frames_equal(point.read(), expected)
    # both scoped epochs are in the ledger
    applied = point.applied_batches()
    assert {f"stream-{w1.stream_id}-0", f"stream-{w2.stream_id}-0"} <= applied


def test_crash_before_pointer_flip_leaves_table_consistent(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER writing the new version dir but BEFORE the CURRENT
    pointer flip must leave readers on the old version, and a retried
    merge must succeed (the leftover half-written version dir is
    reclaimed), landing exactly the once-applied state."""
    from cruncher_spark.merge.upsert import PointTable

    pt = PointTable(
        spark, str(tmp_path / "pt"), key=["k"], num_buckets=2
    )
    pt.merge(spark.createDataFrame([(1, 10)], "k int, n int"), batch_id="b0")
    before = sorted(map(tuple, pt.read().collect()))

    real_flip = PointTable._flip

    def crashing_flip(self, new):
        raise RuntimeError("simulated crash before commit point")

    monkeypatch.setattr(PointTable, "_flip", crashing_flip)
    delta = spark.createDataFrame([(1, 5), (2, 7)], "k int, n int")
    with pytest.raises(RuntimeError, match="simulated crash"):
        pt.merge(delta, batch_id="b1")
    # not committed: readers still see the old version, ledger unchanged
    assert sorted(map(tuple, pt.read().collect())) == before
    assert pt.applied_batches() == {"b0"}

    monkeypatch.setattr(PointTable, "_flip", real_flip)
    assert pt.merge(delta, batch_id="b1") is True
    assert sorted(map(tuple, pt.read().collect())) == [(1, 15), (2, 7)]
    assert pt.applied_batches() == {"b0", "b1"}


def test_concurrent_merges_serialize_without_losing_deltas(spark, tmp_path):
    """Two writers racing one PointTable: the advisory writer lock
    serializes them, so BOTH deltas land (pre-lock, both built v_{N+1}
    and the last pointer flip silently discarded the other's delta).
    A duplicate batch_id racing itself applies exactly once."""
    import threading

    from cruncher_spark.merge.upsert import PointTable

    pt = PointTable(
        spark, str(tmp_path / "ptc"), key=["k"], num_buckets=2
    )
    pt.merge(spark.createDataFrame([(0, 1)], "k int, n int"), batch_id="seed")

    results = {}
    barrier = threading.Barrier(2)

    def writer(tag, rows, batch_id):
        df = spark.createDataFrame(rows, "k int, n int")
        barrier.wait()
        results[tag] = pt.merge(df, batch_id=batch_id)

    t1 = threading.Thread(target=writer, args=("a", [(1, 10)], "w-a"))
    t2 = threading.Thread(target=writer, args=("b", [(2, 20)], "w-b"))
    t1.start(); t2.start(); t1.join(120); t2.join(120)
    assert results == {"a": True, "b": True}
    assert sorted(map(tuple, pt.read().collect())) == [(0, 1), (1, 10), (2, 20)]

    # duplicate batch_id race: exactly one side applies
    results.clear()
    t3 = threading.Thread(target=writer, args=("x", [(3, 30)], "dup"))
    t4 = threading.Thread(target=writer, args=("y", [(3, 30)], "dup"))
    t3.start(); t4.start(); t3.join(120); t4.join(120)
    assert sorted(results.values()) == [False, True]
    assert sorted(map(tuple, pt.read().collect())) == [
        (0, 1), (1, 10), (2, 20), (3, 30)
    ]


def test_legacy_checkpoint_without_marker_fails_loudly(tmp_path):
    """ADVICE r5: a pre-upgrade checkpoint (Spark stream state present,
    no .cruncher-stream-id marker) must NOT silently mint a fresh ledger
    scope — its ledger holds bare epoch ids, so a new scope would replay
    the last uncommitted epoch under a new id and double-apply it. The
    resolver now detects the legacy shape and demands an explicit
    decision (reset, or an explicitly pinned stream_id)."""
    from cruncher_spark.streaming.worker import checkpoint_stream_id

    cp = tmp_path / "legacy-cp"
    (cp / "offsets").mkdir(parents=True)
    (cp / "offsets" / "0").write_text("{}")
    with pytest.raises(RuntimeError, match="stream-id scoping"):
        checkpoint_stream_id(str(cp))

    # a genuinely fresh checkpoint dir still mints and persists a marker
    fresh = tmp_path / "fresh-cp"
    sid = checkpoint_stream_id(str(fresh))
    assert sid and checkpoint_stream_id(str(fresh)) == sid


def test_rebucket_online_with_concurrent_merge(spark, tmp_path):
    """VERDICT r5 next #7: a table that grows 100x must be re-tunable
    ONLINE. rebucket(8 -> 64) and a merge run concurrently from two
    threads; the WRITER.lock serializes them (r6 fix -- previously
    rebucket skipped the lock and the last pointer flip silently
    discarded the other writer), so afterwards BOTH effects are present:
    the 64-bucket layout, the merged delta, and a ledger holding every
    batch id."""
    import threading

    pt = PointTable(spark, str(tmp_path / "pt"), key=["k"], num_buckets=8)
    pt.merge(
        spark.createDataFrame(
            [(i, i * 10) for i in range(200)], "k int, n int"
        ),
        batch_id="seed",
    )
    before = {r.k: r.n for r in pt.read().collect()}

    # separate handles, as two writers would have
    rb = PointTable(spark, str(tmp_path / "pt"), key=["k"])
    mg = PointTable(spark, str(tmp_path / "pt"), key=["k"])
    errs = []

    def do_rebucket():
        try:
            rb.rebucket(64)
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    def do_merge():
        try:
            mg.merge(
                spark.createDataFrame([(3, 1), (777, 7)], "k int, n int"),
                batch_id="delta",
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=do_rebucket)
    t2 = threading.Thread(target=do_merge)
    t1.start(); t2.start(); t1.join(300); t2.join(300)
    assert not errs, errs

    fresh = PointTable(spark, str(tmp_path / "pt"), key=["k"])
    rows = {r.k: r.n for r in fresh.read().collect()}
    want = dict(before)
    want[3] = before[3] + 1
    want[777] = 7
    assert rows == want
    assert fresh.applied_batches() == {"seed", "delta"}
    import json as _json

    meta = _json.loads(
        (fresh._current_version() / "meta.json").read_text()
    )
    assert meta["num_buckets"] == 64
    # replay stays idempotent across the migration
    assert fresh.merge(
        spark.createDataFrame([(3, 999)], "k int, n int"), batch_id="delta"
    ) is False


# ---------------------------------------------------------------------------
# LSM (append + compact) merge mode — r7 VERDICT #1
# ---------------------------------------------------------------------------

_LSM_SCHEMA = (
    "id long, add_d double, add_i long, ansafe double,"
    " mx long, lst long, grt long, keep string, ovw string"
)
_LSM_POLICIES = {
    "add_d": MergePolicy.ADD,
    "add_i": MergePolicy.ADD,
    "ansafe": MergePolicy.ADD_NULLSAFE,
    "mx": MergePolicy.MAX,
    "lst": MergePolicy.LEAST,
    "grt": MergePolicy.GREATEST,
    "keep": MergePolicy.KEEP,
    "ovw": MergePolicy.OVERWRITE,
}


def _lsm_batches():
    """Delta sequence exercising every policy's NULL quirks: NULL-starts,
    mid-sequence NULLs, single-appearance keys (the ADD quantize-
    pass-through case: 7-digit fraction must survive un-rounded)."""
    return [
        [
            (1, 1.5, 10, 1.0, 5, 5, 5, "first", "v1"),
            (2, None, None, None, None, None, None, None, None),
            (3, 0.1234567, 7, 0.25, 9, 9, 9, "three", "t1"),
        ],
        [
            (1, 2.5, 4, None, None, 3, 9, "second", None),
            (2, 1.0, 1, 1.0, 1, 1, 1, "late", "l1"),
            (4, -1.25, -2, -0.5, 0, 0, 0, "four", "f1"),
        ],
        [
            (1, 0.5, 1, 2.0, 7, 8, 2, "third", "v3"),
            (2, 1.0, 1, None, None, None, None, "later", "l2"),
        ],
    ]


def _mk_pair(spark, tmp_path, **lsm_kwargs):
    from cruncher_spark.merge.upsert import PointTable

    b = PointTable(
        spark, str(tmp_path / "bucketed"), key=["id"],
        policies=_LSM_POLICIES, num_buckets=4,
    )
    l = PointTable(
        spark, str(tmp_path / "lsm"), key=["id"],
        policies=_LSM_POLICIES, num_buckets=4, mode="lsm", **lsm_kwargs,
    )
    return b, l


def _rows(pt):
    cols = sorted(pt.read().columns)
    rows = [tuple(r[c] for c in cols) for r in pt.read().collect()]
    return sorted(rows, key=lambda t: tuple((x is None, str(x)) for x in t))


def test_lsm_fold_equals_bucketed_pairwise_all_policies(spark, tmp_path):
    """The LSM read-side policy fold must reproduce the bucketed
    pairwise merge EXACTLY — including MySQL ADD's NULL-propagation,
    MAX's NULL-keeps-old, KEEP/OVERWRITE's even-when-NULL row pick,
    and ADD's no-quantize pass-through for single-appearance keys."""
    b, l = _mk_pair(spark, tmp_path)
    for i, batch in enumerate(_lsm_batches()):
        df = spark.createDataFrame(batch, _LSM_SCHEMA)
        assert b.merge(df, batch_id=f"b{i}") is True
        assert l.merge(df, batch_id=f"b{i}") is True
        assert _rows(b) == _rows(l), f"diverged after batch {i}"
    # the single-appearance double survived both modes un-rounded
    v3 = {r.id: r.add_d for r in l.read().collect()}
    assert v3[3] == 0.1234567


def test_lsm_fold_on_read_with_live_runs(spark, tmp_path):
    """Force the multi-run fold-on-read path (a big base run followed
    by a small append that the size invariant does NOT fold) and check
    it against bucketed state."""
    b, l = _mk_pair(spark, tmp_path)
    big = [(i, float(i), i, 1.0, i, i, i, f"k{i}", f"o{i}") for i in range(400)]
    small = [(1, 1.0, 1, 1.0, 99, 0, 99, "later", "new"), (2, None, 1, 1.0, 1, 1, 1, "x", "y")]
    for i, batch in enumerate([big, small]):
        df = spark.createDataFrame(batch, _LSM_SCHEMA)
        b.merge(df, batch_id=f"b{i}")
        l.merge(df, batch_id=f"b{i}")
    runs = l._run_dirs(l._current_version())
    assert len(runs) == 2  # invariant held: no fold of 400-vs-2 rows
    assert _rows(b) == _rows(l)


def test_lsm_compaction_keeps_run_count_logarithmic(spark, tmp_path):
    """Equal-sized appends cascade like a binary counter: after N
    batches the live run count tracks popcount(N), never N — the
    bounded-read-cost half of the LSM contract."""
    _, l = _mk_pair(spark, tmp_path)
    for i in range(10):
        df = spark.createDataFrame(
            [(100 * i + j, 1.0, 1, 1.0, 1, 1, 1, "a", "b") for j in range(20)],
            _LSM_SCHEMA,
        )
        l.merge(df, batch_id=f"b{i}")
        runs = l._run_dirs(l._current_version())
        assert len(runs) <= 4, f"run count {len(runs)} after batch {i}"
    assert l.read().count() == 10 * 20


def test_lsm_ledger_replay_and_time_travel(spark, tmp_path):
    from cruncher_spark.merge.upsert import PointTable

    l = PointTable(
        spark, str(tmp_path / "lsm"), key=["id"],
        policies={"n": MergePolicy.ADD}, num_buckets=2, mode="lsm",
        retain_versions=10,
    )
    d1 = spark.createDataFrame([(1, 10), (2, 20)], "id long, n long")
    d2 = spark.createDataFrame([(1, 5), (3, 30)], "id long, n long")
    assert l.merge(d1, batch_id="x1") is True
    v_after_1 = max(l.versions())
    assert l.merge(d2, batch_id="x2") is True
    assert l.merge(d2, batch_id="x2") is False  # replay no-op
    now = {r.id: r.n for r in l.read().collect()}
    assert now == {1: 15, 2: 20, 3: 30}
    then = {r.id: r.n for r in l.read(version=v_after_1).collect()}
    assert then == {1: 10, 2: 20}


def test_lsm_crash_mid_compaction_recovers(spark, tmp_path, monkeypatch):
    """Each fold is its own committed version: a crash inside the
    compaction loop leaves the appended (already-flipped) state fully
    readable and the ledger intact; the next merge finishes the fold."""
    from cruncher_spark.merge.upsert import PointTable

    l = PointTable(
        spark, str(tmp_path / "lsm"), key=["id"],
        policies={"n": MergePolicy.ADD}, num_buckets=2, mode="lsm",
    )
    l.merge(spark.createDataFrame([(1, 1)], "id long, n long"), batch_id="c0")

    def boom(cur, runs):
        raise RuntimeError("crash mid-compaction")

    monkeypatch.setattr(l, "_fold_newest_two", boom)
    with pytest.raises(RuntimeError):
        l.merge(spark.createDataFrame([(2, 2)], "id long, n long"), batch_id="c1")
    # append committed before the crash: data + ledger visible
    assert {r.id: r.n for r in l.read().collect()} == {1: 1, 2: 2}
    assert l.merge(
        spark.createDataFrame([(2, 2)], "id long, n long"), batch_id="c1"
    ) is False  # ledger replay no-op
    monkeypatch.undo()
    l.merge(spark.createDataFrame([(3, 3)], "id long, n long"), batch_id="c2")
    assert {r.id: r.n for r in l.read().collect()} == {1: 1, 2: 2, 3: 3}
    assert len(l._run_dirs(l._current_version())) <= 2


def test_lsm_cdc_fold_then_rewrite(spark, tmp_path):
    from cruncher_spark.merge.upsert import PointTable

    l = PointTable(
        spark, str(tmp_path / "lsm"), key=["id"],
        policies={"n": MergePolicy.ADD}, num_buckets=2, mode="lsm",
    )
    l.merge(spark.createDataFrame([(1, 1), (2, 2)], "id long, n long"), batch_id="m0")
    l.merge(spark.createDataFrame([(1, 1), (3, 3)], "id long, n long"), batch_id="m1")
    cdc = spark.createDataFrame(
        [(1, 100, "upsert"), (2, None, "delete"), (4, 4, "upsert")],
        "id long, n long, op string",
    )
    assert l.apply_cdc(cdc, batch_id="cdc1") is True
    assert {r.id: r.n for r in l.read().collect()} == {1: 100, 3: 3, 4: 4}
    assert l.apply_cdc(cdc, batch_id="cdc1") is False
    # post-CDC merges keep working on the consolidated run
    l.merge(spark.createDataFrame([(4, 1)], "id long, n long"), batch_id="m2")
    assert {r.id: r.n for r in l.read().collect()} == {1: 100, 3: 3, 4: 5}


def test_lsm_persisted_mode_wins(spark, tmp_path):
    """Reopening an LSM table with default (bucketed) constructor args
    must keep appending runs, not corrupt the layout — the persisted
    mode wins exactly like num_buckets."""
    from cruncher_spark.merge.upsert import PointTable

    l = PointTable(
        spark, str(tmp_path / "t"), key=["id"],
        policies={"n": MergePolicy.ADD}, mode="lsm",
    )
    l.merge(spark.createDataFrame([(1, 1)], "id long, n long"), batch_id="a")
    re = PointTable(
        spark, str(tmp_path / "t"), key=["id"],
        policies={"n": MergePolicy.ADD},
    )  # default bucketed args
    re.merge(spark.createDataFrame([(1, 2), (2, 5)], "id long, n long"), batch_id="b")
    assert re.mode == "lsm"
    assert {r.id: r.n for r in re.read().collect()} == {1: 3, 2: 5}


def test_lsm_empty_delta_ledger_only(spark, tmp_path):
    """An empty delta (ingest batch with zero survivors) must commit
    its batch_id to the ledger WITHOUT leaving a parquet-less run dir
    (0-byte runs never trigger the fold invariant and would pile up)."""
    from cruncher_spark.merge.upsert import PointTable

    l = PointTable(
        spark, str(tmp_path / "lsm"), key=["id"],
        policies={"n": MergePolicy.ADD}, num_buckets=2, mode="lsm",
    )
    empty = spark.createDataFrame([], "id long, n long")
    assert l.merge(empty, batch_id="e0") is True
    assert l.merge(empty, batch_id="e0") is False  # ledger recorded
    assert l._run_dirs(l._current_version()) == []
    assert l.read().count() == 0  # schema-backed empty read
    l.merge(spark.createDataFrame([(1, 1)], "id long, n long"), batch_id="d1")
    assert l.merge(empty, batch_id="e1") is True
    assert len(l._run_dirs(l._current_version())) == 1
    assert {r.id: r.n for r in l.read().collect()} == {1: 1}


def test_lsm_exhaustive_policy_matrix(spark, tmp_path):
    """EXHAUSTIVE pairwise-vs-fold equivalence: every combination of
    (presence pattern over 3 batches) x (per-batch NULL pattern) rides
    as its own KEY through one bucketed and one LSM table, for all
    seven policies at once — 7 non-empty presence patterns x 8 null
    masks = 56 keys covering every ordering a 3-batch history can
    produce (NULL-start, NULL-middle, NULL-end, single-appearance,
    gaps). One run, every case."""
    from cruncher_spark.merge.upsert import PointTable

    POLICIES = _LSM_POLICIES
    cols = list(POLICIES)
    keys = []
    for present in range(1, 8):  # bit b set -> key appears in batch b
        for nulls in range(8):  # bit b set -> values NULL in batch b
            keys.append((present, nulls))

    def batch_rows(b):
        rows = []
        for present, nulls in keys:
            if not (present >> b) & 1:
                continue
            kid = present * 10 + nulls
            if (nulls >> b) & 1:
                vals = {c: None for c in cols}
            else:
                vals = {
                    c: float(kid + 100 * (b + 1)) + i * 0.25
                    for i, c in enumerate(cols)
                    if c in ("add_d", "ansafe")
                }
                vals.update(
                    {
                        c: kid + 100 * (b + 1) + i
                        for i, c in enumerate(cols)
                        if c in ("add_i", "mx", "lst", "grt")
                    }
                )
                vals["keep"] = f"k{kid}b{b}"
                vals["ovw"] = f"o{kid}b{b}"
            rows.append(
                (kid, vals["add_d"], vals["add_i"], vals["ansafe"],
                 vals["mx"], vals["lst"], vals["grt"], vals["keep"],
                 vals["ovw"])
            )
        return rows

    b, l = _mk_pair(spark, tmp_path)
    for bi in range(3):
        df = spark.createDataFrame(batch_rows(bi), _LSM_SCHEMA)
        b.merge(df, batch_id=f"m{bi}")
        l.merge(df, batch_id=f"m{bi}")
    rb, rl = _rows(b), _rows(l)
    assert len(rb) == len(keys)
    assert rb == rl
