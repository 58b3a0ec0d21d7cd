"""Tests for the round-4 event-flow / record-linkage operators:

- symmetric-deletion fuzzy join vs an in-memory brute-force levenshtein
  (including adversarial transposition pairs the variant index over-
  generates and must verify away);
- funnel scan vs an independent per-user Python replay;
- rolling RANGE window inclusive-bound semantics on boundary timestamps.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_matches_bruteforce(spark):
    from cruncher_spark.operators.fuzzy import edit_distance_self_join

    # transposition pairs ("ab"/"ba") are distance 2 but share a deletion
    # variant — the verify step must drop them; substitution/insert/delete
    # neighbors must all survive
    names = [
        "cold ring", "old ring", "bold ring", "old rings", "od ring",
        "gold ring", "ab", "ba", "abc", "acb", "x", "", "xx",
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r.name_a, r.name_b)
        for r in edit_distance_self_join(df, "p_name").collect()
    }
    want = {
        tuple(sorted((a, b)))
        for a, b in itertools.combinations(set(names), 2)
        if _lev(a, b) <= 1
    }
    assert got == want


def test_fuzzy_join_is_equi_join(spark):
    """The candidate join must be a hash equi-join on the variant — a
    BroadcastNestedLoopJoin/cartesian here means the rewrite regressed to
    the theta form it exists to avoid."""
    from cruncher_spark.operators.fuzzy import edit_distance_self_join

    df = spark.range(100).select(
        F.concat(F.lit("name"), F.col("id")).alias("p_name")
    )
    plan = (
        edit_distance_self_join(df, "p_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_funnel_matches_python_replay(spark, tmp_path):
    import random

    from cruncher_spark.plans.analytics_queries import funnel_steps

    rng = random.Random(7)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (i, 1_000_000 * rng.randrange(0, 50), rng.randrange(0, 20),
         rng.choice(types), 1.0, "{}")
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string"
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "events.parquet"))

    got = {
        r.user_id: (r.t1, r.t2, r.t3, r.furthest)
        for r in funnel_steps(spark, str(sf)).collect()
    }

    by_user: dict[int, list] = {}
    for eid, ts_us, uid, et, _v, _p in rows:
        if et in ("view", "click", "purchase"):
            by_user.setdefault(uid, []).append((ts_us, eid, et))
    want = {}
    for uid, evs in by_user.items():
        t1 = t2 = t3 = None
        for ts_us, _eid, et in sorted(evs):
            if et == "view" and t1 is None:
                t1 = ts_us
            elif et == "click" and t1 is not None and t2 is None and ts_us > t1:
                t2 = ts_us
            elif et == "purchase" and t2 is not None and t3 is None and ts_us > t2:
                t3 = ts_us
        want[uid] = (t1, t2, t3, sum(t is not None for t in (t1, t2, t3)))
    assert got == want


def test_rolling_window_inclusive_boundary(spark, tmp_path):
    """An event exactly 1h older than the current one is INSIDE the
    trailing frame (RANGE bounds are inclusive on both engines)."""
    from cruncher_spark.plans.analytics_queries import rolling_window_agg

    h = 3_600_000_000
    rows = [
        (1, 0, 5, "view", 1.0, "{}"),
        (2, h, 5, "view", 2.0, "{}"),          # exactly 1h later: includes #1
        (3, 2 * h + 1, 5, "view", 4.0, "{}"),  # 1h+1us after #2: excludes it
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string"
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "events.parquet"))

    got = {
        r.event_id: (r.n_1h, r.sum_1h)
        for r in rolling_window_agg(spark, str(sf)).collect()
    }
    assert got == {1: (1, 1.0), 2: (2, 3.0), 3: (1, 4.0)}
