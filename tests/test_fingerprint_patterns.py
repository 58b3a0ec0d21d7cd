"""Tests for content-defined fingerprint dedup and event-pattern matching.

The fingerprint operator's load-bearing claims are tested directly:
offset-invariance (the property absolute-position striding lacks), the
df cap actually suppressing boilerplate grams, and exactness (no pair
without a real shared substring). The pattern matcher's claim is
determinism under repartitioning plus agreement with a Python replay.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cruncher_spark.operators.dedup import (
    content_fingerprints,
    fingerprint_span_pairs,
)

SHARED = "the quick brown fox jumps over the lazy dog again and again tonight"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fingerprints_offset_invariant(spark):
    """The same span selects the same grams wherever it sits in a doc."""
    a = "AAAA " * 10 + SHARED
    b = SHARED + " zzzz " * 17
    df = _docs(spark, [(1, a), (2, b)])
    fp = content_fingerprints(df, "doc_id", "text", k=24, mod_p=4)
    rows = fp.collect()
    g1 = {r.gram for r in rows if r.doc_id == 1 and r.gram in a and r.gram in b}
    g2 = {r.gram for r in rows if r.doc_id == 2 and r.gram in a and r.gram in b}
    # every selected gram drawn from the shared span is selected in BOTH
    shared_grams = {g for g in g1 | g2 if g in SHARED}
    assert shared_grams, "a 60+ char shared span must select >=1 fingerprint"
    assert shared_grams <= g1 and shared_grams <= g2


def test_span_pairs_detect_and_are_exact(spark):
    df = _docs(
        spark,
        [
            (1, "prefix one " + SHARED + " suffix alpha"),
            (2, "a different lead-in here " + SHARED),
            (3, "entirely unrelated content with no overlap at all whatsoever"),
        ],
    )
    pairs = fingerprint_span_pairs(
        df, "doc_id", "text", k=24, mod_p=2, min_shared=1
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert all(p in {(1, 2)} for p in got), "no pair without a shared substring"


def test_span_pairs_df_cap_suppresses_boilerplate(spark):
    # one 30-char boilerplate line in every doc; unique bodies otherwise.
    # With max_df below the corpus size, no pairs may come from it.
    boiler = "standard legal footer text here please ignore this line"
    # per-doc filler uses a DISTINCT letter so the only cross-doc shared
    # substrings >= k chars come from the boilerplate itself
    rows = [
        (i, f"unique body number {i} {chr(ord('a') + i) * 30} " + boiler)
        for i in range(1, 9)
    ]
    df = _docs(spark, rows)
    no_cap = fingerprint_span_pairs(
        df, "doc_id", "text", k=24, mod_p=2, min_shared=1, max_df=64
    )
    capped = fingerprint_span_pairs(
        df, "doc_id", "text", k=24, mod_p=2, min_shared=1, max_df=7
    )
    assert no_cap.count() > 0, "uncapped: boilerplate links every doc pair"
    assert capped.count() == 0, "df cap must drop corpus-wide grams entirely"


def test_short_docs_produce_no_fingerprints(spark):
    df = _docs(spark, [(1, "tiny"), (2, "")])
    assert content_fingerprints(df, "doc_id", "text", k=24).count() == 0


def test_event_pattern_match_python_replay(spark, tmp_path):
    """Spark result == per-user Python regex replay, stable under repartition."""
    import random

    from cruncher_spark.plans.analytics_queries import (
        _EVENT_PATTERNS,
        event_pattern_match,
    )

    rng = random.Random(7)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = [
        (i, f"2024-01-01 00:{i // 60 % 60:02d}:{i % 60:02d}", rng.randrange(12), rng.choice(types))
        for i in range(600)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.repartition(5).write.parquet(str(sf / "events.parquet"))

    got = {
        r.pattern_name: (r.n_users, r.n_matches)
        for r in event_pattern_match(spark, str(sf)).collect()
    }

    by_user: dict[int, str] = {}
    for eid, ts_s, uid, et in rows:
        by_user.setdefault(uid, [])
    for eid, ts_s, uid, et in sorted(rows, key=lambda r: (r[1], r[0])):
        by_user[uid] = by_user.get(uid, "")
        if isinstance(by_user[uid], list):
            by_user[uid] = ""
        by_user[uid] += et[0]
    for name, pat in _EVENT_PATTERNS:
        n_users = sum(1 for s in by_user.values() if re.search(pat, s))
        n_matches = sum(len(re.findall(pat, s)) for s in by_user.values())
        assert got[name] == (n_users, n_matches), name


# ---------------------------------------------------------------------------
# asymmetric containment (r7)
# ---------------------------------------------------------------------------


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_containment_detects_quote_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer one: containment
    1.0 in the inner->outer direction, nothing in reverse, and the
    jaccard of the pair is far below any dedup threshold."""
    from cruncher_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingle_table,
    )

    inner = _words("q", 12)
    outer = f"{_words('pre', 30)} {inner} {_words('post', 30)}"
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, _words("other", 25))],
        "doc_id long, text string",
    )
    got = {
        (r.inner_id, r.outer_id): r.containment
        for r in containment_pairs(docs, "doc_id", "text").collect()
    }
    assert got == {(1, 2): 1.0}

    # the same pair is invisible to symmetric jaccard at any real tau
    j = jaccard_pairs(
        shingle_table(docs, "doc_id", "text"), "doc_id", 0.5
    ).collect()
    assert j == []


def test_containment_exact_copies_bidirectional(spark):
    from cruncher_spark.operators.dedup import containment_pairs

    t = _words("c", 20)
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    got = {
        (r.inner_id, r.outer_id): r.containment
        for r in containment_pairs(docs, "doc_id", "text").collect()
    }
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


def test_containment_near_threshold_integer_exact(spark):
    """tau = 9/10 compares in integers: 9/10 of shingles shared is IN,
    one fewer is OUT (the PPJoin float-ceil lesson)."""
    from cruncher_spark.operators.dedup import containment_pairs

    # inner has 12 words -> 10 shingles; outer carries a 11-word prefix
    # of inner -> 9 shared shingles = exactly 9/10
    inner_words = [f"t{i}" for i in range(12)]
    inner = " ".join(inner_words)
    outer_in = " ".join(inner_words[:11]) + " " + _words("pad", 30)
    outer_out = " ".join(inner_words[:10]) + " " + _words("pad", 30)
    docs = spark.createDataFrame(
        [(1, inner), (2, outer_in)], "doc_id long, text string"
    )
    got = {(r.inner_id, r.outer_id) for r in
           containment_pairs(docs, "doc_id", "text").collect()}
    assert (1, 2) in got  # 9/10 exactly -> flagged
    docs2 = spark.createDataFrame(
        [(1, inner), (2, outer_out)], "doc_id long, text string"
    )
    got2 = {(r.inner_id, r.outer_id) for r in
            containment_pairs(docs2, "doc_id", "text").collect()}
    assert (1, 2) not in got2  # 8/10 -> below tau


def test_containment_df_cap_excludes_boilerplate(spark):
    """A shingle shared by more than df_cap docs never pairs anyone:
    8 identical docs under df_cap=5 produce NO pairs (that text is
    boilerplate by definition), while df_cap=100 pairs them all."""
    from cruncher_spark.operators.dedup import containment_pairs

    t = _words("b", 15)
    docs = spark.createDataFrame(
        [(i, t) for i in range(8)], "doc_id long, text string"
    )
    assert containment_pairs(docs, "doc_id", "text", df_cap=5).count() == 0
    assert (
        containment_pairs(docs, "doc_id", "text", df_cap=100).count()
        == 8 * 7
    )
