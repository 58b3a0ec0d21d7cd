"""crunch_global: grouping-sets rewrite ≡ the reference's literal OR-joins.

The DuckDB side runs reference_oracles.crunch_global_sql — a verbatim ANSI
translation of crunch_global.sql's OR-'all' fan-out joins. The Spark side
runs the grouping-sets architecture. Equality here is the proof that the
rewrite preserves the reference's semantics (SURVEY.md §5.3 fan-out
correctness property).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from cruncher_spark.plans.crunch import crunch_global_delta
from cruncher_spark.plans.reference_oracles import crunch_global_sql


def rows_by_key(rows, cols, key_cols):
    out = {}
    for r in rows:
        d = dict(zip(cols, r))
        key = tuple(d[k] for k in key_cols)
        assert key not in out, f"duplicate key {key}"
        out[key] = d
    return out


def assert_same(spark_df, duck_result, key_cols):
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    ocols = [d[0] for d in duck_result.description]
    orows = duck_result.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"column mismatch: {sorted(set(scols) ^ set(ocols))}"
    )
    smap = rows_by_key(srows, scols, key_cols)
    omap = rows_by_key(orows, ocols, key_cols)
    assert set(smap) == set(omap), (
        f"key sets differ: spark-only={list(set(smap) - set(omap))[:5]} "
        f"oracle-only={list(set(omap) - set(smap))[:5]}"
    )
    for key, srow in smap.items():
        orow = omap[key]
        for c in scols:
            sv, ov = srow[c], orow[c]
            if isinstance(sv, float) or isinstance(ov, float):
                assert sv is not None and ov is not None and math.isclose(
                    float(sv), float(ov), rel_tol=1e-9, abs_tol=1e-9
                ), f"{key} {c}: spark={sv} oracle={ov}"
            else:
                assert sv == ov, f"{key} {c}: spark={sv} oracle={ov}"


GLOBAL_KEY = [
    "series_id", "filter_id", "hero_id", "game_mode_id", "skill_tier_id",
    "build_id", "role_id", "region_id",
]


def test_global_matches_reference_literal(spark, crunch_tables, duck):
    batch = [
        r.api_id
        for r in crunch_tables["participant"].select("api_id").limit(120).collect()
    ]
    delta = crunch_global_delta(
        crunch_tables, batch, now=F.lit("2026-08-10 12:00:00").cast("timestamp")
    ).drop("updated_at")
    oracle = duck.execute(crunch_global_sql(batch, [14, 22, 31]))
    assert_same(delta, oracle, GLOBAL_KEY)


def test_global_additivity(spark, crunch_tables):
    """crunch(A ∪ B) ≡ crunch(A) + crunch(B) for disjoint batches — the
    design bet of ON DUPLICATE KEY UPDATE (crunch_global.sql:68-87)."""
    ids = [
        r.api_id
        for r in crunch_tables["participant"].select("api_id").limit(40).collect()
    ]
    a, b = ids[:20], ids[20:]
    now = F.lit("2026-08-10 12:00:00").cast("timestamp")
    both = crunch_global_delta(crunch_tables, a + b, now=now).drop("updated_at")
    parts = (
        crunch_global_delta(crunch_tables, a, now=now)
        .unionByName(crunch_global_delta(crunch_tables, b, now=now))
        .drop("updated_at")
    )
    measure_cols = [c for c in both.columns if c not in GLOBAL_KEY + ["hero2_id", "role2_id"]]
    # impact_score rounds after summing → additivity holds pre-round; drop it
    measure_cols.remove("impact_score")
    # re-sum doubles through decimal: the plan's sums are decimal-exact, and
    # exceptAll compares doubles bit-for-bit
    dtypes = dict(both.dtypes)
    resummed = parts.groupBy(*GLOBAL_KEY, "hero2_id", "role2_id").agg(
        *[
            (
                F.sum(F.col(c).cast("decimal(18,2)"))
                if dtypes[c] == "double"
                else F.sum(c)
            )
            .cast(dtypes[c])
            .alias(c)
            for c in measure_cols
        ]
    )
    both_cmp = both.drop("impact_score")
    assert resummed.count() == both_cmp.count()
    diff = both_cmp.exceptAll(resummed.select(*both_cmp.columns))
    assert diff.count() == 0, diff.limit(5).collect()
