"""player / hero_vs_hero / phases / bans / team plans vs literal reference SQL."""

from __future__ import annotations

import pyspark.sql.functions as F

from cruncher_spark.plans import crunch as C
from cruncher_spark.plans import reference_oracles as O
from tests.test_crunch_global import assert_same

ITEMS = [14, 22, 31]


def _now():
    return F.lit("2026-08-10 12:00:00").cast("timestamp")


def _batch(tables, table="participant", key="api_id", n=120):
    return [r[key] for r in tables[table].select(key).limit(n).collect()]


def test_player_matches_reference_literal(spark, crunch_tables, duck):
    batch = _batch(crunch_tables)
    delta = C.crunch_player_delta(crunch_tables, batch).drop("updated_at")
    oracle = duck.execute(O.crunch_player_sql(batch, ITEMS))
    assert_same(delta, oracle, list(C.PLAYER_POINT_KEY))


def test_hero_vs_hero_matches_reference_literal(spark, crunch_tables, duck):
    batch = _batch(crunch_tables, n=60)
    delta = C.crunch_hero_vs_hero_delta(crunch_tables, batch, now=_now()).drop(
        "updated_at"
    )
    oracle = duck.execute(O.crunch_hero_vs_hero_sql(batch, ITEMS))
    assert_same(delta, oracle, list(C.HERO_VS_HERO_KEY))


def test_phases_matches_reference_literal(spark, crunch_tables, duck):
    batch = _batch(crunch_tables, table="participant_phases", key="id", n=150)
    delta = C.crunch_phases_delta(crunch_tables, batch, now=_now()).drop("updated_at")
    oracle = duck.execute(O.crunch_phases_sql(batch, ITEMS))
    assert_same(delta, oracle, list(C.PHASE_POINT_KEY))


def test_phases_bans_matches_reference_literal(spark, crunch_tables, duck):
    batch = _batch(crunch_tables, table="participant_phases", key="id", n=150)
    delta = C.crunch_phases_bans_delta(crunch_tables, batch, now=_now()).drop(
        "updated_at"
    )
    oracle = duck.execute(O.crunch_phases_bans_sql(batch))
    assert_same(delta, oracle, list(C.BANS_POINT_KEY))


def test_team_fame_matches_reference_literal(spark, crunch_tables, duck):
    for team_id in (1, 2):
        fame = C.crunch_team_fame(
            crunch_tables, team_id, today=F.lit("2026-08-10")
        )
        oracle = duck.execute(O.crunch_team_sql(team_id, "2026-08-10"))
        assert_same(fame, oracle, ["tm_id"])
