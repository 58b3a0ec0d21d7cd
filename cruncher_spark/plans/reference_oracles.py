"""Literal ANSI-SQL translations of the six reference crunch scripts.

These are the *fidelity oracles*: each function renders the reference's
SELECT (crunch_*.sql) with its OR-'all' dimension joins translated
literally — no grouping-sets rewrite — so DuckDB can compute the exact
rows the reference's MySQL would have produced for a batch. Our Spark
plans (cruncher_spark.plans.crunch) must match these row-for-row; that is
what proves the grouping-sets architecture preserves reference semantics.

Dialect notes (MySQL → DuckDB):
- ``rlike pat``            → ``regexp_matches(s, pat)`` (RE2 keeps POSIX classes)
- ``column_get(b,'k')``    → ``item_uses[k][1]`` (DuckDB map subscript → list)
- correlated ``IN (SELECT …)`` inside JOIN ON → ``EXISTS`` (same semantics)
- reserved words ``filter``/``match``/``end`` quoted.

Double measures are summed through DECIMAL(18,2) on both engines so the
comparison is exact, not ulp-dependent (fixture doubles are 2-decimal).
"""

from __future__ import annotations

from collections.abc import Sequence

#: worker.js:199-201 regex fragments, verbatim (DuckDB RE2 handles POSIX).
RE_START = "^([[:digit:]]+;[[:digit:]]+,)*("
RE_END = ")+(,[[:digit:]]+;[[:digit:]]+)*$"


def _ids(batch_ids: Sequence[str]) -> str:
    return ", ".join("'" + str(i).replace("'", "''") + "'" for i in batch_ids)


def _dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def _item_use_sums(item_ids: Sequence[int], src: str = "p_i.item_uses") -> str:
    return ",\n    ".join(
        f"CAST(SUM(COALESCE({src}[{k}][1], 0)) AS BIGINT) AS item_{k:03d}_use" for k in item_ids
    )


def _build_slots(grants: str = "p_s.item_grants") -> str:
    terms = []
    for n in range(1, 7):
        terms.append(
            f"(b.item_{n} IS NULL OR regexp_matches({grants}, "
            f"'{RE_START}' || b.item_{n} || ';' || b.item_{n}_count || '{RE_END}'))"
        )
    return " AND ".join(terms)


def crunch_global_sql(batch_ids: Sequence[str], item_ids: Sequence[int]) -> str:
    """crunch_global.sql:2-66 — the SELECT under the INSERT, literally."""
    return f"""
SELECT
    s.id AS series_id,
    f.id AS filter_id,
    h.id AS hero_id,
    gm.id AS game_mode_id,
    st.id AS skill_tier_id,
    b.id AS build_id,
    r.id AS role_id,
    1 AS hero2_id,
    1 AS role2_id,
    reg.id AS region_id,
    COUNT(p.id) AS played,
    CAST(SUM(CAST(p.winner AS INT)) AS BIGINT) AS wins,
    {_dsum("p.trueskill_delta", "trueskill_delta")},
    CAST(SUM(p_s.duration) AS BIGINT) AS time_spent,
    CAST(SUM(p_s.kills) AS BIGINT) AS kills,
    CAST(SUM(p_s.deaths) AS BIGINT) AS deaths,
    CAST(SUM(p_s.assists) AS BIGINT) AS assists,
    {_dsum("p_s.farm", "farm")},
    CAST(SUM(p_s.minion_kills) AS BIGINT) AS minion_kills,
    CAST(SUM(p_s.jungle_kills) AS BIGINT) AS jungle_kills,
    CAST(SUM(p_s.non_jungle_minion_kills) AS BIGINT) AS non_jungle_minion_kills,
    CAST(SUM(p_s.crystal_mine_captures) AS BIGINT) AS crystal_mine_captures,
    CAST(SUM(p_s.gold_mine_captures) AS BIGINT) AS gold_mine_captures,
    CAST(SUM(p_s.kraken_captures) AS BIGINT) AS kraken_captures,
    CAST(SUM(p_s.turret_captures) AS BIGINT) AS turret_captures,
    CAST(SUM(p_s.gold) AS BIGINT) AS gold,
    CAST(ROUND(SUM(CAST(p_s.impact_score AS DECIMAL(18,2)))) AS DOUBLE) AS impact_score,
    CAST(SUM(COALESCE(p_i.surrender, 0)) AS BIGINT) AS surrender,
    {_item_use_sums(item_ids)}
FROM participant p
JOIN participant_stats p_s ON (p_s.participant_api_id = p.api_id)
LEFT OUTER JOIN participant_items p_i ON (p_i.participant_api_id = p.api_id)
JOIN "filter" f ON (f.dimension_on = 'global' AND (f.name = 'all' OR EXISTS (
    SELECT 1 FROM global_point_filters gpf
    WHERE gpf.match_api_id = p.match_api_id AND gpf.filter_id = f.id)))
JOIN series s ON (p_s.created_at BETWEEN s.start AND s."end" AND s.dimension_on = 'global')
JOIN hero h ON (p.hero_id = h.id OR h.name = 'all')
JOIN role r ON (p.role_id = r.id OR r.name = 'all')
JOIN region reg ON (p.shard_id = reg.name OR reg.name = 'all')
JOIN game_mode gm ON ((p.game_mode_id = gm.id AND s.show_in_web = true) OR gm.name = 'all')
JOIN skill_tier st ON ((p.skill_tier BETWEEN st.start AND st."end" AND s.show_in_web = true) OR st.name = 'all')
JOIN build b ON ((
    s.show_in_web = true AND
    gm.name = 'all' AND
    p.game_mode_id IN (SELECT id FROM game_mode WHERE name IN ('casual', 'ranked')) AND
    reg.name = 'all' AND
    ({_build_slots()} AND b.dimension_on = 'global')
) OR b.name = 'all')
WHERE p.api_id IN ({_ids(batch_ids)})
GROUP BY s.id, f.id, h.id, gm.id, st.id, b.id, r.id, reg.id
"""


def crunch_player_sql(batch_ids: Sequence[str], item_ids: Sequence[int]) -> str:
    """crunch_player.sql:2-46 — constrained grouping (never hero x role)."""
    return f"""
SELECT
    p.player_api_id,
    s.id AS series_id,
    f.id AS filter_id,
    h.id AS hero_id,
    gm.id AS game_mode_id,
    r.id AS role_id,
    COUNT(p.id) AS played,
    CAST(SUM(CAST(p.winner AS INT)) AS BIGINT) AS wins,
    CAST(SUM(p_s.duration) AS BIGINT) AS time_spent,
    CAST(SUM(p_s.kills) AS BIGINT) AS kills,
    CAST(SUM(p_s.deaths) AS BIGINT) AS deaths,
    CAST(SUM(p_s.assists) AS BIGINT) AS assists,
    {_dsum("p_s.farm", "farm")},
    CAST(SUM(p_s.minion_kills) AS BIGINT) AS minion_kills,
    CAST(SUM(p_s.jungle_kills) AS BIGINT) AS jungle_kills,
    CAST(SUM(p_s.non_jungle_minion_kills) AS BIGINT) AS non_jungle_minion_kills,
    CAST(SUM(p_s.crystal_mine_captures) AS BIGINT) AS crystal_mine_captures,
    CAST(SUM(p_s.gold_mine_captures) AS BIGINT) AS gold_mine_captures,
    CAST(SUM(p_s.kraken_captures) AS BIGINT) AS kraken_captures,
    CAST(SUM(p_s.turret_captures) AS BIGINT) AS turret_captures,
    CAST(SUM(p_s.gold) AS BIGINT) AS gold,
    {_dsum("p_s.impact_score", "impact_score")},
    CAST(SUM(COALESCE(p_i.surrender, 0)) AS BIGINT) AS surrender,
    {_item_use_sums(item_ids)}
FROM participant p
JOIN participant_stats p_s ON (p_s.participant_api_id = p.api_id)
LEFT OUTER JOIN participant_items p_i ON (p_i.participant_api_id = p.api_id)
JOIN "filter" f ON (f.dimension_on = 'player' AND (f.name = 'all' OR EXISTS (
    SELECT 1 FROM global_point_filters gpf
    WHERE gpf.match_api_id = p.match_api_id AND gpf.filter_id = f.id)))
JOIN series s ON (p_s.created_at BETWEEN s.start AND s."end" AND s.dimension_on = 'player')
JOIN hero h ON (p.hero_id = h.id OR h.name = 'all')
JOIN role r ON ((p.role_id = r.id AND h.name = 'all') OR r.name = 'all')
JOIN game_mode gm ON (p.game_mode_id = gm.id OR gm.name = 'all')
WHERE p.api_id IN ({_ids(batch_ids)})
GROUP BY p.player_api_id, s.id, f.id, h.id, gm.id, r.id
"""


def crunch_hero_vs_hero_sql(batch_ids: Sequence[str], item_ids: Sequence[int]) -> str:
    """crunch_hero_vs_hero.sql:2-55 — pairwise self-join, exact hero/role."""
    return f"""
SELECT
    s.id AS series_id,
    f.id AS filter_id,
    h.id AS hero_id,
    r.id AS role_id,
    h2.id AS hero2_id,
    r2.id AS role2_id,
    (p.roster_api_id = p2.roster_api_id) AS played_with,
    gm.id AS game_mode_id,
    st.id AS skill_tier_id,
    reg.id AS region_id,
    COUNT(p.id) AS played,
    CAST(SUM(CAST(p.winner AS INT)) AS BIGINT) AS wins,
    {_dsum("p.trueskill_delta", "trueskill_delta")},
    CAST(SUM(p_s.duration) AS BIGINT) AS duration,
    CAST(SUM(p_s.kills) AS BIGINT) AS kills,
    CAST(SUM(p_s.deaths) AS BIGINT) AS deaths,
    CAST(SUM(p_s.assists) AS BIGINT) AS assists,
    {_dsum("p_s.farm", "farm")},
    CAST(SUM(p_s.minion_kills) AS BIGINT) AS minion_kills,
    CAST(SUM(p_s.jungle_kills) AS BIGINT) AS jungle_kills,
    CAST(SUM(p_s.non_jungle_minion_kills) AS BIGINT) AS non_jungle_minion_kills,
    CAST(SUM(p_s.crystal_mine_captures) AS BIGINT) AS crystal_mine_captures,
    CAST(SUM(p_s.gold_mine_captures) AS BIGINT) AS gold_mine_captures,
    CAST(SUM(p_s.kraken_captures) AS BIGINT) AS kraken_captures,
    CAST(SUM(p_s.turret_captures) AS BIGINT) AS turret_captures,
    CAST(SUM(p_s.gold) AS BIGINT) AS gold,
    {_dsum("p_s.impact_score", "impact_score")},
    CAST(SUM(COALESCE(p_i.surrender, 0)) AS BIGINT) AS surrender,
    {_item_use_sums(item_ids)}
FROM participant p
JOIN participant_stats p_s ON (p_s.participant_api_id = p.api_id)
LEFT OUTER JOIN participant_items p_i ON (p_i.participant_api_id = p.api_id)
JOIN participant p2 ON p.match_api_id = p2.match_api_id AND p.api_id <> p2.api_id
JOIN "filter" f ON (f.dimension_on = 'global' AND (f.name = 'all' OR EXISTS (
    SELECT 1 FROM global_point_filters gpf
    WHERE gpf.match_api_id = p.match_api_id AND gpf.filter_id = f.id)))
JOIN series s ON (p_s.created_at BETWEEN s.start AND s."end" AND s.dimension_on = 'global' AND s.show_in_web = true)
JOIN hero h ON p.hero_id = h.id
JOIN role r ON p.role_id = r.id
JOIN hero h2 ON p2.hero_id = h2.id
JOIN role r2 ON p2.role_id = r2.id
JOIN region reg ON (p.shard_id = reg.name OR reg.name = 'all')
JOIN game_mode gm ON ((p.game_mode_id = gm.id AND s.show_in_web = true) OR gm.name = 'all')
JOIN skill_tier st ON (p.skill_tier BETWEEN st.start AND st."end" OR st.name = 'all')
WHERE p.api_id IN ({_ids(batch_ids)})
GROUP BY s.id, f.id, h.id, r.id, h2.id, r2.id, played_with, gm.id, st.id, reg.id
"""


def crunch_phases_sql(batch_ids: Sequence[str], item_ids: Sequence[int]) -> str:
    """crunch_phases.sql:2-93 — per in-game slice rollup, 59 measures.

    The batch key is ``participant_phases.id`` (crunch_phases.sql:90
    ``-- TODO rename``). ``sum(p.winner)`` is uncast in the reference
    (MySQL coerces bool); rendered as the equivalent explicit cast.
    """
    from cruncher_spark.schemas import PARTICIPANT_PHASES, PHASE_MEASURES
    import pyspark.sql.types as T

    sums = []
    for c in PHASE_MEASURES:
        if isinstance(PARTICIPANT_PHASES[c].dataType, T.DoubleType):
            sums.append(_dsum(f"ph.{c}", c))
        else:
            sums.append(f"CAST(SUM(ph.{c}) AS BIGINT) AS {c}")
    sums_sql = ",\n    ".join(sums)
    return f"""
SELECT
    s.id AS series_id,
    f.id AS filter_id,
    h.id AS hero_id,
    gm.id AS game_mode_id,
    st.id AS skill_tier_id,
    1 AS build_id,
    r.id AS role_id,
    reg.id AS region_id,
    ph.start AS phase_start,
    ph."end" AS phase_end,
    COUNT(p.id) AS played,
    CAST(SUM(CAST(p.winner AS INT)) AS BIGINT) AS wins,
    0 AS time_spent,
    {sums_sql},
    {_item_use_sums(item_ids, src="ph.item_uses")}
FROM participant_phases ph
JOIN participant p ON ph.participant_api_id = p.api_id
JOIN "filter" f ON (f.dimension_on = 'global' AND (f.name = 'all' OR EXISTS (
    SELECT 1 FROM global_point_filters gpf
    WHERE gpf.match_api_id = p.match_api_id AND gpf.filter_id = f.id)))
JOIN series s ON (p.created_at BETWEEN s.start AND s."end" AND s.dimension_on = 'global')
JOIN hero h ON (p.hero_id = h.id OR h.name = 'all')
JOIN role r ON (p.role_id = r.id OR r.name = 'all')
JOIN region reg ON (p.shard_id = reg.name OR reg.name = 'all')
JOIN game_mode gm ON ((p.game_mode_id = gm.id AND s.show_in_web = true) OR gm.name = 'all')
JOIN skill_tier st ON ((p.skill_tier BETWEEN st.start AND st."end" AND s.show_in_web = true) OR st.name = 'all')
WHERE ph.id IN ({_ids(batch_ids)})
GROUP BY s.id, f.id, h.id, gm.id, st.id, r.id, reg.id, ph.start, ph."end"
"""


def crunch_phases_bans_sql(batch_ids: Sequence[str]) -> str:
    """crunch_phases_bans.sql:2-27 — ban counts; hero joined on ph.ban."""
    return f"""
SELECT
    s.id AS series_id,
    f.id AS filter_id,
    h.id AS hero_id,
    gm.id AS game_mode_id,
    st.id AS skill_tier_id,
    reg.id AS region_id,
    COUNT(p.id) AS played,
    0 AS banned
FROM participant_phases ph
JOIN participant p ON ph.participant_api_id = p.api_id
JOIN "filter" f ON (f.dimension_on = 'global' AND (f.name = 'all' OR EXISTS (
    SELECT 1 FROM global_point_filters gpf
    WHERE gpf.match_api_id = p.match_api_id AND gpf.filter_id = f.id)))
JOIN series s ON (p.created_at BETWEEN s.start AND s."end" AND s.dimension_on = 'global')
JOIN hero h ON (ph.ban = h.id OR h.name = 'all')
JOIN region reg ON (p.shard_id = reg.name OR reg.name = 'all')
JOIN game_mode gm ON ((p.game_mode_id = gm.id AND s.show_in_web = true) OR gm.name = 'all')
JOIN skill_tier st ON ((p.skill_tier BETWEEN st.start AND st."end" AND s.show_in_web = true) OR st.name = 'all')
WHERE ph.id IN ({_ids(batch_ids)})
GROUP BY s.id, f.id, h.id, gm.id, st.id, reg.id
"""


def crunch_team_sql(team_id: int, today: str) -> str:
    """crunch_team.sql:3-40 — the fame subquery (UPDATE's source), with
    CURDATE() pinned to ``today`` ('YYYY-MM-DD') for determinism."""
    return f"""
SELECT
    tm.id AS tm_id,
    CAST(SUM(
        (CASE
            WHEN tm_cnt=1 THEN CAST(0.33 AS DECIMAL(10,2))
            WHEN tm_cnt=2 THEN CAST(0.66 AS DECIMAL(10,2))
            WHEN tm_cnt=3 THEN CAST(1.33 AS DECIMAL(10,2))
        END) *
        (CASE
            WHEN p.winner=TRUE THEN CAST(1 AS DECIMAL(10,2))
            WHEN p.winner=FALSE THEN CAST(0.7 AS DECIMAL(10,2))
        END) *
        (CASE
            WHEN tm.status='initiate' THEN 10
            WHEN tm.status='member' THEN 75
            WHEN tm.status='veteran' THEN 100
            WHEN tm.status='officer' THEN 125
            WHEN tm.status='leader' THEN 125
        END)
    ) AS DOUBLE) AS fame
FROM (
    SELECT
        t.id AS t_id,
        m.api_id AS m_api_id,
        COUNT(tm.id) AS tm_cnt
    FROM participant p
    JOIN player pl ON p.player_api_id = pl.api_id
    JOIN team_membership tm ON pl.api_id = tm.player_api_id
    JOIN team t ON tm.team_id = t.id
    JOIN roster r ON p.roster_api_id = r.api_id
    JOIN "match" m ON r.match_api_id = m.api_id
    WHERE t.id = {team_id}
    AND p.created_at > CAST('{today}' AS TIMESTAMP) - INTERVAL 7 DAY
    GROUP BY t.id, m.api_id, r.id
) AS cnt_by_m
JOIN participant p ON p.match_api_id = cnt_by_m.m_api_id
JOIN team_membership tm ON cnt_by_m.t_id = tm.team_id AND tm.player_api_id = p.player_api_id
GROUP BY tm.id
"""
