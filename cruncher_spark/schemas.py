"""Explicit StructTypes for every cruncher-shaped table.

Reconstructed from each column the reference SQL touches (FIXTURES.md; the
reference's ORM schema lives in a sibling repo loaded at worker.js:72 and is
not in the snapshot). No schema-on-read inference anywhere — every source
and point table has a pinned schema, matching the reference's fixed-schema
posture (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T


_ATOMIC = {
    "STRING": T.StringType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "DOUBLE": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
}


def _parse_type(s: str) -> T.DataType:
    s = s.strip()
    if s.upper().startswith("MAP<"):
        inner = s[4:-1]
        k, v = inner.split(",", 1)
        return T.MapType(_parse_type(k), _parse_type(v))
    return _ATOMIC[s.upper()]


def _schema(ddl: str) -> T.StructType:
    """Session-free DDL parse (StructType.fromDDL needs a live SparkContext,
    which would make importing this module require a session)."""
    fields, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    fields.append("".join(cur))
    out = []
    for f in fields:
        name, typ = f.strip().split(" ", 1)
        out.append(T.StructField(name, _parse_type(typ), True))
    return T.StructType(out)


# --- fact tables -----------------------------------------------------------

PARTICIPANT = _schema(
    "id BIGINT, api_id STRING, match_api_id STRING, player_api_id STRING,"
    " roster_api_id STRING, hero_id BIGINT, role_id BIGINT, shard_id STRING,"
    " game_mode_id BIGINT, skill_tier INT, winner BOOLEAN,"
    " trueskill_delta DOUBLE, created_at TIMESTAMP"
)

PARTICIPANT_STATS = _schema(
    "participant_api_id STRING, created_at TIMESTAMP, duration INT, kills INT,"
    " deaths INT, assists INT, farm DOUBLE, minion_kills INT, jungle_kills INT,"
    " non_jungle_minion_kills INT, crystal_mine_captures INT,"
    " gold_mine_captures INT, kraken_captures INT, turret_captures INT,"
    " gold INT, impact_score DOUBLE, item_grants STRING"
)

PARTICIPANT_ITEMS = _schema(
    "participant_api_id STRING, surrender INT, item_uses MAP<INT,INT>"
)

PARTICIPANT_PHASES = _schema(
    "id STRING, participant_api_id STRING, start INT, end INT, ban BIGINT,"
    " item_uses MAP<INT,INT>,"
    " kills INT, deaths INT, assists INT, farm DOUBLE, minion_kills INT,"
    " jungle_kills INT, non_jungle_minion_kills INT, crystal_mine_captures INT,"
    " gold_mine_captures INT, kraken_captures INT, turret_captures INT, gold INT,"
    + ",".join(f" {c} DOUBLE" for c in (
        "dmg_true_hero", "dmg_true_kraken", "dmg_true_turret",
        "dmg_true_vain_turret", "dmg_true_others",
        "dmg_dealt_hero", "dmg_dealt_kraken", "dmg_dealt_turret",
        "dmg_dealt_vain_turret", "dmg_dealt_others",
        "dmg_rcvd_dealt_hero", "dmg_rcvd_true_hero",
        "dmg_rcvd_dealt_others", "dmg_rcvd_true_others",
    ))
    + ", ability_a_level INT, ability_b_level INT, ability_c_level INT,"
    " hero_level INT, ability_a_use INT, ability_b_use INT, ability_c_use INT,"
    + ",".join(f" {c} DOUBLE" for c in (
        "ability_a_damage_true", "ability_a_damage_dealt",
        "ability_b_damage_true", "ability_b_damage_dealt",
        "ability_c_damage_true", "ability_c_damage_dealt",
        "ability_perk_damage_true", "ability_perk_damage_dealt",
        "ability_aa_damage_true", "ability_aa_damage_dealt",
        "ability_aacrit_damage_true", "ability_aacrit_damage_dealt",
        "heal_heal_hero", "heal_healed_hero", "heal_heal_ally",
        "heal_healed_ally", "heal_heal_other", "heal_healed_other",
        "heal_rcvd_heal_hero", "heal_rcvd_healed_hero",
        "heal_rcvd_healed_vamp", "heal_rcvd_heal_ally",
        "heal_rcvd_healed_ally", "heal_rcvd_heal_other",
        "heal_rcvd_healed_other",
    ))
)

#: the 59 additive phase measures summed by crunch_phases.sql:20-78
PHASE_MEASURES: tuple[str, ...] = tuple(
    f.name
    for f in PARTICIPANT_PHASES.fields
    if f.name
    not in ("id", "participant_api_id", "start", "end", "ban", "item_uses")
)

# --- dimension tables (each carries one name='all' row) --------------------

DIM_SIMPLE = _schema("id BIGINT, name STRING")  # hero, role, region
GAME_MODE = DIM_SIMPLE
SKILL_TIER = _schema("id BIGINT, name STRING, start INT, end INT")
SERIES = _schema(
    "id BIGINT, name STRING, dimension_on STRING, start TIMESTAMP,"
    " end TIMESTAMP, show_in_web BOOLEAN"
)
FILTER = _schema("id BIGINT, name STRING, dimension_on STRING")
BUILD = _schema(
    "id BIGINT, name STRING, dimension_on STRING,"
    + ",".join(f" item_{i} INT, item_{i}_count INT" for i in range(1, 7))
)
ITEM = _schema("id INT, name STRING, is_activable BOOLEAN")

GLOBAL_POINT_FILTERS = _schema("match_api_id STRING, filter_id BIGINT")

# --- team-fame tables (crunch_team.sql) ------------------------------------

PLAYER = _schema("api_id STRING, name STRING")
TEAM = _schema("id BIGINT, name STRING")
TEAM_MEMBERSHIP = _schema(
    "id BIGINT, team_id BIGINT, player_api_id STRING, status STRING, fame DOUBLE"
)
ROSTER = _schema("api_id STRING, id BIGINT, match_api_id STRING")
MATCH = _schema("api_id STRING")

#: table name → schema, for loaders/generators
ALL_TABLES: dict[str, T.StructType] = {
    "participant": PARTICIPANT,
    "participant_stats": PARTICIPANT_STATS,
    "participant_items": PARTICIPANT_ITEMS,
    "participant_phases": PARTICIPANT_PHASES,
    "hero": DIM_SIMPLE,
    "role": DIM_SIMPLE,
    "region": DIM_SIMPLE,
    "game_mode": GAME_MODE,
    "skill_tier": SKILL_TIER,
    "series": SERIES,
    "filter": FILTER,
    "build": BUILD,
    "item": ITEM,
    "global_point_filters": GLOBAL_POINT_FILTERS,
    "player": PLAYER,
    "team": TEAM,
    "team_membership": TEAM_MEMBERSHIP,
    "roster": ROSTER,
    "match": MATCH,
}
