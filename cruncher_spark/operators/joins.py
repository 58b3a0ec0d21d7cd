"""Non-equi join operators: interval (series), band (skill tier), regex
(build matching), and pairwise self-join (hero-vs-hero).

All dimension sides in the reference are O(10-1000) rows (series, skill_tier,
build), so every non-equi join here broadcasts the dim and stays a
BroadcastNestedLoopJoin — no shuffle of the fact side, which is the only
strategy that survives a 100 TB fact table. The self-join is the one genuine
shuffle (both sides hash-partitioned on the match key); match cardinality is
tiny and uniform so no skew handling is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    point: str | Column,
    start: str,
    end: str,
    extra: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each fact to every interval row containing its time point.

    Reference analog: series membership
    ``p_s.created_at BETWEEN s.start AND s.end`` (crunch_global.sql:40) —
    overlapping series (daily/patch/all-time) each match, deliberately
    multiplying the fact. The dim is broadcast; the fact side is never moved.
    """
    point_col = F.col(point) if isinstance(point, str) else point
    cond = point_col.between(intervals[start], intervals[end])
    if extra is not None:
        cond = cond & extra
    return facts.join(F.broadcast(intervals), cond, how)


def binned_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    point: str | Column,
    start: str,
    end: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval containment join as a BIN-EXPLODED EQUI-JOIN — the
    large-×-large scale path :func:`interval_join` cannot take.

    The broadcast nested-loop form requires one side to fit in memory; when
    BOTH sides are fact-scale (e.g. sessions × maintenance windows over a
    100 TB log), the standard rewrite bins the numeric domain: each
    interval explodes to one row per ``bin_width``-sized bin it overlaps,
    each point maps to exactly ONE bin, and the join becomes a plain
    shuffle equi-join on the bin id with the precise
    ``point BETWEEN start AND end`` predicate re-checked after the match.
    Because a point's bin is unique, every qualifying (fact, interval)
    pair is produced exactly once — no post-join dedup.

    ``point``/``start``/``end`` must be integral (cast timestamps via
    ``unix_micros`` first). Pick ``bin_width`` near the typical interval
    length: explosion factor is ``len(interval)/bin_width + 1`` rows per
    interval (too small → interval-side blowup; too large → each bin pairs
    with many non-matching intervals and the BETWEEN filter does the work).
    Both inputs shuffle once, on the bin id, and AQE's skew-join splitting
    applies to hot bins — the knobs a 1000-executor range join needs.
    """
    def floordiv(c: Column) -> Column:
        # exact long floor-division (c - pmod is exact; the division of an
        # exactly-divisible long stays exact for any realistic quotient)
        c = c.cast("long")
        return ((c - F.pmod(c, F.lit(bin_width))) / bin_width).cast("long")

    point_col = F.col(point) if isinstance(point, str) else point
    pt = point_col.cast("long")
    ivals = intervals.withColumn(
        "__bin__",
        F.explode(F.sequence(floordiv(F.col(start)), floordiv(F.col(end)))),
    )
    pts = facts.withColumn("__bin__", floordiv(pt))
    out = pts.join(ivals, "__bin__", how).where(
        pt.between(F.col(start).cast("long"), F.col(end).cast("long"))
    )
    return out.drop("__bin__")


def band_join(
    facts: DataFrame,
    bands: DataFrame,
    value: str | Column,
    lo: str,
    hi: str,
    how: str = "inner",
) -> DataFrame:
    """Join a numeric fact value into its band row.

    Reference analog: skill-tier bands
    ``p.skill_tier BETWEEN st.start AND st.end`` (crunch_global.sql:45).
    """
    v = F.col(value) if isinstance(value, str) else value
    return facts.join(F.broadcast(bands), v.between(bands[lo], bands[hi]), how)


def regex_join(
    facts: DataFrame,
    patterns: DataFrame,
    text: str | Column,
    pattern_col: str,
    how: str = "inner",
) -> DataFrame:
    """Theta-join: fact row matches pattern row iff ``text RLIKE pattern``.

    Reference analog: the item-build match — for each build slot,
    ``p_s.item_grants RLIKE concat(:build_regex_start, item, ';', count,
    :build_regex_end)`` (crunch_global.sql:53-58). Dialect note: the
    reference's POSIX classes (``[[:digit:]]``, worker.js:199-201) must be
    written as Java ``\\d``/``[0-9]`` here (see
    :func:`cruncher_spark.functions.scalars.posix_to_java_regex`).

    Pattern tables are tiny (builds are hand-curated), so this is a broadcast
    nested-loop with the regex evaluated JVM-side inside codegen — no Python.
    """
    t = F.col(text) if isinstance(text, str) else text
    return facts.join(F.broadcast(patterns), F.rlike(t, patterns[pattern_col]), how)


def cooccurrence_pairs(
    df: DataFrame,
    group_key: str,
    id_col: str,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
    anti_reflexive: bool = True,
) -> DataFrame:
    """Self-join rows sharing ``group_key`` into ordered pairs (A,B), A != B.

    Reference analog: hero-vs-hero — every participant paired with every
    *other* participant of the same match
    (``p.match_api_id = p2.match_api_id AND p.api_id <> p2.api_id``,
    crunch_hero_vs_hero.sql:41). Emits both (A,B) and (B,A), matching the
    reference's asymmetric output (each side keeps its own dims).

    Scale note: shuffle-hash/sort-merge on ``group_key``; per-key cardinality
    is the match size (~10), so the join output is bounded at ~10x input and
    evenly distributed.
    """
    left = df.select([F.col(c).alias(f"{left_prefix}{c}") for c in df.columns])
    right = df.select([F.col(c).alias(f"{right_prefix}{c}") for c in df.columns])
    cond = F.col(f"{left_prefix}{group_key}") == F.col(f"{right_prefix}{group_key}")
    if anti_reflexive:
        cond = cond & (F.col(f"{left_prefix}{id_col}") != F.col(f"{right_prefix}{id_col}"))
    return left.join(right, cond, "inner")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    hot_keys: "list | None" = None,
    salt_cols: "list[str] | None" = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: shard hot join keys across ``n_salts`` reducers.

    A shuffle join hash-partitions both sides on ``key``; one pathological
    key (a null-ish default id, a celebrity user, an 'unknown' bucket) lands
    its entire fact volume on ONE reducer, and the stage runs at the speed
    of that straggler. The classic fix, implemented here: append a salt —
    fact rows of a hot key scatter over ``n_salts`` sub-keys (deterministic
    row-content hash, so replays shard identically), and the build side
    replicates each hot key's rows once per salt so every sub-key still
    finds its match. Join on ``(key, salt)``, drop the salt; the logical
    result is provably identical to the unsalted join.

    With ``hot_keys`` given, only those keys are salted/replicated and cold
    keys pay nothing — the shape AQE's runtime skew-join produces
    (``spark.sql.adaptive.skewJoin``), exposed here as an authoring-time
    operator for the cases AQE cannot see: skew that only materializes
    after a filter, or a build side too large for AQE's split heuristics.
    With ``hot_keys=None`` every key is salted — right side replicated
    ``n_salts``x, appropriate only for broadcast-small build sides.

    Scale note: replication cost is ``n_salts × |right rows in hot_keys|``
    — O(salts × hot set), independent of the fact side, so it stays bounded
    at 100 TB as long as the hot list is (by construction: a key list you
    can enumerate is small).
    """
    sc = [F.col(c) for c in (salt_cols or left.columns)]
    row_salt = F.pmod(F.xxhash64(*sc), F.lit(n_salts)).cast("int")
    all_salts = F.sequence(F.lit(0), F.lit(n_salts - 1))
    if hot_keys is not None:
        hot_l = F.col(key).isin(list(hot_keys))
        l_salt = F.when(hot_l, row_salt).otherwise(F.lit(0))
        r_salts = F.when(F.col(key).isin(list(hot_keys)), all_salts).otherwise(
            F.array(F.lit(0))
        )
    else:
        l_salt, r_salts = row_salt, all_salts
    l = left.withColumn("_salt", l_salt)
    r = right.withColumn("_salt", F.explode(r_salts))
    return l.join(r, [key, "_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: "list[str]",
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, ties included).

    Spark lacks a native as-of join; the scale-correct composition is the
    union-sort trick: tag both sides, union, and run one
    ``last(<right payload>, ignoreNulls) OVER (PARTITION BY by ORDER BY
    on, side ROWS UNBOUNDED PRECEDING)`` window. Cost is a single shuffle
    on the group key plus a per-group sort — linear, no range explosion,
    skew-safe under AQE. (A broadcast-range join would re-scan the right
    side per left row; ``merge_asof`` via applyInPandas would leave the
    JVM. Both lose to this at scale.)

    Output: every left column, plus ``<c><suffix>`` for each requested
    right column (NULL when no prior right row exists).
    """
    payload = F.struct(*[F.col(c) for c in right_cols])
    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            left.sparkSession.createDataFrame([], right.schema)
            .select(payload.alias("_r"))
            .schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.sparkSession.createDataFrame([], left.schema)
            .select(F.struct(*[F.col(c) for c in left.columns]).alias("_l"))
            .schema["_l"].dataType
        ).alias("_l"),
        payload.alias("_r"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return matched.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
