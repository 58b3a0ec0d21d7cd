"""Edit-distance fuzzy join via symmetric deletion variants (SymSpell).

Record linkage — joining two string sets on ``levenshtein(a, b) <= k`` —
is a theta join: the naive form is a cartesian product with a per-pair
dynamic-programming distance check, which is the textbook scale-killer
(O(N^2) pairs for a self-join over a 100 TB corpus of names/titles).

The symmetric-deletion rewrite (Garbe's SymSpell, public domain algorithm)
turns it into a plain EQUI-join: two strings are within edit distance 1
iff they share a *deletion variant* — the string itself or the string
with one character removed:

- equal strings share the identity variant;
- a single insertion/deletion means one string IS a deletion variant of
  the other;
- a single substitution means deleting the differing position from each
  side yields the same string.

So exploding every name into its ``1 + len`` variants and equi-joining on
the variant produces a candidate superset, and one ``levenshtein`` check
on the matched pairs (built-in, JVM-side) removes false positives (the
variant join can over-match transposition-adjacent pairs at distance 2).
Cost: O(N * avg_len) exploded rows and a hash shuffle on the variant —
linear in data size, no cartesian product, fully whole-stage-codegen.

The reference has no fuzzy matching (its joins are equi/band/regex —
SURVEY §2.3); this is a beyond-reference curation operator in the same
family as the n-gram dedup prefix filter (operators/dedup.py): exact
semantics, candidate generation by equi-join, verify only candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: str) -> F.Column:
    """Array of deletion variants of ``col``: the string plus every
    single-character-deleted form. Pure JVM higher-order functions —
    no Python on the data path."""
    dels = F.expr(
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1)))"
    )
    return F.array_distinct(F.concat(F.array(F.col(col)), dels))


def edit_distance_self_join(
    names: DataFrame, col: str, max_dist: int = 1
) -> DataFrame:
    """All unordered pairs of distinct ``col`` values within edit
    distance ``max_dist`` (currently 1 — the single-deletion variant
    index; distance k generalizes to k-deletion variants at
    O(len^k) variants/string, same join shape).

    Output: ``(name_a, name_b, dist)`` with ``name_a < name_b``.
    """
    if max_dist != 1:
        raise NotImplementedError(
            "only max_dist=1 is indexed; deeper distances need k-deletion "
            "variants (same equi-join shape, O(len^k) variants per string)"
        )
    distinct = names.select(col).distinct()
    exploded = distinct.select(
        F.col(col).alias("name"),
        F.explode(deletion_variants(col)).alias("variant"),
    )
    left = exploded.select(F.col("name").alias("name_a"), "variant")
    right = exploded.select(F.col("name").alias("name_b"), "variant")
    pairs = (
        left.join(right, "variant")
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return pairs.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).where(F.col("dist") <= max_dist)
