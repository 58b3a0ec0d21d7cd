"""Bloom-filter semi-join pruning — the runtime-row-filter pattern from
public primitives.

Spark's adaptive runtime filtering injects a bloom filter from the build
side of a join into the probe-side scan, but the aggregate behind it
(`bloom_filter_agg`) is not exposed as a public function in Spark 4. This
module builds the same structure from public expressions only:

- build: ``xxhash64(key, seed_i) % n_bits`` positions, OR-folded into a
  fixed-size bitmap with a distributed ``bit_or`` aggregate (map-side
  combined; the shuffle moves at most ``n_bits/64`` word rows per
  partition, regardless of key count);
- probe: the bitmap ships to every task as a single array literal
  (``n_bits/64`` longs — 8 KiB at the default 64Ki bits) and the
  membership test is a pure whole-stage-codegen expression, so the filter
  runs inside the scan stage before any exchange.

Why this matters at 100 TB: a semi-join against a key set too large to
broadcast normally shuffles the *entire* fact table on the join key. The
bloom filter is ~10 bits/key instead of 8+ bytes/key, so a key set that
exceeds the broadcast-join threshold by 50x still fits in a literal; the
fact side is pruned to ~selectivity x rows *before* the shuffle, and the
exact semi-join that removes bloom false positives only pays for
survivors. False negatives are impossible by construction (every inserted
key sets all its bits), so the composed operator returns exactly the
semi-join result — which is what the DuckDB oracle checks.

Reference analog: the batch-key ``IN`` filter (worker.js:151-154 builds the
1000-id list; crunch_global.sql:9 ``participant.id IN (...)``) — the
reference interpolates literal id lists because MySQL has no better tool;
at lake scale the same intent is a runtime filter ahead of the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default sizing: 64Ki bits / 5 hashes ≈ 1% false positives at ~6.5k keys,
#: degrading gracefully (the exact re-join keeps results correct at any fpp).
N_BITS = 1 << 16
N_HASHES = 5


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The k bit positions for a key: seed-varied xxhash64, mod table size.

    ``xxhash64`` is engine-local (not oracle-mirrored) — allowed here
    because the bitmap never influences final results, only which rows
    reach the exact re-join.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, *, n_bits: int = N_BITS, n_hashes: int = N_HASHES
) -> list[int]:
    """Distributed bloom build → bitmap as ``n_bits/64`` Python ints.

    One explode (k rows per key, map-local) + one ``bit_or`` aggregate
    (map-side combined, at most ``n_bits/64`` groups) + a bounded collect
    of the aggregated words — never of the keys themselves. OR is
    commutative/associative, so the bitmap is deterministic under any
    partitioning.
    """
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, n_bits, n_hashes))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # classic-API shiftleft takes a literal bit count; a column-valued
            # shift needs the SQL form
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (n_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], *, n_bits: int = N_BITS, n_hashes: int = N_HASHES
) -> Column:
    """Membership test as a single codegen-able boolean expression.

    The bitmap is one array<long> literal; each of the k probes is
    ``element_at`` + shift + mask. NULL keys test false (they cannot match
    an inner/semi join anyway).

    The array is emitted as ONE SQL string parsed in a single pass — the
    per-element ``F.lit`` form costs one py4j round trip per word (1024
    at the default sizing), the same driver-time trap the IVF centroid
    literals hit (measured ~1 s of plan-build per call there).
    """
    words = F.expr(
        "array(" + ", ".join(f"{w}L" for w in bitmap) + ")"
    )
    cond = F.lit(True)
    for pos in _positions(key, n_bits, n_hashes):
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        # column-valued shift amount → SQL form (classic shiftrightunsigned
        # only accepts a literal bit count)
        bit = F.call_function(
            "shiftrightunsigned", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = cond & (bit == F.lit(1).cast("long"))
    return F.when(key.isNull(), F.lit(False)).otherwise(cond)


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str | None = None,
    *,
    n_bits: int = N_BITS,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """Exact semi-join with bloom pre-pruning of the fact side.

    Result is identical to ``fact.join(keys, on, "left_semi")`` — the
    bloom pass only decides which fact rows pay the shuffle. The exact
    re-join removes false positives; false negatives cannot occur.
    """
    keys_key = keys_key or fact_key
    key_set = keys.select(F.col(keys_key).alias(keys_key)).distinct()
    bitmap = bloom_build(key_set, keys_key, n_bits=n_bits, n_hashes=n_hashes)
    pruned = fact.filter(
        bloom_might_contain(F.col(fact_key), bitmap, n_bits=n_bits, n_hashes=n_hashes)
    )
    cond = pruned[fact_key] == key_set[keys_key]
    return pruned.join(key_set, cond, "left_semi")
