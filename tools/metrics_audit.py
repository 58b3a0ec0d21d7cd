"""Executed-plan metrics audit: MEASURED shuffle/spill/memory evidence.

PLANS.md proves plan *shapes*; this tool proves plan *behavior*: after
running each registered query to completion it walks the AQE-final
executed-plan tree and reads the SQLMetric accumulators Spark populated
during execution:

- **shuffle MB written** — total bytes that crossed an Exchange. The
  one number that decides 100 TB network cost; a query whose shuffle
  bytes grow slower than its input is reading/aggregating before it
  exchanges (the design target).
- **spill MB** — memory+disk spill across aggregates/sorts/joins. Must
  be 0 at bench scale; nonzero means partitions outgrew executor memory
  and the 1000-executor run will thrash.
- **peak task memory MB** — max single-operator peak across the plan;
  bounds the per-task memory a 100x scale-up must still fit.
- **output rows** — root-operator row count (sanity vs the oracle gate).

Run at two SF dirs and METRICS.md additionally reports the per-query
shuffle-bytes RATIO — a noise-free scaling signal (wall-clock ratios in
SCALING.md carry scheduler jitter; byte counts are exact).

Usage:
    python tools/metrics_audit.py                       # sf0.01 + sf0.1
    python tools/metrics_audit.py SF_DIR [SF_DIR2] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cruncher_spark.plans import audit_form_map, query_map
from cruncher_spark.session import get_spark

#: node-local metric keys summed across the plan (SQLMetric internal names)
_SUM_KEYS = {
    "shuffleBytesWritten": "shuffle_bytes",
    "spillSize": "spill_bytes",
    "memoryBytesSpilled": "spill_bytes",
    "diskBytesSpilled": "spill_bytes",
}
_MAX_KEYS = {"peakMemory": "peak_mem_bytes"}

#: measured explanations for queries whose byte ratio exceeds the screen
#: for reasons that are NOT data-superlinearity (kept with the flag so
#: the table stays honest — the flag is a screen, these are the verdicts)
_NOTES = {
    "dedup_containment": (
        "pair volume before the tau filter is Σ_shingle df² — on the "
        "fixture's ~40-word vocabulary BACKGROUND shingle sharing between "
        "unrelated docs grows with corpus² until the df-cap bites "
        "(df > 1000 shingles are excluded, so the worst offenders are "
        "already capped out here); on a realistic vocabulary unrelated "
        "docs share almost nothing and the curve is linear — measured in "
        "STRESS.md's unique-content section (padded vocabulary, x100)"
    ),
    "pagerank_topk": (
        "rank-contribution exchanges are vertex-keyed partial aggregates: "
        "at sf0.01 AQE coalesces the map side to one partition so combine "
        "collapses to |V| rows (measured 1,889), at sf0.1 it emits "
        "per-partition partials (191,799 ≤ parts×|V|); the asymptotic "
        "per-stage bound is min(edges, parts×|V|) — cluster-layout-"
        "bounded, not data-superlinear (edges themselves grew ×10.2)"
    ),
    "quality_weighted_sample": (
        "RE-DIAGNOSED r13 (VERDICT r12 next #5): the r11 partial-agg-fill "
        "flag is RETIRED by the r12 layout change — the executed path "
        "scores the trainer's id-pre-partitioned lazy checkpoint, so the "
        "margin groupBy(doc_id) runs exchange-free and the audited row "
        "now measures 0 shuffle bytes at both scales (training exchanges "
        "land at checkpoint time, outside the audited plan; wall clock "
        "and STRESS.md carry that cost). The mean-score normalizer and "
        "acceptance filter ride the same layout (one-row broadcast "
        "aggregate, map-side filter)"
    ),
    "quality_pr_curve": (
        "x11.63 vs the x11.0 decade allowance — measured on the LAZY "
        "AUDIT FORM (checkpoint=False), which deliberately exposes the "
        "full multi-round training plan: its per-round doc-keyed margin "
        "aggregates pay map-side partial-agg fill bounded by "
        "parts×|docs| (layout-bounded, not data-superlinear; the "
        "training sibling logreg_quality sits at x10.52 on the identical "
        "lazy plan). The EXECUTED path does not have this shape since "
        "r12/r13: margins ride the id-pre-partitioned feature checkpoint "
        "exchange-free, and the threshold sweep's groupBy(t) collapses "
        "map-side to |thresholds| rows per partition — "
        "quality_weighted_sample's executed row (0 bytes, x1.0) is the "
        "same machinery measured directly. STRESS.md's replication row "
        "measures the two-decade curve at x90.8 bytes for x100 data"
    ),
    "triangle_count": (
        "same partial-agg fill effect on the degree/orientation "
        "exchanges (3,395 → 180,067 rows ≤ parts×|V| bound), plus the "
        "wedge set is O(m^1.5) BY DESIGN (degree-ordered enumeration) — "
        "the documented cost of exact triangle counting, not a plan "
        "defect"
    ),
    "dedup_lsh_eval": (
        "0-byte rows: the gate localCheckpoints its one-row summary so "
        "both persisted inputs can be released before the plan escapes "
        "(the r6 cache-leak discipline), so the audited plan reads the "
        "checkpoint; the shuffles it would show are exactly "
        "dedup_minhash_lsh's (bands) + dedup_ngram_jaccard's (exact "
        "truth) — both measured on their own rows; wall clock is the "
        "signal here, and STRESS.md carries the unique-content curve"
    ),
    "dedup_cross_snapshot": (
        "0-byte rows for the same localCheckpoint reason (the gate "
        "checkpoints its bounded 100-row verdict; since r13 the shingle "
        "tables are not persisted at all — narrow re-derivations that "
        "ReuseExchange dedups, jobs 19→16); the candidate join "
        "broadcasts the snapshot side by construction "
        "(lsh_cross_candidates), so the only corpus-sized exchange is "
        "the old side's band shuffle — dedup_minhash_lsh's measured "
        "shape; STRESS.md carries the unique-content curve"
    ),
}


def _iter_nodes(jnode, seen: set):
    """Yield every SparkPlan node in the AQE-final tree exactly once.

    QueryStageExec wraps materialized stages; AdaptiveSparkPlanExec holds
    the final tree in executedPlan(); ReusedExchange/ReusedSubquery point
    back at nodes already visited (dedup by identity so reused exchange
    bytes count once, matching what the cluster actually moved)."""
    oid = jnode.id()
    if oid in seen:
        return
    seen.add(oid)
    yield jnode
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _iter_nodes(jnode.executedPlan(), seen)
        return
    if cls.endswith("QueryStageExec"):
        yield from _iter_nodes(jnode.plan(), seen)
        return
    if cls == "InMemoryTableScanExec":
        # persisted subtrees: the cache's OWN exchanges execute inside
        # this plan's first job but live under the InMemoryRelation, not
        # as children — without descending, every query that persists an
        # intermediate (the minhash family) reports 0 shuffle bytes.
        # Two scans of one relation share node ids -> seen-set dedup
        # counts the cached exchanges once.
        try:
            yield from _iter_nodes(
                jnode.relation().cachedPlan(), seen
            )
        except Exception:
            pass
        return
    ch = jnode.children()
    for i in range(ch.size()):
        yield from _iter_nodes(ch.apply(i), seen)


def _metrics_of(jnode) -> dict[str, int]:
    out: dict[str, int] = {}
    it = jnode.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def audit_one(name: str, fn, spark, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    # collect() (not count(), which builds a derived plan) runs THIS plan
    # to completion; SQLMetric accumulators fill during execution
    rows = len(df.collect())
    root = df._jdf.queryExecution().executedPlan()
    agg = {"shuffle_bytes": 0, "spill_bytes": 0, "peak_mem_bytes": 0}
    for node in _iter_nodes(root, set()):
        for k, v in _metrics_of(node).items():
            if k in _SUM_KEYS and v > 0:
                agg[_SUM_KEYS[k]] += v
            elif k in _MAX_KEYS and v > 0:
                agg[_MAX_KEYS[k]] = max(agg[_MAX_KEYS[k]], v)
    agg["rows"] = rows
    spark.catalog.clearCache()
    return agg


HEADER = """# METRICS — executed-plan metrics audit (measured scale evidence)

Generated by `tools/metrics_audit.py`. Unlike PLANS.md (plan shapes)
these are the SQLMetric accumulator values Spark recorded while RUNNING
each registered query: total bytes written across every Exchange, spill,
and the peak single-operator task memory. The ratio column compares
shuffle bytes across the two scale factors — an exact, jitter-free
scaling signal (x10 data should move <= x10 bytes; less means the query
aggregates before it exchanges).

Flags: **SPILL** = nonzero spill at bench scale (partitions outgrow
memory; will thrash at 100 TB); **SUPER** = shuffle bytes grew faster
than the data (x{ratio_limit} allowed for x10 data).

| query | rows@{sf_b} | shuffle MB @{sf_a} | shuffle MB @{sf_b} | bytes ratio | spill MB | peak task MB |
|---|---|---|---|---|---|---|
"""


def main() -> None:
    args = sys.argv[1:]
    dirs = [a for a in args if "/" in a]
    names = [a for a in args if "/" not in a]
    sf_a = dirs[0] if dirs else "/root/testdata/sf0.01"
    sf_b = dirs[1] if len(dirs) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("metrics-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    qmap.update(audit_form_map())  # audit the lazy forms' real plans
    if names:
        qmap = {n: qmap[n] for n in names}

    mb = lambda b: round(b / 1e6, 2)  # noqa: E731
    # x10 data -> allow x11 bytes: shuffle framing + partial-agg fill are
    # per-partition overheads that inflate the LARGER run slightly;
    # genuine superlinear shapes blow well past this
    ratio_limit = 11.0
    results = {}
    for name, fn in sorted(qmap.items()):
        try:
            a = audit_one(name, fn, spark, sf_a)
            b = audit_one(name, fn, spark, sf_b)
        except Exception as e:  # keep auditing; record the failure
            results[name] = {"err": repr(e)[:120]}
            print(f"{name:28s} ERROR {repr(e)[:80]}", flush=True)
            continue
        ratio = (
            round(b["shuffle_bytes"] / a["shuffle_bytes"], 2)
            if a["shuffle_bytes"]
            else None
        )
        spill = a["spill_bytes"] + b["spill_bytes"]
        results[name] = {
            "rows_b": b["rows"],
            "sh_a": mb(a["shuffle_bytes"]),
            "sh_b": mb(b["shuffle_bytes"]),
            "ratio": ratio,
            "spill": mb(spill),
            "peak": mb(max(a["peak_mem_bytes"], b["peak_mem_bytes"])),
        }
        flag = ""
        if spill:
            flag += " SPILL"
        if ratio and ratio > ratio_limit:
            flag += " SUPER"
        print(
            f"{name:28s} sh {results[name]['sh_a']:>8} -> "
            f"{results[name]['sh_b']:>8} MB  ratio {ratio}  "
            f"spill {results[name]['spill']} MB{flag}",
            flush=True,
        )

    lines = [
        HEADER.format(
            sf_a=Path(sf_a).name, sf_b=Path(sf_b).name, ratio_limit=ratio_limit
        )
    ]
    n_spill = n_super = 0
    for name, r in sorted(results.items()):
        if "err" in r:
            lines.append(f"| {name} | ERROR: {r['err']} | | | | | |\n")
            continue
        flags = []
        if r["spill"]:
            flags.append("**SPILL**")
            n_spill += 1
        if r["ratio"] and r["ratio"] > ratio_limit:
            flags.append("**SUPER**")
            n_super += 1
        ratio = f"x{r['ratio']}" if r["ratio"] is not None else "— (0 bytes)"
        lines.append(
            f"| {name}{' ' + ' '.join(flags) if flags else ''} | {r['rows_b']}"
            f" | {r['sh_a']} | {r['sh_b']} | {ratio} | {r['spill']}"
            f" | {r['peak']} |\n"
        )
    noted = [n for n in sorted(results) if n in _NOTES and "err" not in results[n]]
    if noted:
        lines.append("\n## Flag verdicts (measured causes)\n\n")
        for n in noted:
            lines.append(f"- **{n}**: {_NOTES[n]}\n")
    lines.append(
        f"\n**Summary: {len(results)} queries audited, {n_spill} with spill,"
        f" {n_super} superlinear in shuffle bytes.**\n"
    )
    (Path(__file__).resolve().parent.parent / "METRICS.md").write_text(
        "".join(lines)
    )
    print("wrote METRICS.md")


if __name__ == "__main__":
    main()
