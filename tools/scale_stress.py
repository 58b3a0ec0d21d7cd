"""Scale-stress evidence: measured x10 and x100 blow-ups of sf0.1.

SCALING.md and METRICS.md compare sf0.01 -> sf0.1 — one decade. This
tool manufactures two more decades by replicating the driver's sf0.1
tables with id offsets (documents, embeddings, events — the tables the
LLM-pipeline and event-analytics surfaces read) and re-measuring a
representative query set at x1 / x10 / x100, recording wall clock AND
shuffle bytes (the jitter-free signal) into STRESS.md.

The blow-up is DERIVED data for scaling evidence only — correctness
gates always run against the driver's own parquet. Replication
preserves each table's value distributions exactly (every replica is
the original with shifted ids), which is the right shape for
aggregation/join/window/sketch/ML queries: the group-key, term, and
user domains grow linearly like a real corpus. It is the WRONG shape
for similarity-sensitive queries — every document would acquire
R-1 exact near-duplicates, a quadratic pair volume BY CONSTRUCTION of
the data (any all-pairs-within-group algorithm is quadratic on it) —
so near-dup gates are deliberately excluded here; their scale safety
is evidenced by candidate-bounded plan shapes (PLANS.md) and byte
ratios (METRICS.md) instead. image_dhash_dedup IS included because
its collapse-identical-first design makes replicated images cheap —
the distinct-hash table stays constant-size while members grow.

Usage:
    python tools/scale_stress.py              # build + run, write STRESS.md
    python tools/scale_stress.py --build-only
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
BASE = Path("/tmp/stress")
REPLICAS = {"x10": 10, "x100": 100}

#: id columns shifted per replica + the modulus the offset must respect
#: (documents: doc_id % 3 kind assignment keeps its balance; orders:
#: o_custkey % 50 gate fractions AND % 3 patterns stay constant)
ID_COLS = {
    "documents": (["doc_id"], 3),
    "embeddings": (["vec_id"], 3),
    "events": (["event_id", "user_id"], 3),
    "orders": (["o_orderkey", "o_custkey"], 150),
}

#: queries measured at every scale: aggregation, retrieval, iterative
#: ML, clustering, event analytics, sketches, split audit, perceptual
#: dedup. Near-dup text/embedding gates excluded (see module doc).
QUERIES = [
    "mixture_weights",
    "doc_chunking",
    "doc_rarity",
    "doc_perplexity",
    "bm25_topk",
    "tfidf_topk",
    "logreg_quality",
    "kmeans_clusters",
    "split_leakage",
    "image_dhash_dedup",
    "ann_ivf_topk",
    "session_windows",
    "global_running_sum",
    "hll_user_distinct",
    "cms_heavy_hitters",
    "window_suite",
]


#: measured explanations for rows whose numbers need context (the
#: metrics_audit._NOTES convention: the flag is a screen, these are the
#: verdicts)
_NOTES = {
    "split_leakage": (
        "replication manufactures the leakage it audits: every document "
        "gains R-1 exact duplicates, so the crossing-group join grows "
        "from ~0% of the corpus at x1 to 100% at x100 — byte growth is "
        "linear in LEAKED docs (never super-linear in corpus size), but "
        "the near-zero x1 baseline makes the ratio meaningless; kept as "
        "the worst-case everything-leaks stress"
    ),
    "logreg_quality": (
        "0-byte rows: the measured plan reads the eagerly-checkpointed "
        "feature table, so training exchanges land at checkpoint time "
        "outside the audited plan; wall clock is the signal here"
    ),
    "image_dhash_dedup": (
        "constant shuffle bytes and constant output rows at every scale "
        "— the collapse-identical-first design working as intended: "
        "replicated images all fold into the same distinct-hash table "
        "(458 rows) before anything shuffles; wall grows linearly with "
        "the decode pass"
    ),
    "ann_ivf_topk": (
        "wall grows faster than the corpus because this GATE derives its "
        "query set from the corpus, so x100 data also means x100 queries "
        "— scored pairs are Q x N x (n_probe/cells); shuffle bytes stay "
        "linear (x83.9) because each query's candidates are cell-bounded; "
        "in production the query set is driver-sized by contract "
        "(operators/similarity.py ann_ivf_topk docstring)"
    ),
}


def _offset_for(tbl: pa.Table, cols: list[str], mod: int) -> int:
    m = 0
    for c in cols:
        m = max(m, pc.max(tbl[c]).as_py() or 0)
    return (m + mod) // mod * mod


def build(dst: Path, replicas: int) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    for name, (cols, mod) in ID_COLS.items():
        out = dst / f"{name}.parquet"
        if out.exists():
            continue
        tbl = pq.read_table(SRC / f"{name}.parquet")
        off = _offset_for(tbl, cols, mod)
        parts = []
        for r in range(replicas):
            if r == 0:
                parts.append(tbl)
                continue
            shifted = tbl
            for c in cols:
                idx = shifted.schema.get_field_index(c)
                shifted = shifted.set_column(
                    idx, c, pc.add(shifted[c], r * off)
                )
            parts.append(shifted)
        pq.write_table(
            pa.concat_tables(parts), out, row_group_size=256 * 1024
        )
    # star tables some loaders touch incidentally: copy the small ones
    for name in ("region", "nation"):
        out = dst / f"{name}.parquet"
        if not out.exists():
            out.write_bytes((SRC / f"{name}.parquet").read_bytes())


def shuffle_bytes_of(df) -> int:
    from tools.metrics_audit import _iter_nodes, _metrics_of

    total = 0
    root = df._jdf.queryExecution().executedPlan()
    for node in _iter_nodes(root, set()):
        total += _metrics_of(node).get("shuffleBytesWritten", 0)
    return total


def main() -> None:
    for tag, r in REPLICAS.items():
        build(BASE / tag, r)
    print("blow-ups ready under", BASE, flush=True)
    if "--build-only" in sys.argv:
        return

    from cruncher_spark.plans import query_map
    from cruncher_spark.session import get_spark

    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    scales = [("x1", str(SRC))] + [
        (tag, str(BASE / tag)) for tag in REPLICAS
    ]
    results: dict[str, dict[str, tuple[float, int, int]]] = {}
    for name in QUERIES:
        results[name] = {}
        for tag, sf_dir in scales:
            t0 = time.monotonic()
            df = qmap[name](spark, sf_dir)
            rows = len(df.collect())
            wall = time.monotonic() - t0
            sh = shuffle_bytes_of(df)
            results[name][tag] = (wall, sh, rows)
            spark.catalog.clearCache()
            print(
                f"{name:24s} {tag:5s} wall {wall:7.2f}s  "
                f"shuffle {sh/1e6:9.2f} MB  rows {rows}",
                flush=True,
            )

    lines = [
        "# STRESS — measured x10 / x100 scale blow-up (derived data)\n\n",
        "Generated by `tools/scale_stress.py`: the driver's sf0.1\n",
        "documents/embeddings/events/orders replicated with id offsets (value\n",
        "distributions preserved, id domains grown linearly) to x10 and\n",
        "x100, then a representative query set re-measured. Shuffle\n",
        "bytes are the jitter-free signal; wall clock is local[32].\n",
        "Near-dup text/embedding gates are excluded by design — exact\n",
        "replication manufactures quadratic pair volume in the DATA —\n",
        "see the module docstring; their evidence is PLANS.md/METRICS.md.\n\n",
        "| query | wall x1 | wall x10 | wall x100 | wall ratio x100 |"
        " shuffle MB x1 | x10 | x100 | byte ratio x100 |\n",
        "|---|---|---|---|---|---|---|---|---|\n",
    ]
    n_super = 0
    for name in QUERIES:
        r = results[name]
        w1, s1, _ = r["x1"]
        w10, s10, _ = r["x10"]
        w100, s100, _ = r["x100"]
        wr = round(w100 / w1, 1) if w1 else None
        br = round(s100 / s1, 1) if s1 else None
        # x100 data -> allow x110 bytes (the METRICS.md fill allowance)
        flag = " **SUPER**" if br and br > 110 else ""
        if flag:
            n_super += 1
        lines.append(
            f"| {name}{flag} | {w1:.2f} | {w10:.2f} | {w100:.2f} |"
            f" x{wr} | {s1/1e6:.2f} | {s10/1e6:.2f} | {s100/1e6:.2f} |"
            f" {'x' + str(br) if br is not None else '— (0 bytes)'} |\n"
        )
    noted = [n for n in QUERIES if n in _NOTES]
    if noted:
        lines.append("\n## Row verdicts (measured causes)\n\n")
        for n in noted:
            lines.append(f"- **{n}**: {_NOTES[n]}\n")
    lines.append(
        f"\n**Summary: {len(QUERIES)} queries stressed to x100,"
        f" {n_super} superlinear in shuffle bytes.**\n"
    )
    (Path(__file__).resolve().parent.parent / "STRESS.md").write_text(
        "".join(lines)
    )
    print("wrote STRESS.md")


if __name__ == "__main__":
    main()
