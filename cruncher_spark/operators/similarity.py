"""Embedding similarity search (ANN) over an ``array<float>`` column.

Baseline: brute-force cosine top-k — broadcast the query set, score every
(query, candidate) pair with a JVM-side fold (zip_with + aggregate, no
Python), rank per query. Correct, O(Q x N); at 100 TB use it only with a
broadcast-sized Q.

Scale path: random-hyperplane LSH — each vector gets a small bit signature
(sign of dot with deterministic ±1 hyperplanes); candidates share a bucket,
so scoring becomes an equi-join on (bucket) instead of a cross join. The
hyperplanes derive from md5 so signatures are engine-reproducible.

Cosine is computed in double with a left-to-right fold. Different engines
fold in different orders (last-ulp drift), so ranked/thresholded outputs
round to 6 decimals with id tie-breaks — deterministic across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cruncher_spark.functions.scalars import quote_ident, sql_double


def _dot_expr_sql(a: str, b: str) -> str:
    """The fold dot product as a SQL fragment — node-for-node the
    Column form below (both elements cast to double, 0.0-seeded
    sequential fold), so values are bit-identical. ``a``/``b`` are raw
    SQL fragments; plain column names must arrive ALREADY backtick-quoted
    (ADVICE r12: unquoted interpolation broke on names with spaces or
    reserved words)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def dot(a: str | Column, b: str | Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product in double precision (``dim`` accepted
    for signature stability; both forms measured equal-or-worse unrolled —
    a 64-term ``element_at`` chain bloats codegen and loses to this fold,
    and the vectorized scale path is :func:`score_topk_arrow`, not a wider
    expression tree).

    Pass column NAMES where possible: the string form parses as ONE
    F.expr gateway round trip, while the Column form's higher-order
    builders cost ~100x that in py4j latency per plan build
    (optimization r12). Identical fold arithmetic either way."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_expr_sql(quote_ident(a), quote_ident(b)))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: str | Column, dim: int | None = None) -> Column:
    if isinstance(a, str):
        qa = quote_ident(a)
        return F.expr(f"sqrt({_dot_expr_sql(qa, qa)})")
    return F.sqrt(dot(a, a, dim))


def cosine(
    a: str | Column, b: str | Column, dim: int | None = None
) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        qa, qb = quote_ident(a), quote_ident(b)
        return F.expr(
            f"{_dot_expr_sql(qa, qb)}"
            f" / (sqrt({_dot_expr_sql(qa, qa)}) * sqrt({_dot_expr_sql(qb, qb)}))"
        )
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded).

    ``queries`` is broadcast; the candidate side streams — no shuffle of the
    big table until the final per-query top-k (a windowed rank over Q x k
    rows at most after pushdown... in practice the window input is Q x N;
    for large Q switch to the LSH variant).

    Output: (query_id, neighbor_id, rank, cos) — cos rounded for
    cross-engine determinism, rank breaks ties by neighbor id.
    """
    scored = _scored_pairs(vectors, queries, id_col, vec_col, round_digits, dim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _scored_pairs(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    round_digits: int,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cos) for all non-self pairs. Norms are
    computed once per row *before* the join (3x fewer folds than a naive
    cosine-per-pair; at Q x N pair counts this dominates the runtime)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col, dim).alias("q_norm"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col, dim).alias("c_norm"),
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot("q_vec", "c_vec", dim)
                / (F.col("q_norm") * F.col("c_norm")),
                round_digits,
            ),
        )
        .select("query_id", "neighbor_id", "cos")
    )


def threshold_neighbor_counts(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.8,
    round_digits: int = 6,
    n_bands: int = 4,
    band_planes: int = 4,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Per-query count of near-duplicate neighbors (cosine >= min_cos)
    among banded-LSH candidates, exactly re-scored.

    Round-2 rework: the round-1 form scored every Q x N pair — the last
    pipeline operator on the brute-force path. Now candidate generation
    is banded signed-random-projection LSH (``n_bands`` bands of
    ``band_planes`` deterministic hyperplanes; a pair collides when ANY
    band's sign-pattern matches — at cos 0.8, 4 bands x 4 planes catch
    ~87% of true pairs), and only colliding pairs pay the exact cosine.
    Each band is an equi-join key, so the pair search is a shuffle join
    on (band, key) buckets, never a cross join. Queries with no
    colliding candidate drop out (no neighbors found).

    Output: (query_id, n_near, max_cos) — max_cos over scored
    candidates, deterministic across engines (banding uses the same md5
    hyperplane family as :func:`lsh_bucket`).
    """
    scored = _banded_scored_pairs(
        vectors, queries, dim, id_col, vec_col, round_digits,
        n_bands, band_planes, hint_broadcast,
    )
    return scored.groupBy("query_id").agg(
        F.sum((F.col("cos") >= min_cos).cast("int")).alias("n_near"),
        F.max("cos").alias("max_cos"),
    )


def _banded_scored_pairs(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    n_bands: int = 4,
    band_planes: int = 4,
    hint_broadcast: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, cos) for banded-LSH colliding pairs,
    exactly re-scored — the shared candidate engine behind
    :func:`threshold_neighbor_counts` (per-QUERY rollup) and
    :func:`semantic_contamination` (per-CORPUS-row rollup).

    ``hint_broadcast`` (default True) forces the bounded candidate list
    to broadcast into the vector fetch — the 100 TB plan when the
    banding contract holds. The hint is a dial, not an axiom: on a
    DEGENERATE corpus (boilerplate/zero-ish embeddings collapsing into
    one band bucket) collisions go quadratic, and a forced broadcast
    then dies on the broadcast-size limit instead of degrading. Pass
    ``False`` there: the planner falls back to a shuffled join and the
    run completes slow-but-alive. The results are identical either way
    (pinned by test_banded_pairs_hint_off_identical)."""
    planes = _hyperplane_signs(dim, n_bands * band_planes)

    def band_keys() -> Column:
        # the whole banded-key struct array is generated as SQL and
        # parsed with ONE F.expr (r12): the per-plane Column loop paid
        # n_bands×band_planes×(dim+1) py4j round trips per SIDE per
        # plan build (~2 s for the 4×4×64 gate shape). Identical
        # CASE/fold arithmetic — keys bit-identical.
        def key_sql(b: int) -> str:
            return _sign_bits_sql(
                quote_ident(vec_col),
                planes[b * band_planes : (b + 1) * band_planes],
            )

        bands = ", ".join(
            f"named_struct('band_idx', {b}, 'band_key', {key_sql(b)})"
            for b in range(n_bands)
        )
        return F.expr(f"explode(array({bands}))")

    q = queries.select(
        F.col(id_col).alias("query_id"), band_keys().alias("bk")
    ).select("query_id", "bk.band_idx", "bk.band_key")
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), band_keys().alias("bk")
    ).select("neighbor_id", "bk.band_idx", "bk.band_key")
    cands = (
        q.join(c, ["band_idx", "band_key"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # exact re-score: join vectors back onto the (small) candidate list
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col, dim).alias("q_norm"),
    )
    cv = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col, dim).alias("c_norm"),
    )
    # the candidate list is the BOUNDED side by the banding contract
    # (collisions ~ true-pair rate when band width is tuned to the
    # corpus), so it broadcasts EXPLICITLY into the vector fetch — the
    # corpus-vector table streams and never exchanges. Left to the
    # planner, the x1 plan broadcast cv instead and flipped to a
    # sort-merge at x100 (r9 STRESS: the contamination_semantic x148
    # byte transition was exactly this corpus exchange appearing).
    # hint_broadcast=False is the degenerate-corpus escape hatch (see
    # docstring).
    hint = F.broadcast if hint_broadcast else (lambda d: d)
    scored = (
        cv.join(hint(cands), "neighbor_id")
        .join(hint(qv), "query_id")
        .withColumn(
            "cos",
            F.round(
                dot("q_vec", "c_vec", dim)
                / (F.col("q_norm") * F.col("c_norm")),
                round_digits,
            ),
        )
    )
    return scored.select("query_id", "neighbor_id", "cos")


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.8,
    round_digits: int = 6,
    n_bands: int = 4,
    band_planes: int = 4,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every corpus
    document whose embedding is near-duplicate (cosine >= ``min_cos``)
    to ANY benchmark/eval embedding — the semantic tier of test-set
    decontamination (n-gram tiers catch verbatim leakage,
    :func:`cruncher_spark.operators.curation.contaminated_ids`; this
    catches paraphrased/translated leakage the lexical tiers miss).

    Same banded signed-random-projection candidate engine as
    :func:`threshold_neighbor_counts` — the benchmark side is
    driver-sized (eval suites are thousands of rows, not corpora) and
    BROADCASTS, so the corpus is scanned once, pays band-key equi-joins
    only on colliding rows, and never shuffles on its own size:
    O(corpus + collisions), never corpus x benchmark.

    Output: one row per corpus id — (id, max_bench_cos NULL when no
    candidate collided, contaminated bool) — the drop-list join shape
    curation pipelines consume.
    """
    scored = _banded_scored_pairs(
        corpus, benchmark, dim, id_col, vec_col, round_digits,
        n_bands, band_planes, hint_broadcast,
    )
    flagged = scored.groupBy("neighbor_id").agg(
        F.max("cos").alias("max_bench_cos")
    )
    # flagged is bounded by collisions (same banding contract as the
    # candidate list) — broadcast it so the corpus-wide flag attach
    # stays a map-side stream instead of exchanging the corpus; the
    # same hint_broadcast escape hatch applies (degenerate corpus ->
    # collisions quadratic -> flagged no longer broadcastable)
    hint = F.broadcast if hint_broadcast else (lambda d: d)
    return (
        corpus.select(F.col(id_col).alias("neighbor_id"))
        .join(hint(flagged), "neighbor_id", "left")
        .select(
            F.col("neighbor_id").alias(id_col),
            "max_bench_cos",
            F.coalesce(
                F.col("max_bench_cos") >= min_cos, F.lit(False)
            ).alias("contaminated"),
        )
    )


def score_topk_arrow(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query, Arrow-vectorized.

    The distributed brute-force ANN shape: the query matrix (driver-sized,
    same constraint as a broadcast) ships inside a ``mapInPandas`` closure;
    each executor batch scores candidates against ALL queries with one
    float64 matmul (BLAS) and emits only its batch-local top-k per query —
    provably a superset of the global top-k. The final refine ranks
    ``partitions x Q x k`` rows, thousands, not ``Q x N``. Per-pair
    expression eval (the fold in :func:`brute_force_topk`) costs ~2.5us
    per dot interpreted; the matmul is ~1ns — this is the 100 TB path.

    Scores round to ``round_digits`` BEFORE local selection so tie-breaks
    (cos desc, neighbor id asc) are decided on the rounded value,
    matching the SQL-oracle semantics exactly.

    Measured Q-scaling (r13, VERDICT r12 next #7 — sf0.1 corpus, k=3,
    best-of-3): Q=32 → 0.82 s, Q=256 → 0.97 s, Q=1024 → 0.95 s — flat,
    because the per-batch cost is one (N_batch × Q) BLAS matmul plus Q
    batch-local selections and both are far from the task's floor at
    these sizes. The real bounds to watch at scale: (a) the closure
    ships the whole query matrix per task — 8·Q·dim bytes (Q=1024,
    dim=64 → 512 KB; fine into the tens of thousands of queries, and a
    Q large enough to hurt here is no longer a "driver-sized query set"
    and belongs on the LSH/IVF paths); (b) per-task selection is
    O(Q · N_batch log N_batch) in numpy lexsorts — if Q·N grows large,
    chunk the query matrix and union the chunk outputs (each chunk is
    an independent, exact superset selection), trading closure size and
    selection work for more passes over the candidate side.
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            cand = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            c_norm = np.sqrt((cand * cand).sum(axis=1))
            scores = np.round(
                (cand @ q_mat.T) / (c_norm[:, None] * q_norm[None, :]),
                round_digits,
            )
            out_q, out_n, out_c = [], [], []
            for qi in range(len(q_ids)):
                col = scores[:, qi].copy()
                col[ids == q_ids[qi]] = -np.inf  # self-exclusion
                top = np.lexsort((ids, -col))[:k]
                top = top[np.isfinite(col[top])]
                out_q.extend([q_ids[qi]] * len(top))
                out_n.extend(ids[top])
                out_c.extend(col[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_c}
            )

    scored = vectors.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


#: expected cell population the corpus-adaptive semantic-dedup family
#: holds constant as the corpus grows — cells = ceil(n / target),
#: planes = ceil(log2(cells)) (moved here from plans/pipeline_queries
#: in r12 so the STREAMING embedding ingest derives the same policy
#: without importing the gate layer; the gate module re-exports)
_SDD_CELL_TARGET = 64

#: the banded family's recall target: P(candidate | cos >= min_cos)
#: the band count is derived to guarantee at the threshold. A MODULE
#: constant only as the default — every policy entry point takes
#: target_recall as a parameter, so a caller wanting a different
#: target passes it, never edits this (r11 VERDICT #5 knob audit).
_SDD_TARGET_RECALL = 0.95


def _sdd_planes_for(n: int) -> int:
    """Plane count for a corpus of ``n`` embeddings: enough sign-pattern
    cells (2^p) that the EXPECTED cell population stays ~_SDD_CELL_TARGET
    — SemDeDup's cells-grow-with-the-corpus contract, integer-exact so
    both engines derive the same p from the same count. Floor of 4
    planes keeps small fixtures from degenerating to a handful of
    giant cells."""
    cells = max(1, -(-n // _SDD_CELL_TARGET))
    return max(4, (cells - 1).bit_length())


def _sdd_params_for(
    n: int,
    min_cos: float = 0.9,
    target_recall: float = _SDD_TARGET_RECALL,
) -> tuple[int, int]:
    """Recall-target POLICY for the banded semantic-dedup family (r10
    VERDICT #2/#3: policy as code, not prose): derive (p planes/band,
    r bands) from (corpus count, cosine threshold, recall target) in
    closed form, identically in both engines.

    - ``p = _sdd_planes_for(n)`` holds expected cell population ~64 per
      band — the cost contract (within-band pair volume linear in n).
    - A pair at the threshold angle θ = arccos(min_cos) agrees with one
      plane with probability ``s = 1 - θ/π``, so one p-plane band
      catches it with probability s^p and r independent bands give
      recall ``1 - (1-s^p)^r``; solving for the target:
      ``r = ceil(log(1-target) / log(1-s^p))``.

    Cost honesty (stated, not hidden): holding recall fixed while p
    tracks the corpus makes r grow ~s^(-p) = n^(log2(1/s)) — ~n^0.22
    at cos 0.9, the classic sub-quadratic LSH exponent (r = 4/5/11/18
    at n = 5e2/2e3/2e5/2e7). That polylog-ish factor is the price of
    recall that does NOT decay with scale; the single-code family's
    alternative is recall s^p → 0.

    Why there is no third "probe depth" knob: the hamming<=1 ring's
    recall (1-f)^p + p·f·(1-f)^(p-1) also decays with p, so probe
    depth cannot REACH a fixed target as the corpus grows — it is a
    constant-factor lever, not a policy variable, and returning it
    here would be a dead knob (the r10 ADVICE class). Bands are the
    only r-independent amplifier; use multiprobe when a ~(1+p/2)x
    candidate bump at single-code cost is wanted WITHOUT a target.
    """
    import math

    p = _sdd_planes_for(n)
    s = 1.0 - math.acos(min_cos) / math.pi
    catch = s**p
    if not 0.0 < catch < 1.0:
        return p, 1
    r = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - catch))
    return p, max(1, r)


#: broadcast budget for the pair-attach exchange shape: the corpus
#: VECTOR table (id, vec, norm per row) must fit comfortably inside
#: one executor's memory to be force-broadcast — 256 MiB is well under
#: any sane executor heap's storage fraction while being ~25x Spark's
#: 10 MiB AQE auto-threshold (which the force deliberately overrides;
#: the attach join is in-memory hash-probe either way)
_SDD_BROADCAST_BUDGET = 256 * 1024 * 1024

#: estimated bytes per broadcast vector row: dim float64 payload + id
#: + norm + array/object headers (UnsafeRow + broadcast relation
#: overhead, rounded up — the estimate errs toward NOT broadcasting)
_SDD_VEC_ROW_OVERHEAD = 64


def _sdd_shape_for(
    n: int, dim: int, broadcast_budget: int = _SDD_BROADCAST_BUDGET
) -> bool:
    """Exchange-shape POLICY for the semantic-dedup family (r11 VERDICT
    #2: the docstring crossover math as an executable decision, the
    ``_sdd_params_for`` discipline applied to the shape choice): True →
    the pair-attach shape (band/probe joins ship (id, cell) keys only,
    vectors attach via forced broadcast), False → the in-join
    vector-carry shape (vectors ride the band/probe exchange; the
    unbounded-corpus escape hatch).

    The decision is the broadcast feasibility estimate: n vector rows
    of ``dim * 8 + overhead`` bytes against the budget. Only the Spark
    plan depends on it — both shapes are pinned bit-identical by test —
    so the two engines never need to agree on it, and a vector table
    that outgrows executor memory under the old always-True default no
    longer dies on the forced broadcast; it flips to the carry shape
    by policy. Callers can still override via ``hint_broadcast``.
    """
    return n * (dim * 8 + _SDD_VEC_ROW_OVERHEAD) <= broadcast_budget


def _hyperplane_signs(dim: int, n_planes: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible in SQL and here."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{p}:{i}".encode()).digest()[0]
            row.append(1 if h & 1 else -1)
        planes.append(row)
    return planes


def _arr_sql(vals) -> str:
    """SQL array literal of doubles. Parsed by ONE ``F.expr`` gateway
    round trip — per-element ``F.lit`` (and PySpark's ``lit(list)``,
    which builds element-wise internally) costs dim+1 synchronous py4j
    calls per array, measured in SECONDS of pure driver-side socket
    latency per plan build for the plane families. ``repr`` emits the
    shortest round-tripping decimal and Spark's parser is correctly
    rounded, so literal values are bit-identical to the ``F.lit``
    form's; non-finite values are emitted as CASTs (scalars.sql_double —
    ADVICE r12: ``infD`` failed to parse where ``F.lit`` coped)."""
    return "array(" + ", ".join(sql_double(v) for v in vals) + ")"


def _fold_dot_sql(vec_sql: str, arr_sql: str) -> str:
    """The family's canonical fold dot product as a SQL fragment —
    node-for-node the zip_with/aggregate Column form (cast-double
    multiply, 0.0-seeded sequential fold), so values are bit-identical.
    ``vec_sql`` is a raw SQL fragment (a plain column name or a lambda
    variable)."""
    return (
        f"aggregate(zip_with({vec_sql}, {arr_sql}, "
        "(x, s) -> CAST(x AS DOUBLE) * s), 0.0D, (acc, x) -> acc + x)"
    )


def _sign_bits_sql(vec_sql: str, planes: list[list[int]]) -> str:
    """Sign-pattern integer (bit k = sign of <v, planes[k]>) as a SQL
    fragment — the CASE/fold tree the old per-plane Column loop built,
    now one parsed expression."""
    return " + ".join(
        f"(CASE WHEN {_fold_dot_sql(vec_sql, _arr_sql(signs))} > 0"
        f" THEN {1 << p} ELSE 0 END)"
        for p, signs in enumerate(planes)
    )


def _sign_pattern_cell(vec_col: str, planes: list[list[int]]) -> Column:
    """Sign-pattern cell id for a plane family: bit k = sign of
    <v, planes[k]> — the shared map-side assignment expression of the
    semantic-dedup family (p JVM-side fold dot products per row, zero
    fit, zero shuffle). ``vec_col`` is the column NAME; the whole tree
    is generated as SQL and parsed with one F.expr (r12: per-element
    F.lit — and lit(list), which PySpark expands element-wise — built
    p×dim expression nodes through py4j, seconds of plan-build time for
    the banded family's p·r·64 literals). Same arithmetic node for
    node; cells bit-identical."""
    if not isinstance(vec_col, str):
        raise TypeError(
            "_sign_pattern_cell takes the vector column NAME (str) since "
            "the r12 SQL-generation rework; got a "
            f"{type(vec_col).__name__} (ADVICE r12: a Column here produced "
            "a cryptic SQL parse error)"
        )
    return F.expr(_sign_bits_sql(quote_ident(vec_col), planes))


def _sign_pattern_projs(vec_col: str, planes: list[list[int]]) -> Column:
    """ALL plane projections <v, planes[k]> as one array<double> column
    from a single 2-D plane-matrix literal — the banded family's
    assignment built as ONE parsed expression instead of p·r
    independent fold trees (r12: at the u100 stress shape that is 216
    planes × 64 per-element literals ≈ 14k py4j expression nodes,
    seconds of plan-build/analysis per query before any row moves).
    Per-plane arithmetic is IDENTICAL to :func:`_sign_pattern_cell`
    (zip_with cast-double multiply, sequential 0.0-seeded fold), so
    cells derived from these projections are bit-equal to the
    per-plane form's. ``vec_col`` is the column NAME."""
    if not isinstance(vec_col, str):
        raise TypeError(
            "_sign_pattern_projs takes the vector column NAME (str) since "
            "the r12 SQL-generation rework; got a "
            f"{type(vec_col).__name__}"
        )
    matrix = "array(" + ", ".join(_arr_sql(row) for row in planes) + ")"
    return F.expr(
        f"transform({matrix}, row -> {_fold_dot_sql(quote_ident(vec_col), 'row')})"
    )


def _cell_from_projs(projs_col: Column, start: int, p: int) -> Column:
    """Cell id for one band from the shared projections column: bit k =
    sign of projection ``start + k`` (1-based element_at)."""
    cell = F.lit(0)
    for k in range(p):
        cell = cell + F.when(
            F.element_at(projs_col, start + k + 1) > 0, F.lit(1 << k)
        ).otherwise(F.lit(0))
    return cell


def lsh_bucket(vec_col: str, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (int) for an embedding column
    (``vec_col`` is the column NAME).

    Bit p of the bucket = sign of <v, plane_p> where plane_p is a ±1 vector.
    The sign pattern is data-independent and deterministic, so two engines
    (or two clusters) bucket identically.
    """
    if not isinstance(vec_col, str):
        raise TypeError(
            "lsh_bucket takes the vector column NAME (str) since the r12 "
            f"SQL-generation rework; got a {type(vec_col).__name__} "
            "(ADVICE r12: a Column here produced a cryptic SQL parse error)"
        )
    planes = _hyperplane_signs(dim, n_planes)
    # one parsed SQL expression (the _sign_pattern_cell r12 fix: the
    # per-plane Column loop paid n_planes×(dim+1) py4j round trips per
    # plan build); identical CASE/fold arithmetic, bit-identical buckets
    return F.expr(_sign_bits_sql(quote_ident(vec_col), planes))


def lowest_id_centroids(
    vectors: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> list[list[float]]:
    """Degenerate quantizer: the ``n_centroids`` lowest-id vectors.

    Kept only as the k-means *seed* and as the baseline the recall
    property test beats — cell populations follow data order, not
    geometry (round-1 VERDICT "What's wrong" #2)."""
    return [
        [float(x) for x in r[0]]
        for r in vectors.orderBy(id_col).limit(n_centroids).select(vec_col).collect()
    ]


def centroid_sample(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    every: int = 4,
    max_sample: int = 250_000,
) -> list[tuple[int, list[float]]]:
    """Deterministic training sample for the coarse quantizer: every
    ``every``-th id, sorted. At 100 TB this is the standard IVF recipe —
    a bounded driver-side sample trains the quantizer (FAISS trains on
    ~10^5-10^6 of 10^9+ vectors); assignment stays fully distributed.

    The stride widens with corpus size so the collect stays bounded by
    ``max_sample`` regardless of N: a fixed stride would be linear in
    the corpus (10^9 vectors / 4 = a driver-killing 2.5*10^8 collect —
    round-4 VERDICT "What's wrong" #1). ``every`` is the floor stride,
    so small corpora keep the historical every=4 sample bit-for-bit
    (gate reproducibility); at 10^9 ids and the default cap the stride
    becomes 4000 and the driver holds ~250k vectors, FAISS-sized.

    The id sort happens driver-side: a Spark ``orderBy`` before a
    driver collect would add a range-partitioner sampling job + a full
    exchange just to order rows we are about to hold in one list anyway.
    """
    n = vectors.count()
    every = max(every, -(-n // max_sample))  # ceil-div: n/every <= max_sample
    rows = vectors.where((F.col(id_col) % every) == 0).select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def fit_ivf_centroids(
    sample: list[tuple[int, list[float]]], k: int, iters: int = 8
) -> list[list[float]]:
    """Deterministic spherical k-means (Lloyd) on a driver-side sample.

    Init = the ``k`` lowest-id sample vectors; assignment = argmax cosine
    (ties → smaller centroid index, numpy argmax semantics); update =
    float64 mean of members (empty cell keeps its centroid). Pure
    single-threaded numpy on an id-sorted sample → bit-reproducible, so
    the fitted centroids can be inlined as literals in both the Spark
    plan and the SQL oracle.
    """
    import numpy as np

    X = np.array([v for _, v in sample], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"sample of {len(X)} vectors cannot seed {k} centroids")
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = X[:k].copy()
    for _ in range(iters):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(x) for x in row] for row in C]


def _dbl(x: float) -> str:
    """Exact double literal for Spark SQL text: ``repr`` round-trips the
    value and the string-cast parse is bit-exact (same trick the DuckDB
    oracle uses), avoiding the DECIMAL default of bare SQL literals.

    Finite-only by contract: Python renders non-finite floats as
    'inf'/'nan', which Spark's non-ANSI string→double cast (accepting
    'Infinity'/'NaN' only) would silently turn into NULL — a degenerate
    centroid would then null every cell score instead of failing. Raise
    here so a bad fit is loud (ADVICE r3)."""
    import math

    if not math.isfinite(x):
        raise ValueError(f"non-finite value cannot be inlined as SQL double: {x!r}")
    return f"CAST('{x!r}' AS DOUBLE)"


def _cell_scores_sql(
    vec_sql: str, norm_sql: str, centroids: list[list[float]], round_digits: int
) -> str:
    """SQL text for the per-row array of ``struct(ccos, ncid)`` sorted
    best-first.

    Centroids are embedded as literal arrays (K is tiny — this is the
    broadcast-in-the-plan form of a broadcast join), so assignment is a
    pure map-side projection: no shuffle, no join, fully codegen'd.
    ``ncid = -cid`` makes the natural struct ordering break cosine ties
    toward the smaller centroid id under descending sort.

    Emitted as ONE SQL string parsed in a single pass: the round-1 form
    built the same tree through ~4000 individual ``F.lit`` py4j calls,
    which cost ~3 s of driver time per plan build. The dot is written
    once inside a ``transform`` lambda instead of unrolled per centroid,
    and the row norm arrives precomputed via ``norm_sql``.
    """
    import math

    cents = ", ".join(
        "struct(array({cv}) AS cv, {cn} AS cn, {cid} AS cid)".format(
            cv=", ".join(_dbl(x) for x in c),
            cn=_dbl(math.sqrt(sum(x * x for x in c))),
            cid=cid,
        )
        for cid, c in enumerate(centroids)
    )
    return (
        "sort_array(transform(array({cents}), c -> struct("
        "round(aggregate(zip_with({vec}, c.cv, (x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x) / ({nrm} * c.cn), {digits}) AS ccos, "
        "-c.cid AS ncid)), false)"
    ).format(cents=cents, vec=vec_sql, nrm=norm_sql, digits=round_digits)


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 2,
    k: int = 3,
    round_digits: int = 6,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: the coarse-quantizer inverted-file
    structure (FAISS IVF / SPANN style) expressed as DataFrame ops.

    The coarse quantizer is k-means fitted on a deterministic driver-side
    sample (:func:`fit_ivf_centroids`); pass ``centroids`` to reuse a
    fit — the production train-once contract. STALENESS / refit trigger
    (r8 VERDICT #6, measured in STRESS.md "IVF quantizer staleness"): a
    continuously-ingesting corpus drifts from the centroids it was
    fitted on; on distribution-stationary growth the measured stale-fit
    recall tracks a fresh fit across two decades, so the refit trigger
    is DRIFT-based, not size-based — implemented as
    :class:`IvfQuantizerMonitor` (cell-population total-variation drift
    + optional sampled recall vs brute force; hook point:
    ``streaming/neardup.py EmbeddingDedupIngest(ivf_monitor=...)``),
    never merely because the corpus grew. Every vector is assigned to
    its nearest of
    ``n_centroids`` coarse cells (map-side, centroids inlined as
    literals — no shuffle); each query probes its ``n_probe`` nearest
    cells and scores only the vectors living there. The cross join becomes an equi-join on
    ``cell``: ~Q x N*(n_probe/n_centroids) scored pairs. At 100 TB the
    cell column doubles as a partition key, so one cell's postings list
    is one co-located scan.

    Output: (query_id, neighbor_id, rank, cos) — same contract as
    :func:`brute_force_topk` / :func:`ann_lsh_topk`.
    """
    # cheap input guards FIRST — rejecting after the k-means fit would
    # waste the expensive sample/fit pass the centroid cache amortizes.
    # vec_col is interpolated into SQL text backtick-quoted; a backtick in
    # the name would escape the quoting (ADVICE r3). Reject rather than
    # attempt escaping — no real schema needs one.
    if "`" in vec_col:
        raise ValueError(f"vec_col must not contain backticks: {vec_col!r}")
    # collision-safe internal norm column (ADVICE r3: a caller-owned
    # `_vnorm` was silently overwritten by withColumn)
    vn = "__ivf_vnorm__"
    for side, df_in in (("vectors", vectors), ("queries", queries)):
        if vn in df_in.columns:
            raise ValueError(f"{side} already has internal column {vn!r}")
    if centroids is None:
        centroids = fit_ivf_centroids(
            centroid_sample(vectors, id_col, vec_col), n_centroids
        )
    dim = len(centroids[0])
    cells_sql = _cell_scores_sql(
        f"`{vec_col}`", f"`{vn}`", centroids, round_digits
    )
    c = vectors.withColumn(vn, norm(vec_col, dim)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(vn).alias("c_norm"),
        F.expr(f"-element_at({cells_sql}, 1).ncid").alias("cell"),
    )
    q = queries.withColumn(vn, norm(vec_col, dim)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(vn).alias("q_norm"),
        F.expr(
            f"explode(transform(slice({cells_sql}, 1, {n_probe}), s -> -s.ncid))"
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot("q_vec", "c_vec", dim)
                / (F.col("q_norm") * F.col("c_norm")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_cell_fractions(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> dict[int, float]:
    """Cell-population fractions of ``vectors`` under a fitted coarse
    quantizer: the same map-side nearest-centroid assignment the IVF
    index computes, followed by ONE groupBy whose output is K rows —
    the cheap distributed measurement the refit monitor runs. Cells
    with no members are present with fraction 0.0."""
    if "`" in vec_col:
        raise ValueError(f"vec_col must not contain backticks: {vec_col!r}")
    vn = "__ivf_vnorm__"
    if vn in vectors.columns:
        raise ValueError(f"vectors already has internal column {vn!r}")
    dim = len(centroids[0])
    cells_sql = _cell_scores_sql(
        f"`{vec_col}`", f"`{vn}`", centroids, round_digits
    )
    counts = (
        vectors.withColumn(vn, norm(vec_col, dim))
        .select(F.expr(f"-element_at({cells_sql}, 1).ncid").alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r.n for r in counts) or 1
    got = {int(r.cell): r.n / total for r in counts}
    return {c: got.get(c, 0.0) for c in range(len(centroids))}


class IvfQuantizerMonitor:
    """Drift-based refit trigger for a served IVF coarse quantizer —
    the CODE form of the policy r9 documented as prose (r9 VERDICT #4;
    STRESS.md "IVF quantizer staleness" measured WHY the trigger is
    drift-based: on distribution-stationary growth a stale fit's recall
    tracks a fresh fit across two decades, so corpus SIZE alone must
    not refit).

    Two signals, both bounded-cost:

    - **drift**: total-variation distance (``L1/2``, in [0,1]) between
      the current cell-population fractions and the fit-time baseline —
      one groupBy over the same map-side assignment the index already
      computes (:func:`ivf_cell_fractions`), K rows collected. A
      population that migrated into cells the fit never saw shows up
      here before recall degrades.
    - **recall** (optional, when ``probe_queries`` is set): recall@k of
      the CURRENT centroids vs the exact brute-force scorer on the
      fixed probe set — Q*k rows per side, the sampled ground-truth
      check. Costlier than drift (scores the corpus once), so meant for
      a lower cadence or as confirmation after drift trips.

    ``maybe_refit`` re-runs the standard bounded fit
    (:func:`centroid_sample` + :func:`fit_ivf_centroids`) when either
    signal trips, and resets the drift baseline to the post-refit
    assignment — the train-once contract becomes train-rarely, with
    every refit logged in ``events``.
    """

    def __init__(
        self,
        centroids: list[list[float]],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        *,
        drift_threshold: float = 0.25,
        recall_floor: float | None = None,
        probe_queries: DataFrame | None = None,
        n_probe: int = 2,
        k: int = 3,
    ):
        if recall_floor is not None and probe_queries is None:
            raise ValueError("recall_floor requires probe_queries")
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col
        self.drift_threshold = drift_threshold
        self.recall_floor = recall_floor
        self.probe_queries = probe_queries
        self.n_probe = n_probe
        self.k = k
        self.baseline: dict[int, float] | None = None
        self.events: list[dict] = []

    def set_baseline(self, vectors: DataFrame) -> None:
        """Record the fit-time cell-population fractions."""
        self.baseline = ivf_cell_fractions(
            vectors, self.centroids, self.id_col, self.vec_col
        )

    def drift(self, vectors: DataFrame) -> float:
        """Total-variation distance of the current cell histogram from
        the baseline (0 = identical populations, 1 = disjoint)."""
        if self.baseline is None:
            raise ValueError("set_baseline() before drift()")
        cur = ivf_cell_fractions(
            vectors, self.centroids, self.id_col, self.vec_col
        )
        return 0.5 * sum(
            abs(cur[c] - self.baseline[c]) for c in range(len(self.centroids))
        )

    def sampled_recall(self, vectors: DataFrame) -> float:
        """recall@k of the current quantizer vs exact brute force on the
        fixed probe queries (1.0 when the probe set finds no neighbors)."""
        if self.probe_queries is None:
            raise ValueError("no probe_queries configured")
        truth = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(
                vectors, self.probe_queries, self.id_col, self.vec_col,
                k=self.k,
            ).collect()
        }
        if not truth:
            return 1.0
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_topk(
                vectors, self.probe_queries, self.id_col, self.vec_col,
                n_probe=self.n_probe, k=self.k, centroids=self.centroids,
            ).collect()
        }
        return len(truth & got) / len(truth)

    def maybe_refit(self, vectors: DataFrame, tag: object = None) -> bool:
        """Run the monitor once: measure drift (and recall when
        configured), refit + rebaseline when a signal trips. Returns
        True when a refit happened; the measurement is appended to
        ``events`` either way (``tag`` labels the event, e.g. a
        batch id)."""
        d = self.drift(vectors)
        rec = (
            self.sampled_recall(vectors)
            if self.recall_floor is not None
            else None
        )
        fire = d > self.drift_threshold or (
            rec is not None and rec < self.recall_floor
        )
        if fire:
            self.centroids = fit_ivf_centroids(
                centroid_sample(vectors, self.id_col, self.vec_col),
                len(self.centroids),
            )
            self.set_baseline(vectors)
        self.events.append(
            {"tag": tag, "drift": d, "recall": rec, "refit": fire}
        )
        return fire


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    min_cos: float = 0.9,
    round_digits: int = 6,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster with a coarse k-means
    quantizer, then pairwise-compare only WITHIN each cluster (Abbas et al.
    2023, "SemDeDup" — the published recipe for embedding-level dedup at
    corpus scale). A vector is dropped when a same-cluster vector with a
    smaller id has cosine >= ``min_cos`` (keep-lowest-id is the same
    deterministic survivor rule the exact/MinHash dedup family uses).

    Scale shape: cell assignment is a map-side projection (centroids
    inlined, no shuffle — identical machinery to :func:`ann_ivf_topk`);
    the pair search is a self-equi-join on ``cell``, so the quadratic
    blow-up is bounded per cluster (N/K expected rows per cell), never
    all-pairs — with K ~ sqrt(N) cells the total pair count is ~N^1.5
    instead of N^2, and each cell's pairs co-locate in one task. Cross-
    cluster near-dups are invisible by design; that recall/cost trade is
    the SemDeDup contract (raise K for cheaper cells, lower K for recall).

    Scale boundary (why the registered ``semantic_dedup`` gate uses
    :func:`semantic_dedup_lsh` instead, r10): holding cell population
    constant requires K ∝ N, but flat quantizer ASSIGNMENT is O(N*K)
    compute — growing K with the corpus just moves the quadratic from
    the pair join into assignment (and the driver-side Lloyd fit caps K
    anyway). This k-means flavor is the bounded-K auditable form: use
    it when K is a fixed index parameter (e.g. sharing the IVF coarse
    quantizer); use the hash-cell form when cells must track corpus
    growth.

    Output: one row per input vector — (id, cell, kept).
    """
    if "`" in vec_col:
        raise ValueError(f"vec_col must not contain backticks: {vec_col!r}")
    vn = "__sdd_vnorm__"
    if vn in vectors.columns:
        raise ValueError(f"vectors already has internal column {vn!r}")
    if centroids is None:
        centroids = fit_ivf_centroids(
            centroid_sample(vectors, id_col, vec_col), n_centroids
        )
    dim = len(centroids[0])
    cells_sql = _cell_scores_sql(f"`{vec_col}`", f"`{vn}`", centroids, round_digits)
    assigned = vectors.withColumn(vn, norm(vec_col, dim)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col(vn).alias("nrm"),
        F.expr(f"-element_at({cells_sql}, 1).ncid").alias("cell"),
    )
    lo = assigned.select(
        F.col("id").alias("lo_id"),
        F.col("vec").alias("lo_vec"),
        F.col("nrm").alias("lo_nrm"),
        "cell",
    )
    hi = assigned.select(
        F.col("id").alias("hi_id"),
        F.col("vec").alias("hi_vec"),
        F.col("nrm").alias("hi_nrm"),
        "cell",
    )
    dropped = (
        lo.join(hi, "cell")
        .where(F.col("lo_id") < F.col("hi_id"))
        .where(
            F.round(
                dot("lo_vec", "hi_vec", dim)
                / (F.col("lo_nrm") * F.col("hi_nrm")),
                round_digits,
            )
            >= min_cos
        )
        .select(F.col("hi_id").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)), "id", "left")
        .select("id", "cell", F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"))
    )


def semantic_dedup_lsh(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    min_cos: float = 0.9,
    round_digits: int = 6,
) -> DataFrame:
    """:func:`semantic_dedup` with a QUANTIZER-FREE cell assignment: the
    cell is the sign pattern of ``n_planes`` deterministic random
    hyperplanes (the md5 family of :func:`_hyperplane_signs`), so
    assignment is a pure map-side expression with ZERO fit cost and the
    dedup tail (within-cell lo<hi exact cosine, keep-lowest-id) is
    identical.

    This is the PRODUCTION-scaling form of SemDeDup's contract that
    cell count grows with the corpus (constant expected cell
    population): 2^n_planes cells cost nothing to "fit", so n_planes
    just increments with each corpus doubling pair-budget-neutrally —
    where the k-means quantizer's driver fit caps K. The trade is
    recall: an exact copy ALWAYS lands in its original's cell (same
    projections), but a near-dup at angle θ flips each plane with
    probability θ/π, so single-probe recall is (1-θ/π)^n_planes —
    raise min_cos tightness or multi-probe when that matters (the
    banded `threshold_neighbor_counts` family is the recall-complete
    path). Measured to x100 in STRESS.md's unique-content section.

    Output contract matches :func:`semantic_dedup`: (id, cell, kept).
    """
    planes = _hyperplane_signs(dim, n_planes)
    assigned = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(vec_col, dim).alias("nrm"),
        _sign_pattern_cell(vec_col, planes).alias("cell"),
    )
    lo = assigned.select(
        F.col("id").alias("lo_id"), F.col("vec").alias("lo_vec"),
        F.col("nrm").alias("lo_nrm"), "cell",
    )
    hi = assigned.select(
        F.col("id").alias("hi_id"), F.col("vec").alias("hi_vec"),
        F.col("nrm").alias("hi_nrm"), "cell",
    )
    dropped = (
        lo.join(hi, "cell")
        .where(F.col("lo_id") < F.col("hi_id"))
        .where(
            F.round(
                dot("lo_vec", "hi_vec", dim)
                / (F.col("lo_nrm") * F.col("hi_nrm")),
                round_digits,
            )
            >= min_cos
        )
        .select(F.col("hi_id").alias("id"))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("_drop", F.lit(True)), "id", "left"
    ).select(
        "id", "cell", F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept")
    )


def semantic_dedup_multiprobe(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | None = None,
    min_cos: float = 0.9,
    round_digits: int = 6,
    hint_broadcast: bool | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """:func:`semantic_dedup_lsh` with MULTI-PROBE candidate generation
    (the Lv et al. recall lever :func:`ann_lsh_multiprobe` applies to
    search, applied to dedup): a pair is a candidate when their
    sign-pattern cells differ in AT MOST ONE bit, so a near-dup that a
    single near-threshold hyperplane pushed across a cell boundary is
    still verified.

    Why this matters precisely when cells grow with the corpus (the
    adaptive ``semantic_dedup`` gate, r10): single-probe recall for a
    pair at angle θ is (1-θ/π)^p, which FALLS as p rises with corpus
    size — at p=12 a cos-0.9 pair survives all 12 planes only ~16% of
    the time. Probing the 1-bit ring lifts that to
    (1-f)^p + p·f·(1-f)^(p-1) with f=θ/π (~47% at p=12), ~3x recall
    for a (p+1)x candidate-volume factor — O(log n) as p tracks the
    corpus, so total pair volume stays ~N·pop·(p+1), still linear in
    the corpus. Exact copies (f=0) are found with probability 1 in
    both forms.

    Plan shape — the SET-BIT-CLEARED halving: every vector is bucketed
    ONCE (primary cell); the probe side emits its primary cell plus its
    cell with each SET bit cleared (~1 + p/2 rows in expectation, not
    the naive 1 + p full ring), and joins the other side's PRIMARY
    cell. Coverage is exact and duplicate-free: a hamming-1 pair
    differs at one bit k — the member with bit k SET reaches the other
    member's cell by clearing k (and only k), and the clear-bit member
    can never reach back by clearing, so the pair is generated exactly
    once; a same-cell pair is generated once via the primary-primary
    match under id order.

    Exchange discipline (r11, closing the r10 STRESS x765.9-byte flag)
    — TWO shapes, chosen by ``hint_broadcast``, results bit-identical
    (the halving argument above is about join keys, not payload):

    - ``hint_broadcast=True`` (default — the corpus VECTOR table fits
      executor memory, as every registered gate's does): probe rows
      carry ONLY (id, cell, pri) keys (~16 B vs vector+norm ~520 B),
      the cell equi-join forms candidate id-pairs, and vectors attach
      map-side via two EXPLICITLY broadcast id-keyed joins — corpus
      vectors never enter the shuffle at all. The broadcast is forced,
      not left to AQE: a vector table a shade over the auto threshold
      silently flips the attach joins to sort-merge, and THAT shape
      sorts pair-count x vector-width intermediates (~25x(1+p/2)xn
      rows carrying 520 B — measured as a disk-filling multi-GB spill
      at the u100 stress scale), strictly worse than either deliberate
      shape.
    - ``hint_broadcast=False`` (the unbounded-corpus escape hatch,
      same convention as :func:`semantic_contamination`): probe rows
      carry the vector, candidates are formed AND cosine-verified
      inside the one cell equi-join, pairs never materialize — the
      corpus vector payload rides the probe exchange ~(1+p/2)x (the
      O(log n) recall cost priced in vector bytes; the r10 measured
      shape). This is the right trade precisely when vectors cannot
      broadcast: pair-attach would move ~25x more vector bytes than
      the probe fan-out does.

    Policy-wired defaults (r11 VERDICT #2/#5): ``n_planes=None`` derives
    p from the corpus count via :func:`_sdd_planes_for` (the adaptive
    cost contract) and ``hint_broadcast=None`` picks the shape via
    :func:`_sdd_shape_for` (broadcast feasibility of the vector table)
    — both need the corpus count, taken from ``n_rows`` when the caller
    already has it, else ONE ``vectors.count()`` job at plan-build
    time. Explicit values override the policy.

    Output contract matches :func:`semantic_dedup`: (id, cell, kept) —
    cell is the primary cell.
    """
    if n_planes is None or hint_broadcast is None:
        if n_rows is None:
            n_rows = vectors.count()
        if n_planes is None:
            n_planes = _sdd_planes_for(n_rows)
        if hint_broadcast is None:
            hint_broadcast = _sdd_shape_for(n_rows, dim)
    planes = _hyperplane_signs(dim, n_planes)
    assigned = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(vec_col, dim).alias("nrm"),
        _sign_pattern_cell(vec_col, planes).alias("cell"),
    )
    # primary probe + one probe per SET bit (cleared): struct(cell,
    # primary?) with unset-bit slots nulled out then compacted
    probes = F.explode(
        F.concat(
            F.array(
                F.struct(
                    F.col("cell").alias("c"), F.lit(True).alias("pri")
                )
            ),
            F.filter(
                F.array(
                    *[
                        F.when(
                            F.col("cell").bitwiseAND(F.lit(1 << p))
                            != 0,
                            F.struct(
                                F.col("cell")
                                .bitwiseXOR(F.lit(1 << p))
                                .alias("c"),
                                F.lit(False).alias("pri"),
                            ),
                        )
                        for p in range(n_planes)
                    ]
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    # primary-primary matches obey id order (each same-cell pair once);
    # cleared-bit matches arrive in whichever id order the set-bit
    # member sits on, so the dropped id is the GREATER of the two
    pair_rule = F.when(
        F.col("pri"), F.col("lo_id") < F.col("hi_id")
    ).otherwise(F.col("lo_id") != F.col("hi_id"))
    verified = (
        F.round(
            dot("lo_vec", "hi_vec", dim)
            / (F.col("lo_nrm") * F.col("hi_nrm")),
            round_digits,
        )
        >= min_cos
    )
    if hint_broadcast:
        lo = assigned.select(
            F.col("id").alias("lo_id"), probes.alias("pr")
        ).select(
            "lo_id", F.col("pr.c").alias("cell"), F.col("pr.pri").alias("pri")
        )
        hi = assigned.select(F.col("id").alias("hi_id"), "cell")
        # pairs normalized to (keep_id, drop_id) so the broadcast
        # vector-attach joins see one canonical orientation. NO
        # pair-level distinct before the attach (r11 ADVICE low,
        # closed by MEASUREMENT rather than applied): the halving
        # already generates each pair at most once per direction, the
        # measured duplicate factor at the u100 stress shape is
        # ~1.008x, and a dedup would EXCHANGE the entire collision
        # volume (~138M 16 B rows there) to save <1% of map-side
        # cosines — measured +28% wall on the banded sibling. The
        # drop-id distinct below is the dedup that matters (bounded by
        # the corpus, not the collision volume).
        cand = (
            lo.join(hi, "cell")
            .where(pair_rule)
            .select(
                F.least(F.col("lo_id"), F.col("hi_id")).alias("keep_id"),
                F.greatest(F.col("lo_id"), F.col("hi_id")).alias("drop_id"),
            )
        )
        keep_vecs = assigned.select(
            F.col("id").alias("keep_id"), F.col("vec").alias("lo_vec"),
            F.col("nrm").alias("lo_nrm"),
        )
        drop_vecs = assigned.select(
            F.col("id").alias("drop_id"), F.col("vec").alias("hi_vec"),
            F.col("nrm").alias("hi_nrm"),
        )
        dropped = (
            cand.join(F.broadcast(keep_vecs), "keep_id")
            .join(F.broadcast(drop_vecs), "drop_id")
            .where(verified)
            .select(F.col("drop_id").alias("id"))
            .distinct()
        )
    else:
        lo = assigned.select(
            F.col("id").alias("lo_id"), F.col("vec").alias("lo_vec"),
            F.col("nrm").alias("lo_nrm"), probes.alias("pr"),
        ).select(
            "lo_id", "lo_vec", "lo_nrm",
            F.col("pr.c").alias("cell"), F.col("pr.pri").alias("pri"),
        )
        hi = assigned.select(
            F.col("id").alias("hi_id"), F.col("vec").alias("hi_vec"),
            F.col("nrm").alias("hi_nrm"), "cell",
        )
        dropped = (
            lo.join(hi, "cell")
            .where(pair_rule)
            .where(verified)
            .select(F.greatest(F.col("lo_id"), F.col("hi_id")).alias("id"))
            .distinct()
        )
    return assigned.join(
        dropped.withColumn("_drop", F.lit(True)), "id", "left"
    ).select(
        "id", "cell", F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept")
    )


def semantic_dedup_banded(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | None = None,
    n_bands: int | None = None,
    min_cos: float = 0.9,
    round_digits: int = 6,
    hint_broadcast: bool | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """OR-amplified semantic dedup: ``n_bands`` INDEPENDENT p-plane
    sign-pattern codes; a pair is a candidate when it shares a cell in
    ANY band, verified by exact cosine, keep-lowest-id. This is the b×r
    discipline the text family's ``dedup_minhash_lsh`` already uses
    (OR of ANDs), applied to the embedding family — the r10 VERDICT's
    #1: the single-code family's recall (1-θ/π)^p DECAYS as p tracks
    the corpus (53.8% measured at p=5, ~16% predicted at the u100
    shape's p=12), while r independent bands give
    recall = 1 - (1 - s^p)^r with s = 1-θ/π — tunable to a TARGET by
    raising r, independent of corpus growth (the
    ``_sdd_params_for`` policy derives r from (n, min_cos,
    target_recall) in closed form). Bands are disjoint slices of the
    one deterministic md5 plane family (planes are iid, so consecutive
    slices ARE independent codes — the exact layout
    ``_banded_scored_pairs`` uses for contamination); band 0's planes
    are the single-code family's planes, so the banded candidate set
    is a strict superset of :func:`semantic_dedup_lsh`'s by
    construction.

    Scale shape: assignment is map-side (p·r fold dot products per
    row, zero fit); each band is a self-equi-join on (band, cell) with
    the family's cells-∝-corpus population bound, so candidate volume
    is r × the single-code join — linear in the corpus per band. Cost
    honesty: holding recall FIXED as the corpus grows means r itself
    grows ~s^(-p) = n^(log2(1/s)) (~n^0.22 at cos 0.9) — the classic
    sub-quadratic LSH exponent, vastly under the n² of exact dedup and
    the price of not letting recall decay.

    Exchange discipline — TWO shapes, chosen by ``hint_broadcast``,
    results identical (a pair colliding in several bands verifies more
    than once in either shape's arithmetic; the drop set dedups):

    - ``hint_broadcast=True`` (default — the corpus VECTOR table fits
      executor memory, as every registered gate's does): the (band,
      cell) self-join ships ONLY (id, band, cell) keys (r key rows per
      vector, ~20 B each), candidate id-pairs form, and vectors attach
      map-side via two EXPLICITLY broadcast id-keyed joins — corpus
      vectors never enter the shuffle. Forced, not left to AQE: a
      vector table a shade over the auto threshold silently flips the
      attach joins to sort-merge, which sorts pair-count x
      vector-width intermediates (~r·pop/2 rows PER VECTOR carrying
      ~520 B — measured as a disk-filling multi-GB spill at the u100
      stress scale) — strictly worse than either deliberate shape.
    - ``hint_broadcast=False`` (the unbounded-corpus escape hatch,
      same convention as :func:`semantic_contamination`): both sides
      of each band join carry the vector, pairs are cosine-verified
      inside the join and never materialize — the corpus vector
      payload rides the band exchange ×r, exactly the per-band
      signature discipline text MinHash-LSH uses
      (``operators/dedup.py``). Right when vectors cannot broadcast:
      pair-attach would move ~pop/2 x more vector bytes than the band
      fan-out does.

    Policy-wired defaults (r11 VERDICT #2/#5 — the old fixed
    ``n_bands=4`` default was wired to nothing): ``n_planes=None`` /
    ``n_bands=None`` derive (p, r) from the corpus count via
    :func:`_sdd_params_for` (the recall-target policy, min_cos-aware)
    and ``hint_broadcast=None`` picks the exchange shape via
    :func:`_sdd_shape_for` — the count is taken from ``n_rows`` when
    the caller already has it, else ONE ``vectors.count()`` job at
    plan-build time. Explicit values override the policy.

    Output contract matches :func:`semantic_dedup`: (id, cell, kept) —
    cell is the BAND-0 cell (= the single-code family's cell).
    """
    if n_planes is None or n_bands is None or hint_broadcast is None:
        if n_rows is None:
            n_rows = vectors.count()
        if n_planes is None or n_bands is None:
            pol_p, pol_r = _sdd_params_for(n_rows, min_cos)
            n_planes = pol_p if n_planes is None else n_planes
            n_bands = pol_r if n_bands is None else n_bands
        if hint_broadcast is None:
            hint_broadcast = _sdd_shape_for(n_rows, dim)
    if n_bands < 1 or n_planes < 1:
        raise ValueError("n_bands and n_planes must be >= 1")
    planes = _hyperplane_signs(dim, n_planes * n_bands)
    # two-step select: the shared projections column is computed ONCE
    # and referenced by every band's cell — Catalyst keeps the split
    # (non-cheap expr used r times is never collapse-inlined), so the
    # p·r dot products are one pass and one expression tree (r12)
    assigned = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(vec_col, dim).alias("nrm"),
        _sign_pattern_projs(vec_col, planes).alias("_pj"),
    ).select(
        "id",
        "vec",
        "nrm",
        *[
            _cell_from_projs(F.col("_pj"), b * n_planes, n_planes).alias(
                f"c{b}"
            )
            for b in range(n_bands)
        ],
    )
    bands_arr = F.posexplode(
        F.array(*[F.col(f"c{b}") for b in range(n_bands)])
    )
    verified = (
        F.round(
            dot("lo_vec", "hi_vec", dim)
            / (F.col("lo_nrm") * F.col("hi_nrm")),
            round_digits,
        )
        >= min_cos
    )
    if hint_broadcast:
        keys = assigned.select("id", bands_arr.alias("band", "cell"))
        lo = keys.select(F.col("id").alias("lo_id"), "band", "cell")
        hi = keys.select(F.col("id").alias("hi_id"), "band", "cell")
        # NO pair-level distinct before the attach (r11 ADVICE low,
        # closed by MEASUREMENT rather than applied): a pair colliding
        # in several bands verifies once per band, but the measured
        # duplicate factor at the u100 stress shape is 1.008x
        # (138,581,929 collision rows over 137,527,436 distinct pairs
        # — random pairs rarely share two independent codes), while a
        # distinct would EXCHANGE that entire collision volume to save
        # 0.8% of map-side cosines — measured at +28% gate wall
        # (82.5 s vs 64.7 s at u100). The drop-id distinct below is
        # the dedup that matters: bounded by the corpus, not the
        # collision volume.
        cand = (
            lo.join(hi, ["band", "cell"])
            .where(F.col("lo_id") < F.col("hi_id"))
            .select("lo_id", "hi_id")
        )
        lo_vecs = assigned.select(
            F.col("id").alias("lo_id"), F.col("vec").alias("lo_vec"),
            F.col("nrm").alias("lo_nrm"),
        )
        hi_vecs = assigned.select(
            F.col("id").alias("hi_id"), F.col("vec").alias("hi_vec"),
            F.col("nrm").alias("hi_nrm"),
        )
        dropped = (
            cand.join(F.broadcast(lo_vecs), "lo_id")
            .join(F.broadcast(hi_vecs), "hi_id")
            .where(verified)
            .select(F.col("hi_id").alias("id"))
            .distinct()
        )
    else:
        keys = assigned.select(
            "id", "vec", "nrm", bands_arr.alias("band", "cell")
        )
        lo = keys.select(
            F.col("id").alias("lo_id"), F.col("vec").alias("lo_vec"),
            F.col("nrm").alias("lo_nrm"), "band", "cell",
        )
        hi = keys.select(
            F.col("id").alias("hi_id"), F.col("vec").alias("hi_vec"),
            F.col("nrm").alias("hi_nrm"), "band", "cell",
        )
        dropped = (
            lo.join(hi, ["band", "cell"])
            .where(F.col("lo_id") < F.col("hi_id"))
            .where(verified)
            .select(F.col("hi_id").alias("id"))
            .distinct()
        )
    return assigned.join(
        dropped.withColumn("_drop", F.lit(True)), "id", "left"
    ).select(
        "id",
        F.col("c0").alias("cell"),
        F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
    )


def semantic_dedup_family(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | None = None,
    n_bands: int | None = None,
    min_cos: float = 0.9,
    round_digits: int = 6,
    hint_broadcast: bool | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """ALL THREE semantic-dedup family members in ONE pass (r11 VERDICT
    #3: the recall gate ran :func:`semantic_dedup_lsh`, `_multiprobe`
    AND `_banded` on the same corpus, recomputing the corpus projection
    and the plane dot products three times): one banded assignment —
    whose band 0 IS the single code and whose band-0 probe ring IS the
    multiprobe candidate set — derives every drop set.

    Output: one row per input vector —
    (id, cell, kept_single, kept_multi, kept_banded), where each kept_*
    column is bit-identical to the corresponding operator's ``kept``
    run standalone with the same (p, r): single = same-c0 pairs,
    multi = single ∪ hamming-1-on-c0 pairs (the set-bit-cleared halving
    of :func:`semantic_dedup_multiprobe`), banded = any-shared-band
    pairs; all exact-cosine verified >= ``min_cos``, keep-lowest-id.

    Plan shape: the assignment (p·r plane products per row, the map-side
    cost the three standalone runs paid 3x) is computed ONCE and
    ``localCheckpoint``-materialized — it feeds the band join, the probe
    ring, the vector attach, and the output join, and an eager local
    checkpoint severs those branches from recomputing it (plan-branch
    dedup, the scorer-cache discipline of ``operators/curation.py``).
    Exchange shapes mirror the siblings (``hint_broadcast`` policy via
    :func:`_sdd_shape_for`), over ONE unified key exchange: each vector
    ships its r primary (band, cell) keys plus its band-0 probe-ring
    keys, so a single self-join generates banded, single (band 0), and
    ring candidates together. Both shapes verify cosine IN the same
    stage as candidate generation and fold straight to per-id flags —
    collision volume never exchanges (a pair colliding in several
    bands verifies once per collision; measured duplicate factor
    ~1.008x at u100, while a pair-level dedup would exchange the full
    collision volume — measured +28% wall on the banded sibling). The
    shapes differ only in where vectors travel: broadcast attaches
    them map-side to the join output via forced broadcast; carry ships
    them through the key exchange (the unbounded-corpus discipline).

    Policy-wired defaults as the siblings: (p, r) from
    :func:`_sdd_params_for`, shape from :func:`_sdd_shape_for`, corpus
    count from ``n_rows`` or one ``vectors.count()`` at plan-build.
    """
    if n_planes is None or n_bands is None or hint_broadcast is None:
        if n_rows is None:
            n_rows = vectors.count()
        if n_planes is None or n_bands is None:
            pol_p, pol_r = _sdd_params_for(n_rows, min_cos)
            n_planes = pol_p if n_planes is None else n_planes
            n_bands = pol_r if n_bands is None else n_bands
        if hint_broadcast is None:
            hint_broadcast = _sdd_shape_for(n_rows, dim)
    if n_bands < 1 or n_planes < 1:
        raise ValueError("n_bands and n_planes must be >= 1")
    planes = _hyperplane_signs(dim, n_planes * n_bands)
    # shared-projections assignment (see semantic_dedup_banded) then an
    # EAGER local checkpoint: the assignment feeds the key exchange,
    # the vector attach, and the output join — materializing it severs
    # those branches from recomputing the p·r dot products
    assigned = (
        vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            norm(vec_col, dim).alias("nrm"),
            _sign_pattern_projs(vec_col, planes).alias("_pj"),
        )
        .select(
            "id",
            "vec",
            "nrm",
            *[
                _cell_from_projs(
                    F.col("_pj"), b * n_planes, n_planes
                ).alias(f"c{b}")
                for b in range(n_bands)
            ],
        )
        .localCheckpoint(eager=True)
    )
    # ONE key exchange for the whole family, ASYMMETRIC by design: the
    # PROBE side (lo) ships r primary (band, cell) keys tagged
    # pri=true PLUS the band-0 hamming-1 probe keys (primary c0 with
    # each SET bit cleared — the multiprobe halving) tagged pri=false;
    # the INDEX side (hi) ships primaries ONLY. A pri×pri match at
    # band b is a banded candidate (b==0 ⟹ also the single code's); a
    # probe-row match at band 0 is a ring candidate, generated exactly
    # once by the pair's set-bit member as lo (the clear-bit member
    # cannot reach back by clearing). Probes must NOT appear on the hi
    # side: a symmetric join manufactures probe×probe products
    # (hamming-2 garbage the validity filter discards AFTER the join
    # produced them — measured +50% family wall at u100) and a second
    # copy of every ring pair.
    key_structs = F.concat(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.col(f"c{b}").alias("cell"),
                    F.lit(True).alias("pri"),
                )
                for b in range(n_bands)
            ]
        ),
        F.filter(
            F.array(
                *[
                    F.when(
                        F.col("c0").bitwiseAND(F.lit(1 << p)) != 0,
                        F.struct(
                            F.lit(0).alias("band"),
                            F.col("c0")
                            .bitwiseXOR(F.lit(1 << p))
                            .alias("cell"),
                            F.lit(False).alias("pri"),
                        ),
                    )
                    for p in range(n_planes)
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    verified = (
        F.round(
            dot("lo_vec", "hi_vec", dim)
            / (F.col("lo_nrm") * F.col("hi_nrm")),
            round_digits,
        )
        >= min_cos
    )
    pp = F.col("lo_pri")  # hi side is primaries only
    # pri×pri pairs obey id order (each same-cell band pair once);
    # ring matches arrive in whichever id order the set-bit member
    # sits on, so only self-pairs are excluded there
    valid = F.when(pp, F.col("lo_id") < F.col("hi_id")).otherwise(
        F.col("lo_id") != F.col("hi_id")
    )
    if hint_broadcast:
        keys = assigned.select(
            "id", F.explode(key_structs).alias("k")
        ).select("id", "k.band", "k.cell", "k.pri")
        lo_k = keys.select(
            F.col("id").alias("lo_id"), "band", "cell",
            F.col("pri").alias("lo_pri"),
        )
        hi_k = keys.where(F.col("pri")).select(
            F.col("id").alias("hi_id"), "band", "cell"
        )
        lo_vecs = assigned.select(
            F.col("id").alias("lo_id"), F.col("vec").alias("lo_vec"),
            F.col("nrm").alias("lo_nrm"),
        )
        hi_vecs = assigned.select(
            F.col("id").alias("hi_id"), F.col("vec").alias("hi_vec"),
            F.col("nrm").alias("hi_nrm"),
        )
        # keys-only exchange, vectors attached MAP-SIDE to the join
        # output via forced broadcast, cosine verified in the same
        # stage, and only verified matches reach the (tiny, id-keyed)
        # flag fold — NO pair-level exchange at all. A pair colliding
        # in several bands verifies once per collision; the measured
        # duplicate factor at the u100 stress shape is ~1.008x, while
        # deduplicating first would exchange the full collision
        # volume (the banded sibling measured that at +28% wall).
        drops = (
            lo_k.join(hi_k, ["band", "cell"])
            .where(valid)
            .join(F.broadcast(lo_vecs), "lo_id")
            .join(F.broadcast(hi_vecs), "hi_id")
            .where(verified)
            .select(
                F.greatest(F.col("lo_id"), F.col("hi_id")).alias("id"),
                (pp & (F.col("band") == 0)).alias("m_b0"),
                pp.alias("m_band"),
                (~pp).alias("m_ring"),
            )
            .groupBy("id")
            .agg(
                F.max("m_b0").alias("d_s"),
                F.max(F.col("m_b0") | F.col("m_ring")).alias("d_m"),
                F.max("m_band").alias("d_b"),
            )
        )
    else:
        keys = assigned.select(
            "id", "vec", "nrm", F.explode(key_structs).alias("k")
        ).select("id", "vec", "nrm", "k.band", "k.cell", "k.pri")
        lo_k = keys.select(
            F.col("id").alias("lo_id"), F.col("vec").alias("lo_vec"),
            F.col("nrm").alias("lo_nrm"), "band", "cell",
            F.col("pri").alias("lo_pri"),
        )
        hi_k = keys.where(F.col("pri")).select(
            F.col("id").alias("hi_id"), F.col("vec").alias("hi_vec"),
            F.col("nrm").alias("hi_nrm"), "band", "cell",
        )
        # verify in-join (vectors ride the exchange; pairs never
        # materialize), then fold per-match flags straight to the
        # dropped id — greatest(lo, hi) == hi for pri×pri (lo<hi
        # enforced) and the ring drop rule for probe matches
        drops = (
            lo_k.join(hi_k, ["band", "cell"])
            .where(valid)
            .where(verified)
            .select(
                F.greatest(F.col("lo_id"), F.col("hi_id")).alias("id"),
                (pp & (F.col("band") == 0)).alias("m_b0"),
                pp.alias("m_band"),
                (~pp).alias("m_ring"),
            )
            .groupBy("id")
            .agg(
                F.max("m_b0").alias("d_s"),
                F.max(F.col("m_b0") | F.col("m_ring")).alias("d_m"),
                F.max("m_band").alias("d_b"),
            )
        )
    return assigned.join(drops, "id", "left").select(
        "id",
        F.col("c0").alias("cell"),
        F.coalesce(~F.col("d_s"), F.lit(True)).alias("kept_single"),
        F.coalesce(~F.col("d_m"), F.lit(True)).alias("kept_multi"),
        F.coalesce(~F.col("d_b"), F.lit(True)).alias("kept_banded"),
    )


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. The cross join becomes an equi-join on bucket — at 100 TB this
    is the difference between Q x N and Q x N/2^planes scored pairs.

    Output: (query_id, neighbor_id, rank, cos); recall vs brute force is
    tested in tests/test_similarity.py.
    """
    bucket = lsh_bucket(vec_col, dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col, dim).alias("q_norm"),
        bucket.alias("bucket"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col, dim).alias("c_norm"),
        bucket.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot("q_vec", "c_vec", dim)
                / (F.col("q_norm") * F.col("c_norm")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ann_lsh_multiprobe(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 8,
    probe_bits: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """:func:`ann_lsh_topk` with MULTI-PROBE querying (Lv et al., VLDB'07
    — the standard production recall lever): each query scores its own
    bucket PLUS every bucket within hamming ``probe_bits`` of it, i.e.
    the buckets a true neighbor most likely fell into when a single
    near-threshold hyperplane projection flipped its sign.

    Why this beats more tables/fewer planes at 100 TB: recall grows
    ~(1 + n_planes)x per extra probed bit with ZERO extra index state —
    the corpus is still bucketed ONCE (each vector lives in exactly one
    bucket, so probe candidate sets are disjoint and need no dedup);
    only the broadcast-sized query side fans out. Scored pairs are
    Q x (1 + n_planes·probe_bits) x N/2^planes.

    Output: (query_id, neighbor_id, rank, cos) — same contract as
    :func:`ann_lsh_topk`; rank ties broken by neighbor id.
    """
    if probe_bits != 1:
        raise NotImplementedError(
            "probe_bits > 1 multiplies probes combinatorially; the "
            "1-bit ring is the documented production sweet spot"
        )
    bucket = lsh_bucket(vec_col, dim, n_planes)
    probes = F.explode(
        F.array(
            bucket,
            *[
                bucket.bitwiseXOR(F.lit(1 << p))
                for p in range(n_planes)
            ],
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col, dim).alias("q_norm"),
        probes.alias("bucket"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col, dim).alias("c_norm"),
        bucket.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot("q_vec", "c_vec", dim)
                / (F.col("q_norm") * F.col("c_norm")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ---------------------------------------------------------------------------
# product quantization: compressed-domain ANN (ADC scoring)
# ---------------------------------------------------------------------------


def fit_pq_codebooks(
    sample: list[tuple[int, list[float]]],
    n_sub: int,
    k: int,
    iters: int = 8,
) -> list[list[list[float]]]:
    """Deterministic per-subspace L2 k-means → ``n_sub`` codebooks of ``k``
    codewords each (classic product quantization, Jégou et al. 2011 —
    public method).

    Same reproducibility contract as :func:`fit_ivf_centroids`: id-sorted
    driver sample, lowest-id init, ``np.argmin`` tie-break toward the
    smaller codeword index, float64 means, fixed iteration count — so the
    fitted codebooks inline as bit-identical literals in the Spark plan
    AND the SQL oracle.
    """
    import numpy as np

    X = np.array([v for _, v in sample], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"sample of {len(X)} vectors cannot seed {k} codewords")
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    w = dim // n_sub
    books: list[list[list[float]]] = []
    for m in range(n_sub):
        S = X[:, m * w : (m + 1) * w]
        C = S[:k].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(k):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append([[float(x) for x in row] for row in C])
    return books


def pq_dist2_sql(vec_fmt, codeword: list[float], offset: int) -> str:
    """Expanded squared-L2 text between a vector's subspace slice and one
    codeword: ``(v[i]-c)*(v[i]-c) + ...`` in fixed left-to-right order.

    ``vec_fmt(i)`` renders the i-th (1-based, global) vector element for
    the target engine — the ONLY dialect difference between the Spark plan
    and the DuckDB oracle, so both engines evaluate bit-identical doubles
    and therefore pick bit-identical codes (the discrete part of PQ must
    not drift; the continuous score part is rounded instead).
    """
    terms = []
    for j, c in enumerate(codeword):
        e = f"({vec_fmt(offset + j + 1)} - {_dbl(c)})"
        terms.append(f"{e} * {e}")
    return " + ".join(terms)


def pq_code_sql(vec_fmt, book: list[list[float]], offset: int, list_fn: str) -> str:
    """argmin-over-codewords text: 1-based index of the nearest codeword,
    first (lowest) index on exact ties in both engines
    (Spark ``array_position``/DuckDB ``list_position`` both return the
    first occurrence). ``list_fn`` names the engine's array constructor
    pair: ``("array", "array_min", "array_position")`` for Spark,
    lists for DuckDB — passed as a format key to stay one generator.
    """
    arr, amin, apos = {
        "spark": ("array", "array_min", "array_position"),
        "duckdb": ("list_value", "list_min", "list_position"),
    }[list_fn]
    dists = ", ".join(pq_dist2_sql(vec_fmt, cw, offset) for cw in book)
    return f"{apos}({arr}({dists}), {amin}({arr}({dists})))"


def _pq_spark_sql(
    vec_col: str, codebooks: list[list[list[float]]]
) -> tuple[str, str, str, str]:
    """The four PQ expression texts — ``(codes, norm2hat, lut, num)`` —
    shared verbatim by :func:`pq_topk` and :func:`ann_ivfpq_topk` so the
    combined index cannot drift from the flat PQ scan by even a bit
    (``codes``/``lut`` reference ``vec_col``; ``norm2hat``/``num``
    reference the produced ``codes``/``lut`` columns by name).

    All hot expressions are written as ONE lambda looping over literal
    codeword arrays (constant data), never unrolled per-codeword terms:
    the unrolled form generated ~2048 expression nodes per stage and paid
    seconds of Janino codegen on every execution (measured 5-10 s/stage
    at sf0.1) — the same lesson as the IVF single-parse cell-score SQL.
    The aggregate fold starts at CAST(0 AS DOUBLE) and adds element-order
    left-to-right, which is bit-identical to the oracle generator's
    expanded `t1 + t2 + ...` sum, so codes still cannot drift.
    """
    n_sub, kw = len(codebooks), len(codebooks[0])
    w = len(codebooks[0][0])
    dist_tpl = (
        "transform(array({cents}), c -> aggregate(zip_with({vec}, c, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t))"
    )
    code_parts = []
    for m, book in enumerate(codebooks):
        cents = ", ".join(
            "array(" + ", ".join(_dbl(x) for x in cw) + ")" for cw in book
        )
        d = dist_tpl.format(cents=cents, vec=f"slice(`{vec_col}`, {m * w + 1}, {w})")
        code_parts.append(f"CAST(array_position({d}, array_min({d})) AS INT)")
    codes_sql = f"array({', '.join(code_parts)})"

    n2_arr = "array({})".format(
        ", ".join(_dbl(sum(x * x for x in cw)) for book in codebooks for cw in book)
    )
    # reconstructed norm from codes alone: fold over (code, subspace) pairs,
    # one reference to the literal norm table; element_at is 1-based, codes
    # are 1-based argmin positions, so index = m*kw + code
    norm2hat = (
        f"aggregate(zip_with(codes, sequence(0, {n_sub - 1}), "
        f"(c, m) -> element_at({n2_arr}, m * {kw} + c)), "
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    # per-query LUT: <q_m, codeword> for all n_sub x kw codewords, flat,
    # index m*kw + code (1-based) — one transform over offset-tagged
    # codeword structs
    luts = ", ".join(
        f"struct({m * w} AS off, array({', '.join(_dbl(x) for x in cw)}) AS cv)"
        for m, book in enumerate(codebooks)
        for cw in book
    )
    lut_sql = (
        f"transform(array({luts}), c -> aggregate(zip_with("
        f"slice(`{vec_col}`, c.off + 1, {w}), c.cv, "
        "(x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, t) -> acc + t))"
    )
    num = (
        f"aggregate(zip_with(codes, sequence(0, {n_sub - 1}), "
        f"(c, m) -> element_at(lut, m * {kw} + c)), "
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    return codes_sql, norm2hat, lut_sql, num


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Compressed-domain approximate top-k by asymmetric distance
    computation (ADC): base vectors live only as ``n_sub`` small codes,
    queries score them through per-query lookup tables.

    100 TB story: PQ8x16 stores 4 bits/subspace x 8 = 8 bytes/vector
    (vs 256 bytes raw float32 at dim 64) — the corpus-side scan reads
    codes, never raw vectors. Encoding is a pure map-side projection
    (codebooks inlined as literals, zero shuffle, zero Python); the
    scored pair join broadcasts the query side (queries carry a
    128-double LUT each); the reconstructed-norm correction
    ``sqrt(sum ||c||^2)`` comes from a literal lookup, so cosine-like
    ranking needs no raw-vector access at all. Exact re-scoring of the
    winners (IVF-style refine) would add one id-join against the raw
    table — deliberately not done here: the gate checks the pure
    compressed-domain ranking.

    Output: (query_id, neighbor_id, rank, score).
    """
    if "`" in vec_col:
        raise ValueError(f"vec_col must not contain backticks: {vec_col!r}")
    n_sub = len(codebooks)
    w = len(codebooks[0][0])
    codes_sql, norm2hat, lut_sql, num = _pq_spark_sql(vec_col, codebooks)
    coded = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.expr(codes_sql).alias("codes")
    ).withColumn("nhat", F.expr(f"sqrt({norm2hat})"))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        norm(vec_col, n_sub * w).alias("qnorm"),
        F.expr(lut_sql).alias("lut"),
    )
    scored = (
        coded.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score", F.expr(f"round(({num}) / (qnorm * nhat), {round_digits})")
        )
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
    )
    return (
        scored.withColumn("rank", rn)
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ann_ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """IVF+PQ combined index (Jégou et al. TPAMI'11 IVFADC structure,
    FAISS ``IVFx,PQy`` with ``by_residual=False``): the coarse quantizer
    prunes WHICH vectors a query scores (probe ``n_probe`` of the fitted
    cells), product quantization compresses WHAT is scored (codes +
    reconstructed norm, never raw floats) — the two existing scale paths
    composed into the production billion-vector shape.

    Corpus side is one map-side projection (centroids AND codebooks
    inlined as literals — zero shuffle, zero Python): each vector emits
    ``(cell, codes, nhat)``. At 100 TB the cell column is the partition
    key and the stored row is ~n_sub bytes of codes, so one probed cell
    is one co-located scan of a compressed postings list. Query side
    probes the first ``n_probe`` entries of the SAME sorted cell-score
    array the corpus assignment uses (so ``n_probe = K`` degenerates to
    exactly the flat PQ scan — pinned by
    ``test_ivfpq_probe_all_equals_flat_pq``), carries a per-query ADC
    lookup table, and broadcasts: scored pairs ~ Q x N*(n_probe/K), each
    scored through the LUT fold shared verbatim with :func:`pq_topk`
    (:func:`_pq_spark_sql`), so the combined index cannot rank-drift
    from the flat scan on the cells it does probe.

    Deliberately no exact re-rank refine step (same contract as
    :func:`pq_topk`): the gate checks the pure compressed-domain
    ranking; a refine is one id-equi-join against the raw table.

    Output: (query_id, neighbor_id, rank, score) — the shared ANN
    contract of :func:`brute_force_topk` / :func:`ann_ivf_topk` /
    :func:`pq_topk`.
    """
    if "`" in vec_col:
        raise ValueError(f"vec_col must not contain backticks: {vec_col!r}")
    n_sub = len(codebooks)
    w = len(codebooks[0][0])
    dim = len(centroids[0])
    if n_sub * w != dim:
        raise ValueError(
            f"codebooks cover dim {n_sub * w} but centroids have dim {dim}"
        )
    vn = "__ivfpq_vnorm__"
    for side, df_in in (("vectors", vectors), ("queries", queries)):
        if vn in df_in.columns:
            raise ValueError(f"{side} already has internal column {vn!r}")
    cells_sql = _cell_scores_sql(f"`{vec_col}`", f"`{vn}`", centroids, round_digits)
    codes_sql, norm2hat, lut_sql, num = _pq_spark_sql(vec_col, codebooks)

    coded = (
        vectors.withColumn(vn, norm(vec_col, dim))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.expr(f"-element_at({cells_sql}, 1).ncid").alias("cell"),
            F.expr(codes_sql).alias("codes"),
        )
        .withColumn("nhat", F.expr(f"sqrt({norm2hat})"))
    )
    q = (
        queries.withColumn(vn, norm(vec_col, dim))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vn).alias("qnorm"),
            F.expr(lut_sql).alias("lut"),
            F.expr(
                f"explode(transform(slice({cells_sql}, 1, {n_probe}), s -> -s.ncid))"
            ).alias("cell"),
        )
    )
    # every corpus vector lives in exactly ONE cell, so the probe fan-out
    # cannot duplicate a (query, neighbor) pair — no DISTINCT needed
    # (unlike multi-band LSH where a pair can collide in several bands)
    scored = (
        coded.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score", F.expr(f"round(({num}) / (qnorm * nhat), {round_digits})")
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
    )
    return (
        scored.withColumn("rank", rn)
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ann_ivfpq_refine(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    refine: int = 10,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """IVF+PQ search with an exact re-rank tail — the full FAISS
    ``index.search`` + refine recipe: the compressed-domain scan
    (:func:`ann_ivfpq_topk`) keeps ``refine`` candidates per query by
    ADC score, then ONE raw-vector fetch re-scores exactly and the
    final top-``k`` ranks on true cosine. PQ distortion decides only
    which ``refine`` candidates surface, never the returned order —
    the two-stage trade every production ANN deployment runs (scan
    8-byte codes for the corpus, touch raw floats for Q x refine rows
    only).

    The raw fetch broadcasts the Q x refine candidate list into the
    corpus scan (one pass, no corpus shuffle); queries broadcast with
    their raw vectors. If the true top-k survive the compressed stage,
    the output IS the brute-force answer — probe=K with corpus-sized
    ``refine`` is pinned equal to :func:`brute_force_topk` by
    ``test_ivfpq_refine_probe_all_is_brute_force``.

    Output: (query_id, neighbor_id, rank, cos) — exact cosine, the
    :func:`brute_force_topk` contract (so refined results are directly
    comparable to the exact baseline, unlike the ADC ``score``).
    """
    dim = len(centroids[0])
    cand = ann_ivfpq_topk(
        vectors, queries, centroids, codebooks,
        id_col=id_col, vec_col=vec_col,
        n_probe=n_probe, k=refine, round_digits=round_digits,
    ).select("query_id", "neighbor_id")
    vn = "__refine_vnorm__"
    raw_n = vectors.withColumn(vn, norm(vec_col, dim)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        F.col(vn).alias("n_norm"),
    )
    raw_q = queries.withColumn(vn, norm(vec_col, dim)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(vn).alias("q_norm"),
    )
    scored = (
        raw_n.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(raw_q), "query_id")
        .withColumn(
            "cos",
            F.round(
                dot("q_vec", "n_vec", dim)
                / (F.col("q_norm") * F.col("n_norm")),
                round_digits,
            ),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
    )
    return (
        scored.withColumn("rank", rn)
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ---------------------------------------------------------------------------
# domain fingerprints: per-group centroid similarity matrix
# ---------------------------------------------------------------------------

#: exact accumulator for centroid components rounded to 6 decimals
_CENT_DEC = "decimal(18,6)"
#: exact accumulator for products of 9-decimal centroid components
_PROD_DEC = "decimal(38,18)"


def source_centroid_similarity(
    docs: DataFrame,
    vectors: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    group_col: str = "source",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine similarity between per-group embedding centroids.

    Mixture-design analytics: before choosing domain sampling weights, a
    pipeline wants to know which sources are semantically redundant
    (near-parallel centroids) and which add diversity. Output is the
    strict upper triangle (group_a < group_b, cos) of the centroid
    similarity matrix.

    Scale shape — everything after the id join is tiny:

    - vectors ⋈ docs is a co-partitioned equi shuffle join on the id
      (the one corpus-sized exchange);
    - per-(group, dim) centroid means are a map-side-combined aggregate
      whose output is |groups| x dim rows;
    - the pairwise matrix is a self-join of that small table — never a
      row-level all-pairs.

    Cross-engine exactness (the logreg discipline): components round to
    6 then accumulate as DECIMAL(18,6) (order-independent); centroid
    means round to 9; dot/norm terms accumulate as DECIMAL(38,18); one
    final double division + round(6).
    """
    joined = vectors.join(
        docs.select(F.col(doc_id_col).alias(vec_id_col), group_col),
        vec_id_col,
    )
    comps = joined.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    cent = (
        comps.groupBy("grp", "dim")
        .agg(
            F.sum(
                F.round(F.col("v").cast("double"), 6).cast(_CENT_DEC)
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "grp",
            "dim",
            F.round(F.col("s").cast("double") / F.col("n"), 9).alias("c"),
        )
    )
    norms = (
        cent.select("grp", (F.col("c") * F.col("c")).cast(_PROD_DEC).alias("c2"))
        .groupBy("grp")
        .agg(F.sum("c2").alias("n2"))
    )
    a = cent.select(
        F.col("grp").alias("group_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("grp").alias("group_b"), "dim", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "dim")
        .where(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            (F.col("ca") * F.col("cb")).cast(_PROD_DEC).alias("t"),
        )
        .groupBy("group_a", "group_b")
        .agg(F.sum("t").alias("dp"))
    )
    na = norms.select(F.col("grp").alias("group_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("grp").alias("group_b"), F.col("n2").alias("n2b"))
    return (
        dots.join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
        .select(
            "group_a",
            "group_b",
            F.round(
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("n2a").cast("double"))
                    * F.sqrt(F.col("n2b").cast("double"))
                ),
                6,
            ).alias("cos"),
        )
    )
