"""Property tests for the beyond-reference pipeline operators.

The DuckDB oracle gate (tools/oracle_check.py) pins each operator's output
values; these tests pin the *relationships between* operators — the
guarantees that justify the scale paths:

- the Arrow-matmul top-k is value-identical to the expression-fold top-k
  (same algorithm, two execution strategies);
- prefix filtering is lossless (candidate pruning never drops a true pair);
- LSH-verified pairs are exactly the true-Jaccard pairs they claim to be
  (verification soundness; banding may miss pairs, never invent them);
- IVF ANN obeys its output contract (k per query, dense ranks, valid cos).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from cruncher_spark.sources import Star, fan_out

    return fan_out(Star(spark, SF_DIR).documents).persist()


@pytest.fixture(scope="module")
def emb(spark):
    from cruncher_spark.sources import Star, fan_out

    return fan_out(Star(spark, SF_DIR).embeddings).persist()


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_arrow_topk_matches_expression_topk(emb):
    from cruncher_spark.operators.similarity import (
        brute_force_topk,
        score_topk_arrow,
    )

    queries = emb.filter((F.col("vec_id") % 20) == 0)
    expr = brute_force_topk(emb, queries, k=3).collect()
    arrow = score_topk_arrow(emb, queries, k=3).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(map(tuple, expr), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, arrow), key=lambda t: (t[0], t[2])
    )
    assert len(expr) > 0


def test_prefix_filter_is_lossless(docs):
    from cruncher_spark.operators.dedup import (
        jaccard_pairs,
        prefix_jaccard_pairs,
        shingle_arrays,
        shingle_table,
    )

    tau = 0.5
    naive = jaccard_pairs(shingle_table(docs, "doc_id", "text"), "doc_id", tau)
    pruned = prefix_jaccard_pairs(
        shingle_arrays(docs, "doc_id", "text"), "doc_id", tau
    )
    assert _pairs(naive) == _pairs(pruned)


def test_prefix_join_hot_shingle_guard(spark):
    """VERDICT r3 #5: a stopword shingle shared by half the corpus must not
    grow an unbounded collect_list group. With df_cap forced low enough that
    the stopword routes through the broadcast-join branch, the output must
    still be IDENTICAL to the quadratic baseline (the guard is a memory
    bound, not an approximation)."""
    from cruncher_spark.operators.dedup import (
        jaccard_pairs,
        prefix_jaccard_pairs,
        shingle_arrays,
        shingle_table,
    )

    rows = []
    # 40 docs; every even doc contains the same stopword trigram (df=20),
    # plus per-doc content; a few near-dup pairs to make output non-trivial
    for i in range(40):
        words = [f"w{i}a w{i}b w{i}c w{i}d w{i}e"]
        if i % 2 == 0:
            words.append("the quick fox")
        if i % 10 == 0:
            # near-duplicate of doc i+1's content
            words = [f"w{i+1}a w{i+1}b w{i+1}c w{i+1}d w{i+1}e x{i}"]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    tau = 0.5
    truth = _pairs(jaccard_pairs(shingle_table(docs, "doc_id", "text"), "doc_id", tau))
    # df_cap=8 < stopword df=20 → stopword shingles MUST take the hot branch
    guarded = prefix_jaccard_pairs(
        shingle_arrays(docs, "doc_id", "text"), "doc_id", tau, df_cap=8
    )
    assert _pairs(guarded) == truth
    assert truth  # the corpus really produces pairs
    # and the default cap (no routing) agrees too
    default = prefix_jaccard_pairs(
        shingle_arrays(docs, "doc_id", "text"), "doc_id", tau
    )
    assert _pairs(default) == truth


def test_lsh_verified_pairs_are_true_pairs(docs):
    from cruncher_spark.operators.dedup import (
        jaccard_pairs,
        minhash_dedup_pairs,
        shingle_table,
    )

    tau = 0.5
    truth = _pairs(
        jaccard_pairs(shingle_table(docs, "doc_id", "text"), "doc_id", tau)
    )
    lsh = minhash_dedup_pairs(
        docs, "doc_id", "text", min_jaccard=tau, num_hashes=8, band_size=2
    )
    verified = _pairs(lsh)
    # soundness: every emitted pair really has J >= tau
    assert verified <= truth
    # recall sanity: 8 hashes / 4 bands at tau=0.5 should catch most
    if truth:
        assert len(verified) >= len(truth) * 0.5


def test_contamination_check_soundness(spark, docs):
    """Every flagged doc really shares >=1 shingle with the eval set, and
    every unflagged doc shares none (exactness, not approximation)."""
    from cruncher_spark.operators.curation import contamination_check
    from cruncher_spark.operators.dedup import shingle_arrays

    sh = shingle_arrays(docs, "doc_id", "text", 3)
    ev = sh.where(F.col("doc_id") % 10 == 0)
    corpus = sh.where(F.col("doc_id") % 10 != 0)
    flagged = {
        r.doc_id: r.n_matched
        for r in contamination_check(corpus, ev, "doc_id").collect()
    }
    eval_grams = {
        g for r in ev.collect() for g in r.sh
    }
    for r in corpus.collect():
        shared = len(set(r.sh) & eval_grams)
        assert flagged.get(r.doc_id, 0) == shared


def test_stratified_sample_deterministic_and_disjoint(spark, docs):
    from cruncher_spark.operators.curation import stratified_sample

    base = docs.select("doc_id", "lang")
    a = {r.doc_id for r in stratified_sample(
        base, "lang", {"en": 0.5}, "doc_id", default_rate=0.2
    ).collect()}
    b = {r.doc_id for r in stratified_sample(
        base, "lang", {"en": 0.5}, "doc_id", default_rate=0.2
    ).collect()}
    assert a == b and a  # identical across runs
    # repartitioning must not change the selection (unlike df.sample)
    c = {r.doc_id for r in stratified_sample(
        base.repartition(13), "lang", {"en": 0.5}, "doc_id", default_rate=0.2
    ).collect()}
    assert c == a
    # complementary hash ranges from the same salt → leak-proof splits:
    # approximate by sampling the complement rates and checking disjointness
    from cruncher_spark.functions.text import portable_hash64
    from cruncher_spark.operators.curation import SAMPLE_DENOM

    bucket = portable_hash64(F.col("doc_id").cast("string"), salt="strat")
    lo = base.where(bucket % SAMPLE_DENOM < 3000)
    hi = base.where(
        (bucket % SAMPLE_DENOM >= 3000) & (bucket % SAMPLE_DENOM < 10000)
    )
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert not (lo_ids & hi_ids)
    assert lo_ids | hi_ids == {r.doc_id for r in base.collect()}


def test_stratified_sample_rate_rounding(spark):
    """rate*10000 must round, not truncate: 0.57 → 5700, though
    0.57 * 10000 == 5699.999… in binary floating point."""
    from cruncher_spark.functions.text import portable_hash64
    from cruncher_spark.operators.curation import (
        SAMPLE_DENOM,
        stratified_sample,
    )

    base = spark.createDataFrame(
        [(i, "en") for i in range(4000)], "doc_id long, lang string"
    )
    kept = {r.doc_id for r in stratified_sample(
        base, "lang", {"en": 0.57}, "doc_id"
    ).collect()}
    want = {
        r.doc_id
        for r in base.where(
            portable_hash64(F.col("doc_id").cast("string"), salt="strat")
            % SAMPLE_DENOM
            < 5700
        ).collect()
    }
    assert kept == want


def test_stratified_sample_is_map_side_only(spark):
    """The sampler must inline rates into a pure filter: no Exchange, no
    join in the physical plan — the property that makes it free at 100 TB."""
    from cruncher_spark.operators.curation import stratified_sample

    base = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(100)],
        "doc_id long, lang string",
    )
    plan = (
        stratified_sample(base, "lang", {"en": 0.5}, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_quantile_sketch_accuracy(spark):
    """Sketch estimates must land within one bin width of the exact
    discrete quantile (the sketch's resolution guarantee)."""
    import duckdb

    from cruncher_spark.plans import query_map

    got = {
        r.event_type: (r.n, r.p50_est, r.p95_est)
        for r in query_map()["quantile_sketch"](spark, SF_DIR).collect()
    }
    exact = {
        t: (p50, p95)
        for t, p50, p95 in duckdb.sql(
            f"""SELECT event_type,
                quantile_disc(value, 0.5), quantile_disc(value, 0.95)
                FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"""
        ).fetchall()
    }
    assert set(got) == set(exact) and got
    for t, (n, p50_est, p95_est) in got.items():
        assert n > 0
        assert abs(p50_est - exact[t][0]) <= 2  # one bin width
        assert abs(p95_est - exact[t][1]) <= 2


def test_binned_interval_join_matches_broadcast_form(spark):
    """binned_interval_join must produce exactly the pairs the broadcast
    BNLJ form produces — including negative domains, zero-width
    intervals, boundary points, and intervals spanning many bins."""
    import random

    from cruncher_spark.operators.joins import (
        binned_interval_join,
        interval_join,
    )

    rng = random.Random(42)
    points = [(i, rng.randint(-500, 500)) for i in range(300)]
    ivals = []
    for j in range(40):
        lo = rng.randint(-500, 480)
        hi = lo + rng.choice([0, 1, 3, 17, 250])  # incl. zero-width
        ivals.append((j, lo, hi))
    pdf = spark.createDataFrame(points, "pid long, v long")
    idf = spark.createDataFrame(ivals, "iid long, lo long, hi long")

    def pairs(df):
        return {(r.pid, r.iid) for r in df.select("pid", "iid").collect()}

    broadcast_form = interval_join(pdf, idf, point="v", start="lo", end="hi")
    for w in (7, 64, 1000):  # small, medium, larger-than-domain bins
        binned = binned_interval_join(
            pdf, idf, point="v", start="lo", end="hi", bin_width=w
        )
        assert pairs(binned) == pairs(broadcast_form), f"bin_width={w}"
        # exactly-once: no duplicate (pid, iid) rows
        assert binned.count() == len(pairs(binned)), f"bin_width={w}"
    assert pairs(broadcast_form)  # non-trivial corpus


def test_ivf_fitted_centroids_beat_lowest_id_stub(emb):
    """VERDICT r1 "What's wrong" #2: fitted k-means centroids must give
    recall-vs-brute-force at equal probe budget at least as good as the
    lowest-id quantizer they replaced, with better-balanced cells."""
    from cruncher_spark.operators.similarity import (
        ann_ivf_topk,
        brute_force_topk,
        centroid_sample,
        fit_ivf_centroids,
        lowest_id_centroids,
    )

    queries = emb.filter((F.col("vec_id") % 20) == 0)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=3).collect()
    }
    fitted = fit_ivf_centroids(centroid_sample(emb, "vec_id", "embedding"), 16)
    stub = lowest_id_centroids(emb, "vec_id", "embedding", 16)

    def recall(cents):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_topk(
                emb, queries, n_centroids=16, n_probe=2, k=3, centroids=cents
            ).collect()
        }
        return len(got & truth) / len(truth)

    r_fit, r_stub = recall(fitted), recall(stub)
    assert r_fit >= r_stub, (r_fit, r_stub)
    assert r_fit > 0.3, r_fit  # probing 2/16 cells must find a real fraction


def test_ivf_output_contract(emb):
    from cruncher_spark.operators.similarity import ann_ivf_topk

    queries = emb.filter((F.col("vec_id") % 20) == 0)
    out = ann_ivf_topk(emb, queries, n_centroids=8, n_probe=2, k=3).collect()
    assert len(out) > 0
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.query_id != r.neighbor_id
        assert -1.000001 <= r.cos <= 1.000001
    for rows in by_q.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))  # dense from 1
        assert len(rows) <= 3
        # ranks ordered by descending cos (ties broken by neighbor id)
        srt = sorted(rows, key=lambda r: (-r.cos, r.neighbor_id))
        assert [r.rank for r in srt] == sorted(r.rank for r in rows)


# ---------------------------------------------------------------------------
# salted skew-safe join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed(spark):
    """A fact table where one key holds ~90% of the rows (the straggler
    shape salting exists for) plus a small build side."""
    fact = spark.range(0, 5000).select(
        F.when(F.col("id") < 4500, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3 % 101).alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def _agg(df):
    rows = df.groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).collect()
    return {(r.k, r.name): (r.n, r.sv) for r in rows}


def test_salted_join_matches_plain(skewed):
    from cruncher_spark.operators.joins import salted_join

    fact, dim = skewed
    plain = _agg(fact.join(dim, "k"))
    assert _agg(salted_join(fact, dim, "k", n_salts=8)) == plain
    assert _agg(salted_join(fact, dim, "k", n_salts=8, hot_keys=[7])) == plain


def test_salted_join_spreads_hot_key(skewed):
    from cruncher_spark.operators.joins import salted_join

    fact, dim = skewed
    joined = salted_join(fact, dim, "k", n_salts=8, hot_keys=[7])
    # before dropping the salt, the hot key's rows occupy every shard and
    # the build side replicated only the hot key
    l = fact.withColumn(
        "_salt",
        F.when(
            F.col("k").isin([7]),
            F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    n_shards = l.where(F.col("k") == 7).select("_salt").distinct().count()
    assert n_shards == 8
    # cold keys keep exactly one build row each: output row count must match
    assert joined.count() == fact.join(dim, "k").count()


def test_salted_join_left_outer(skewed):
    from cruncher_spark.operators.joins import salted_join

    fact, dim = skewed
    # drop the hot key from the build side: left join must keep fact rows
    dim_missing = dim.where(F.col("k") != 7)
    out = salted_join(fact, dim_missing, "k", n_salts=4, hot_keys=[7], how="left")
    plain = fact.join(dim_missing, "k", "left")
    assert out.count() == plain.count() == fact.count()
    assert (
        out.where(F.col("name").isNull()).count()
        == fact.where(F.col("k") == 7).count()
    )


def test_centroid_sample_bounded_by_cap(spark):
    """VERDICT r4 "What's wrong" #1: the quantizer training collect must
    be bounded by max_sample regardless of corpus size — a fixed stride
    is linear in N and kills the driver at 10^9 embeddings. Corpus here
    is 10x the cap; the stride must widen so the driver-side sample
    stays <= cap (+1 for the id-0 residue class)."""
    from cruncher_spark.operators.similarity import centroid_sample

    cap = 40
    n = 10 * cap
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"), (F.col("id") % 3).cast("float")
        ).alias("embedding"),
    )
    sample = centroid_sample(corpus, "vec_id", "embedding", max_sample=cap)
    assert len(sample) <= cap + 1, len(sample)
    # deterministic: id-sorted, stride-selected
    ids = [i for i, _ in sample]
    assert ids == sorted(ids)
    stride = -(-n // cap)
    assert ids == [i for i in range(0, n, stride)]

    # small corpora keep the historical every=4 sample bit-for-bit, so
    # fitted-centroid gate literals are unchanged
    small = corpus.where(F.col("vec_id") < 4 * cap)
    legacy = centroid_sample(small, "vec_id", "embedding", max_sample=cap)
    assert [i for i, _ in legacy] == list(range(0, 4 * cap, 4))


def test_chunking_covers_every_word_with_declared_overlap(spark):
    """Every word position lands in >=1 chunk; consecutive chunks overlap
    by exactly window-stride words (except a short tail); chunk_ix is
    dense from 0 — the invariants a RAG splitter must hold."""
    from cruncher_spark.operators.curation import chunk_documents

    W, S = 8, 5
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n)))
         for i, n in enumerate([1, 4, 5, 8, 9, 13, 23])],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=W, stride=S).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = [1, 4, 5, 8, 9, 13, 23]
    for i, n in enumerate(lens):
        rows = sorted(by_doc[i], key=lambda r: r.chunk_ix)
        assert [r.chunk_ix for r in rows] == list(range(-(-n // S)))
        covered = set()
        for r in rows:
            start = r.chunk_ix * S
            assert r.n_words == min(W, n - start)
            covered.update(range(start, start + r.n_words))
        assert covered == set(range(n)), f"doc {i}"


def test_reservoir_is_stable_under_repartitioning(spark):
    """The k-per-key sample must pick the SAME ids regardless of
    physical layout — the reproducibility contract."""
    from cruncher_spark.operators.curation import reservoir_per_key

    df = spark.createDataFrame(
        [(f"s{i % 3}", i) for i in range(300)], "source string, doc_id long"
    )
    a = {(r.source, r.doc_id, r.rk)
         for r in reservoir_per_key(df, "source", "doc_id", 5).collect()}
    b = {(r.source, r.doc_id, r.rk)
         for r in reservoir_per_key(
             df.repartition(17), "source", "doc_id", 5
         ).collect()}
    assert a == b
    assert len(a) == 15  # 3 keys x k=5, ranks dense


def test_positional_filter_keeps_pair_exactly_at_threshold(spark):
    """ADVICE r5: alpha computed via float ceil(tau/(1+tau)*(na+nb))
    rounded UP for tau=0.25 (double of 0.2 is 0.2000...0111) and pruned a
    pair sitting exactly at the Jaccard threshold. The bound is now exact
    integer arithmetic over a rational tau; the boundary pair survives.

    Shape: |A|=2, |B|=3, overlap=1 → J = 1/(2+3-1) = 0.25 exactly, and
    the shared shingle (highest df) sorts LAST in both docs' rare-first
    orderings, so ubound = 1 — the old float alpha of 2 pruned it."""
    from cruncher_spark.operators.dedup import prefix_jaccard_pairs

    doc_sh = spark.createDataFrame(
        [(1, ["a1", "s"]), (2, ["b1", "b2", "s"])],
        "doc_id long, sh array<string>",
    )
    out = prefix_jaccard_pairs(doc_sh, "doc_id", 0.25).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert abs(out[0].jaccard - 0.25) < 1e-12
    # strictly-below-threshold stays excluded (the fix must not loosen);
    # NB taus within ~1e-7 of a simple rational (e.g. 0.2500001) snap
    # BACK to it by design — intent recovery — so probe with a tau that
    # is a genuinely different rational
    below = prefix_jaccard_pairs(doc_sh, "doc_id", 0.26)
    assert below.count() == 0


def test_chunk_documents_rejects_gapping_stride(spark):
    """ADVICE r5: stride > window would leave silent word gaps between
    chunks, violating the every-word-covered invariant — now refused."""
    from cruncher_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, window=4, stride=5)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_documents(docs, window=0, stride=0)
    # window == stride (no overlap) remains legal
    assert chunk_documents(docs, window=2, stride=2).count() == 2


def test_reservoir_two_phase_matches_window_form(spark):
    """VERDICT r5 next #4: with one key holding 95% of rows, the
    two-phase (key, hash-bucket) top-k must return EXACTLY the window
    form's rows (same ids, same ranks), and its plan must contain the
    two-phase shape — a (key, bucket) window below the final per-key
    window — so the single hot key ranks B-way parallel."""
    from cruncher_spark.operators.curation import reservoir_per_key

    rows = [("hot", i) for i in range(950)] + [
        (f"cold{i % 3}", 1000 + i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long").repartition(16)

    single = {
        (r.source, r.doc_id, r.rk)
        for r in reservoir_per_key(df, "source", "doc_id", 7).collect()
    }
    two = reservoir_per_key(df, "source", "doc_id", 7, two_phase_buckets=8)
    got = {(r.source, r.doc_id, r.rk) for r in two.collect()}
    assert got == single
    assert len({(s, r) for s, _, r in got if s == "hot"}) == 7

    plan = two._jdf.queryExecution().executedPlan().toString()
    # two Window operators: the bucketed pre-rank and the final rank
    assert plan.count("Window") >= 2
    assert "_rpk_bkt" in plan
    # phase-1 output is bounded: layout-independence also holds
    repart = {
        (r.source, r.doc_id, r.rk)
        for r in reservoir_per_key(
            df.repartition(3), "source", "doc_id", 7, two_phase_buckets=8
        ).collect()
    }
    assert repart == single


def test_doc_rarity_skew_salting(spark):
    """VERDICT r5 next #5: the docstring claimed AQE skew-join would
    split a stopword's term partition — probed r6, it structurally
    CANNOT (OptimizeSkewedJoin only rewrites bare ENSURE_REQUIREMENTS
    shuffle stages, and the frequency aggregate fuses inside the join
    stage). The frequency-attach join is therefore explicitly salted;
    this test pins (a) exact values on a fixture where one term is 50%
    of all tokens, (b) the salted join shape in the executed plan, and
    (c) that the hot term's token rows really spread across buckets."""
    import re
    from collections import Counter

    from cruncher_spark.operators.curation import doc_mean_token_freq

    rng_terms = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(300):
        toks = ["the"] * 10 + [rng_terms[(i * 7 + j) % 200] for j in range(10)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    out = doc_mean_token_freq(docs, salt_buckets=4)
    got = {r.doc_id: (r.n_tokens, r.mean_token_freq) for r in out.collect()}

    # brute-force expected values
    freq = Counter(t for _, text in rows for t in text.split())
    for doc_id, text in rows:
        toks = text.split()
        s = sum(freq[t] for t in toks)
        assert got[doc_id][0] == len(toks)
        assert abs(got[doc_id][1] - round(s / len(toks), 6)) < 1e-9, doc_id

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the join really keys on (term, salt) and the freq side is exploded
    assert re.search(r"Join.*term.*salt|\[term[^\]]*salt[^\]]*\], \[term", plan), plan[:2000]
    assert "xxhash64" in plan
    # hot-term spread: with 4 buckets the 3000 'the' tokens land in >1
    # deterministic bucket (xxhash64 of 300 distinct ids mod 4)
    from pyspark.sql import functions as F

    n_buckets = (
        docs.select(
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(4)).alias("b")
        )
        .distinct()
        .count()
    )
    assert n_buckets == 4


def test_prefix_jaccard_exact_threshold_property(spark):
    """Property net over the r6 integer-threshold arithmetic: for random
    taus (including awkward non-dyadic ones) and random small shingle
    sets, prefix_jaccard_pairs must return EXACTLY the brute-force
    Python pair set — no boundary pair float-pruned, none invented.
    Spark-amortized: all (tau, corpus) cases share one session; each
    case is a 12-doc corpus so the whole sweep is seconds."""
    import random

    from cruncher_spark.operators.dedup import prefix_jaccard_pairs

    rng = random.Random(20260814)
    taus = [0.25, 0.3, 0.5, 0.6, 2 / 3, 0.75, 0.2, 0.45]
    for case in range(6):
        vocab = [f"t{j}" for j in range(12)]
        docs = []
        for i in range(12):
            n = rng.randint(1, 8)
            docs.append((i, sorted(rng.sample(vocab, n))))
        sets = {i: set(sh) for i, sh in docs}
        df = spark.createDataFrame(docs, "doc_id long, sh array<string>")
        for tau in taus:
            # the operator's contract: J >= tau under the EXACT rational
            # tau recovered by limit_denominator — mirror it here
            from fractions import Fraction

            fr = Fraction(tau).limit_denominator(1_000_000)
            want = set()
            for a in range(12):
                for b in range(a + 1, 12):
                    inter = len(sets[a] & sets[b])
                    union = len(sets[a] | sets[b])
                    if union and inter * fr.denominator >= fr.numerator * union:
                        want.add((a, b))
            got = {
                (r.id_a, r.id_b)
                for r in prefix_jaccard_pairs(df, "doc_id", tau).collect()
            }
            assert got == want, (case, tau, got ^ want)


def test_bigram_nll_matches_bruteforce(spark):
    """bigram_nll == brute-force add-one bigram LM on a small corpus:
    exact per-doc weighted-mean nll (rounded-6-then-decimal discipline),
    sub-2-word docs dropped, repeated bigrams weighted by multiplicity."""
    import math

    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from cruncher_spark.operators.curation import bigram_nll

    def r6(x: float) -> float:
        # Spark's round(): HALF_UP over the double's shortest decimal repr
        # (python round() is half-even and would disagree at .5 digits)
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "mat the on sat cat the"),   # same words, improbable order
        (4, "solo"),                     # no bigrams -> dropped
        (5, ""),                         # degenerate -> dropped
        (6, "go go go go"),              # repeated bigram multiplicity
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    out = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in bigram_nll(docs).collect()}

    toks = {i: t.split(" ") for i, t in rows}
    grams = {i: list(zip(w, w[1:])) for i, w in toks.items()}
    cb = Counter(g for gs in grams.values() for g in gs)
    cu = Counter()
    for (w1, _), c in cb.items():
        cu[w1] += c
    vocab = {w for ws in toks.values() for w in ws}
    v = len(vocab)

    assert set(out) == {1, 2, 3, 6}
    for i in out:
        gs = grams[i]
        m = Counter(gs)
        nll = {
            g: r6(-math.log((cb[g] + 1) / (cu[g[0]] + v))) for g in m
        }
        total = sum(m[g] * nll[g] for g in m)
        exp = r6(total / len(gs))
        assert out[i][0] == len(gs), i
        assert abs(out[i][1] - exp) < 1e-9, (i, out[i], exp)
    # context matters: doc 3 (scrambled) scores strictly above doc 1
    assert out[3][1] > out[1][1]


# ---------------------------------------------------------------------------
# boilerplate strip + vocabulary growth (round 6)
# ---------------------------------------------------------------------------


def test_boilerplate_strips_hot_chunk_from_every_doc(spark):
    from cruncher_spark.operators.curation import boilerplate_strip

    # chunk_words=2: "nav bar" is chunk 0 of docs 1-4 (> max_docs=3 docs);
    # doc 5 has no hot chunk
    rows = [
        (1, "nav bar alpha beta"),
        (2, "nav bar gamma delta"),
        (3, "nav bar epsilon zeta"),
        (4, "nav bar eta theta"),
        (5, "iota kappa lam mu"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in boilerplate_strip(docs, chunk_words=2, max_docs=3).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}  # stripped docs still present
    for d in (1, 2, 3, 4):
        assert got[d]["n_chunks"] == 2 and got[d]["n_kept"] == 1
    assert got[5]["n_kept"] == 2
    # doc 1's reconstruction is exactly its tail chunk
    import hashlib

    assert got[1]["clean_digest"] == hashlib.md5(b"alpha beta").hexdigest()
    assert got[5]["clean_digest"] == hashlib.md5(b"iota kappa lam mu").hexdigest()


def test_boilerplate_threshold_is_distinct_docs_not_occurrences(spark):
    from cruncher_spark.operators.curation import boilerplate_strip

    # "x y" occurs 4 times but in only 2 DISTINCT docs -> not hot at
    # max_docs=3
    rows = [(1, "x y x y x y"), (2, "x y pad pad"), (3, "a b c d")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in boilerplate_strip(docs, chunk_words=2, max_docs=3).collect()}
    assert all(r["n_kept"] == r["n_chunks"] for r in got.values())


def test_vocab_growth_monotonic_and_total(spark):
    from cruncher_spark.operators.curation import vocab_growth

    rows = [
        (0, "a b"),
        (1, "a c"),
        (2, "a b"),   # no new terms
        (3, "d e f"),
        (4, "a"),
        (5, "g"),
        (6, "a b c"),
        (7, "h"),
        (8, "a"),
        (9, "i j"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["cp"], r["n_docs"], r["vocab_size"])
        for r in vocab_growth(docs).collect()
    )
    # checkpoints floor(9*f): 0, 2, 4, 6, 9
    assert [c for c, _, _ in got] == [0, 2, 4, 6, 9]
    assert [n for _, n, _ in got] == [1, 3, 5, 7, 10]
    assert [v for _, _, v in got] == [2, 3, 6, 7, 10]
    # monotone non-decreasing, final = full vocabulary
    vs = [v for _, _, v in got]
    assert vs == sorted(vs) and vs[-1] == 10


def test_source_centroid_similarity_geometry(spark):
    from cruncher_spark.operators.similarity import source_centroid_similarity

    # sources a/b have parallel centroids (cos 1), c is orthogonal (cos 0)
    docs = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "c")],
        "doc_id long, source string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [3.0, 0.0]),
            (2, [2.0, 0.0]),
            (3, [0.0, 5.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["group_a"], r["group_b"]): r["cos"]
        for r in source_centroid_similarity(docs, emb).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}  # upper triangle
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == 0.0 and got[("b", "c")] == 0.0


def test_zipf_slope_exact_small_corpus(spark):
    """Perfect Zipf data (f = 60/r for ranks 1..4) must recover slope -1.
    Terms are chosen so frequency order != lexical order."""
    import math

    from cruncher_spark.operators.curation import zipf_slope

    words = {"zz": 60, "mm": 30, "aa": 20, "qq": 15}
    text = " ".join(w for w, f in words.items() for _ in range(f))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_slope(docs).collect()[0]
    assert row["n_terms"] == 4
    assert abs(row["slope"] - (-1.0)) < 1e-3
    # intercept ~ ln 60
    assert abs(row["intercept"] - math.log(60)) < 1e-2


def test_zipf_rank_ties_break_lexically(spark):
    from cruncher_spark.operators.curation import zipf_slope

    # b and a tie at f=2 -> ranks 2,3 by term order under rank 1 (c, f=3);
    # exact ranks only matter through the regression, so pin via slope
    docs = spark.createDataFrame(
        [(1, "c c c b b a a d")], "doc_id long, text string"
    )
    row = zipf_slope(docs).collect()[0]
    assert row["n_terms"] == 4
    # hand-computed least squares on (ln r, ln f) with ranks c=1,a=2,b=3,d=4
    import math

    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(f) for f in (3, 2, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row["slope"] - slope) < 1e-5


def test_weighted_sample_favors_heavy_rows(spark):
    """Statistical pin of the A-Res inclusion law: with one row 50x the
    weight of its 9 peers across 200 independent keys, the heavy row
    must be sampled (k=1) in the large majority of keys — and the
    selection must be deterministic."""
    from cruncher_spark.operators.curation import weighted_sample_per_key

    rows = []
    for key in range(200):
        for j in range(10):
            w = 500 if j == 0 else 10
            rows.append((f"k{key}", key * 100 + j, w))
    df = spark.createDataFrame(rows, "src string, id long, w long")
    got = weighted_sample_per_key(df, "src", "id", "w", k=1)
    picks = {r["src"]: r["id"] for r in got.collect()}
    assert len(picks) == 200
    heavy = sum(1 for k, v in picks.items() if v % 100 == 0)
    # P(heavy) = 500/590 ~ 0.85; 200 trials -> well above half
    assert heavy > 140, heavy
    # deterministic across invocations and partitionings
    again = {
        r["src"]: r["id"]
        for r in weighted_sample_per_key(
            df.repartition(7), "src", "id", "w", k=1
        ).collect()
    }
    assert again == picks


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from cruncher_spark.operators.curation import weighted_sample_per_key

    df = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, -5), ("a", 3, None), ("a", 4, 7)],
        "src string, id long, w int",
    )
    got = weighted_sample_per_key(df, "src", "id", "w", k=10).collect()
    assert [r["id"] for r in got] == [4]


def test_semantic_dedup_lsh_contract(spark):
    """Quantizer-free SemDeDup (r7): an exact copy ALWAYS shares its
    original's sign-pattern cell (identical projections) and is dropped
    deterministically; near-orthogonal vectors survive; output contract
    (id, cell, kept) matches semantic_dedup."""
    import numpy as np

    from cruncher_spark.operators.similarity import semantic_dedup_lsh

    rng = np.random.RandomState(7)
    dim = 64
    base = rng.randn(dim)
    base /= np.linalg.norm(base)
    other = rng.randn(dim)
    other -= (other @ base) * base  # orthogonal to base
    other /= np.linalg.norm(other)
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in base]),  # exact copy -> dropped
        (3, [float(x) for x in other]),  # orthogonal -> kept
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.id: (r.cell, r.kept)
        for r in semantic_dedup_lsh(vecs, dim=dim, n_planes=4).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1][1] is True and out[3][1] is True
    assert out[2][1] is False
    assert out[1][0] == out[2][0]  # the copy shares the cell
    # more planes split cells finer but never split exact copies
    out8 = {
        r.id: (r.cell, r.kept)
        for r in semantic_dedup_lsh(vecs, dim=dim, n_planes=8).collect()
    }
    assert out8[1][0] == out8[2][0] and out8[2][1] is False


def test_multiprobe_recall_dominates_single_probe(spark):
    """r7 multi-probe LSH: probing the 1-bit-flip neighbor buckets can
    only ADD candidates, so per-query recall vs brute force is >= the
    single-probe gate's — and on this fixture strictly better overall."""
    from cruncher_spark.operators.similarity import (
        ann_lsh_multiprobe,
        ann_lsh_topk,
        brute_force_topk,
    )
    from cruncher_spark.sources.tables import Star, fan_out

    emb = fan_out(Star(spark, "/root/testdata/sf0.001").embeddings)
    queries = emb.filter("vec_id % 20 = 0")

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, queries, dim=64, k=3))
    single = pairs(ann_lsh_topk(emb, queries, dim=64, k=3, n_planes=8))
    multi = pairs(ann_lsh_multiprobe(emb, queries, dim=64, k=3, n_planes=8))
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_single
    assert r_multi > r_single  # 9x probed volume must buy recall here
    # single-probe results are a subset of multi-probe candidates' span:
    # every single-probe hit is still reachable (same bucket probed)
    assert len(multi) >= len(single)


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """r8 (r7 VERDICT #4): IVF's probe count is the same Lv-et-al recall
    knob as LSH multi-probe — probing more of the SAME fitted
    quantizer's cells can only add scored candidates, so recall vs
    brute force is monotone in n_probe, and probe=K (all cells) IS
    brute force."""
    from cruncher_spark.operators.similarity import (
        ann_ivf_topk,
        brute_force_topk,
        centroid_sample,
        fit_ivf_centroids,
    )
    from cruncher_spark.sources.tables import Star, fan_out

    emb = fan_out(Star(spark, "/root/testdata/sf0.001").embeddings)
    queries = emb.filter("vec_id < 32")
    k_cells = 16
    cents = fit_ivf_centroids(
        centroid_sample(emb, "vec_id", "embedding"), k_cells
    )

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, queries, dim=64, k=3))
    recall = {}
    for n_probe in (1, 4, k_cells):
        got = pairs(
            ann_ivf_topk(
                emb, queries, n_centroids=k_cells, n_probe=n_probe, k=3,
                centroids=cents,
            )
        )
        recall[n_probe] = len(got & truth) / len(truth)
    assert recall[1] <= recall[4] <= recall[16]
    assert recall[4] > recall[1]  # 4x probed volume must buy recall here
    assert recall[16] == 1.0  # probing every cell IS brute force


def test_ivfpq_probe_all_equals_flat_pq(spark):
    """r8 combined IVF+PQ: the coarse quantizer only PRUNES — with every
    cell probed the candidate set is the whole corpus and the ADC scoring
    path is textually shared with pq_topk, so probe=K must reproduce the
    flat PQ scan row-for-row.

    Recall is asserted against the FLAT PQ ranking, where it is provably
    monotone in n_probe: a flat-top-k member inside the probed candidate
    set is beaten by < k candidates corpus-wide, so by < k in any subset
    — top-k(S) ∩ flat-top-k = flat-top-k ∩ S, monotone in S. (Vs BRUTE
    force it is NOT monotone — extra probed candidates can displace a
    true neighbor via PQ-distorted scores; first run of this test
    measured exactly that, probe-1 0.240 > probe-4 0.198 — which is why
    IVF-flat's brute-force-recall assertion does not transfer here.)"""
    from cruncher_spark.operators.similarity import (
        ann_ivfpq_topk,
        centroid_sample,
        fit_ivf_centroids,
        fit_pq_codebooks,
        pq_topk,
    )
    from cruncher_spark.sources.tables import Star, fan_out

    emb = fan_out(Star(spark, "/root/testdata/sf0.001").embeddings)
    queries = emb.filter("vec_id < 32")
    k_cells = 16
    sample = centroid_sample(emb, "vec_id", "embedding")
    cents = fit_ivf_centroids(sample, k_cells)
    books = fit_pq_codebooks(sample, 8, 16)

    def rows(df):
        return {tuple(r) for r in df.collect()}

    flat = rows(pq_topk(emb, queries, books, k=3))
    probe_all = rows(
        ann_ivfpq_topk(emb, queries, cents, books, n_probe=k_cells, k=3)
    )
    assert probe_all == flat  # pruning off == flat compressed scan

    def pairs(got):
        return {(q, n) for q, n, *_ in got}

    pq_truth = pairs(flat)
    r = {
        n_probe: len(
            pairs(
                rows(
                    ann_ivfpq_topk(
                        emb, queries, cents, books, n_probe=n_probe, k=3
                    )
                )
            )
            & pq_truth
        )
        / len(pq_truth)
        for n_probe in (1, 4, k_cells)
    }
    assert r[1] <= r[4] <= r[16]
    assert r[4] > r[1]  # 4x probed volume must buy recall here
    assert r[16] == 1.0  # probing every cell IS the flat scan


def test_ivfpq_input_guards(spark):
    from cruncher_spark.operators.similarity import ann_ivfpq_topk

    df = spark.range(1)
    with __import__("pytest").raises(ValueError, match="backtick"):
        ann_ivfpq_topk(df, df, [[0.0] * 4], [[[0.0] * 2]], vec_col="a`b")
    with __import__("pytest").raises(ValueError, match="dim"):
        # codebooks cover 2 dims, centroids say 4
        ann_ivfpq_topk(df, df, [[0.0] * 4], [[[0.0, 0.0]]])


def test_ivfpq_refine_probe_all_is_brute_force(spark):
    """With every cell probed and a corpus-sized refine width, the exact
    re-rank tail sees every vector — the output must BE brute force.
    With the production widths, refined recall (exact cosine order over
    ADC-picked candidates) must be >= the pure compressed ranking's."""
    from cruncher_spark.operators.similarity import (
        ann_ivfpq_refine,
        ann_ivfpq_topk,
        brute_force_topk,
        centroid_sample,
        fit_ivf_centroids,
        fit_pq_codebooks,
    )
    from cruncher_spark.sources.tables import Star, fan_out

    emb = fan_out(Star(spark, "/root/testdata/sf0.001").embeddings)
    queries = emb.filter("vec_id < 32")
    k_cells = 16
    sample = centroid_sample(emb, "vec_id", "embedding")
    cents = fit_ivf_centroids(sample, k_cells)
    books = fit_pq_codebooks(sample, 8, 16)
    n = emb.count()

    def rows(df):
        return {tuple(r) for r in df.collect()}

    truth = rows(brute_force_topk(emb, queries, dim=64, k=3))
    full = rows(
        ann_ivfpq_refine(
            emb, queries, cents, books, n_probe=k_cells, refine=n, k=3
        )
    )
    assert full == truth  # candidates = everything, exact order = brute force

    def pairs(got):
        return {(q, nb) for q, nb, *_ in got}

    t = pairs(truth)
    refined = pairs(
        rows(ann_ivfpq_refine(emb, queries, cents, books, n_probe=4, refine=10, k=3))
    )
    adc = pairs(rows(ann_ivfpq_topk(emb, queries, cents, books, n_probe=4, k=3)))
    assert len(refined & t) >= len(adc & t)


def test_gopher_rules_hand_case(spark):
    """Each rule kills exactly its target: short doc, character soup
    (mean word length), symbol table (alpha fraction), stopword-free
    keyword stuffing — and a prose-like doc passes all four."""
    from cruncher_spark.operators.curation import gopher_rules

    prose = "the quick brown fox " * 15 + "a tale of foxes"  # 64 words
    short = "the quick a of"
    soup = " ".join(["supercalifragilistic"] * 60) + " the a"
    symbols = " ".join(["123"] * 30 + ["the", "off", "a"] + ["456"] * 30)
    stuffing = " ".join(f"keyword{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, prose), (2, short), (3, soup), (4, symbols), (5, stuffing)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].kept is True
    assert out[2].kept is False and out[2].n_words < 50
    assert out[3].kept is False and out[3].mean_word_len > 10
    assert out[4].kept is False and out[4].alpha_frac < 0.8
    assert out[5].kept is False and out[5].n_stop_distinct == 0


def test_semantic_contamination_hand_case(spark):
    """The planted copy of a benchmark vector flags; orthogonal corpus
    rows pass with NULL max_bench_cos (no band collision) or a sub-tau
    score; benchmark self-pairs are excluded."""
    from cruncher_spark.operators.similarity import semantic_contamination

    dim = 4
    bench_v = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, bench_v),               # the benchmark row itself
        (10, bench_v),              # exact copy -> must flag
        (11, [0.0, 1.0, 0.0, 0.0]),  # orthogonal -> must pass
        (12, [-1.0, 0.0, 0.0, 0.0]),  # anti-parallel -> cos -1, passes
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = corpus.where("vec_id = 0")
    out = {r.vec_id: r for r in semantic_contamination(
        corpus, bench, dim=dim, min_cos=0.8
    ).collect()}
    assert set(out) == {0, 10, 11, 12}  # one row per corpus id
    assert out[10].contaminated is True and out[10].max_bench_cos == 1.0
    assert out[11].contaminated is False
    assert out[12].contaminated is False
    assert out[0].contaminated is False  # self-pair excluded


def test_dsir_importance_hand_case(spark):
    """DSIR direction check: docs sharing the target sample's
    vocabulary score a positive log weight (selected), docs from a
    disjoint vocabulary score negative; the exact-decimal sum makes
    the result partitioning-invariant."""
    from cruncher_spark.operators.curation import dsir_importance

    # counts must be heavy enough that the evidence beats the add-one
    # smoothing floor (Tt/Tr ~ B): a one-line toy corpus washes out
    rows = [
        (0, ("alpha beta gamma delta " * 10).strip()),  # target
        (3, ("alpha beta gamma delta " * 10).strip()),  # target
        (1, ("alpha beta gamma delta " * 5).strip()),   # target-like
        (2, ("zeta eta theta iota " * 5).strip()),      # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dsir_importance(
            docs, F.col("doc_id").isin(0, 3), n_buckets=64
        ).collect()
    }
    assert out[0].selected and out[0].log_weight > 0
    assert out[1].selected and out[1].log_weight > 0
    assert not out[2].selected and out[2].log_weight < 0
    assert out[1].log_weight > out[2].log_weight

    rep = {
        r.doc_id: (r.n_feats, r.log_weight, r.selected)
        for r in dsir_importance(
            docs.repartition(5), F.col("doc_id").isin(0, 3), n_buckets=64
        ).collect()
    }
    assert rep == {
        d: (r.n_feats, r.log_weight, r.selected) for d, r in out.items()
    }


def test_semantic_dedup_multiprobe_recovers_boundary_pairs(spark):
    """The 1-bit probe ring's whole point: a near-dup pair (cos >= 0.9)
    that one near-threshold hyperplane pushed into an ADJACENT cell is
    invisible to single-probe cells but verified by multi-probe; a
    hamming-2 pair stays invisible to both (the documented ring
    boundary). Pair found by deterministic seeded search against the
    real md5 plane family."""
    import numpy as np

    from cruncher_spark.operators.similarity import (
        _hyperplane_signs,
        semantic_dedup_lsh,
        semantic_dedup_multiprobe,
    )

    dim, p = 8, 4
    planes = np.array(_hyperplane_signs(dim, p), dtype=float)

    def cell(v):
        return sum(1 << i for i, s in enumerate(planes @ v) if s > 0)

    def cos(a, b):
        return float(
            a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    rng = np.random.default_rng(7)
    pair1 = pair2 = None  # hamming-1 and hamming-2 near-dup pairs
    while pair1 is None or pair2 is None:
        v = rng.normal(size=dim)
        u = v + 0.35 * rng.normal(size=dim)
        if cos(u, v) < 0.9:
            continue
        h = bin(cell(u) ^ cell(v)).count("1")
        if h == 1 and pair1 is None:
            pair1 = (v, u)
        elif h == 2 and pair2 is None:
            pair2 = (v, u)

    rows = [
        (1, [float(x) for x in pair1[0]]),
        (2, [float(x) for x in pair1[1]]),
        (10, [float(x) for x in pair2[0]]),
        (20, [float(x) for x in pair2[1]]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    single = {
        r.id: r.kept
        for r in semantic_dedup_lsh(
            df, dim=dim, n_planes=p, min_cos=0.9
        ).collect()
    }
    multi = {
        r.id: r.kept
        for r in semantic_dedup_multiprobe(
            df, dim=dim, n_planes=p, min_cos=0.9
        ).collect()
    }
    assert single == {1: True, 2: True, 10: True, 20: True}  # all missed
    assert multi == {1: True, 2: False, 10: True, 20: True}  # ring=1 caught


def test_semantic_dedup_recall_invariants(spark):
    """The measured-recall gate's structure: the probe ring's and the
    banded family's candidate sets are supersets of the single-probe
    set (band 0 IS the single code), so multi_recall >= single_recall
    and banded_recall >= single_recall ALWAYS; the banded family must
    MEET its _sdd_params_for recall target on the planted set (the r10
    VERDICT #1 done-condition); truth is nontrivial (the amplitude
    ladder must straddle the 0.9 threshold — all-true or all-false
    would make the recall comparison vacuous, and the r10 ADVICE dead
    knob made straddle fragile); counts bounded by the planted set."""
    from cruncher_spark.plans.pipeline_queries import (
        _SDD_TARGET_RECALL,
        semantic_dedup_recall_query,
    )

    row = semantic_dedup_recall_query(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert 0 < row.n_true < row.n_planted  # straddles the threshold
    assert 0 <= row.single_caught <= row.multi_caught <= row.n_true
    assert 0 <= row.single_caught <= row.banded_caught <= row.n_true
    assert row.multi_recall >= row.single_recall
    assert row.banded_recall >= row.single_recall
    # the policy's promise, measured: banded recall >= target (the
    # target bounds recall AT the threshold; planted true pairs sit at
    # or above it, so measured recall should clear the bound)
    assert row.banded_recall >= _SDD_TARGET_RECALL
    assert row.multi_recall == round(row.multi_caught / row.n_true, 6)
    assert row.banded_recall == round(row.banded_caught / row.n_true, 6)


def test_sdd_params_policy_sweep():
    """_sdd_params_for is the recall-target policy as CODE (r10 VERDICT
    #2): sweeping the corpus over two decades, (a) the predicted banded
    recall 1-(1-s^p)^r stays >= the target at the cosine threshold,
    (b) cells/band still track the corpus (expected population bounded
    — the cost contract p inherits from _sdd_planes_for), and (c) the
    band count grows (the documented ~n^0.22 price of non-decaying
    recall) but stays far under any quadratic-ish blow-up."""
    import math

    from cruncher_spark.plans.pipeline_queries import (
        _SDD_CELL_TARGET,
        _SDD_MIN_COS,
        _SDD_TARGET_RECALL,
        _sdd_params_for,
    )

    s = 1.0 - math.acos(_SDD_MIN_COS) / math.pi
    prev_r = 0
    for n in [500, 2_000, 5_000, 20_000, 50_000, 200_000, 2_000_000]:
        p, r = _sdd_params_for(n)
        predicted = 1.0 - (1.0 - s**p) ** r
        assert predicted >= _SDD_TARGET_RECALL, (n, p, r, predicted)
        # cost contract: expected cell population per band stays ~64
        # (2^p >= ceil(n/64), within a factor-2 rounding band)
        assert 2**p >= -(-n // _SDD_CELL_TARGET)
        assert n / 2**p <= _SDD_CELL_TARGET + 1
        if n >= 4 * _SDD_CELL_TARGET:  # above the 4-plane floor
            assert n / 2**p > _SDD_CELL_TARGET / 4
        # r is monotone in n and polynomially small: r <= ~3.2/s^p
        assert r >= prev_r
        assert r <= math.ceil(3.2 / s**p)
        prev_r = r
    # the two-decade anchor points the VERDICT quotes
    assert _sdd_params_for(2_000) == (5, 5)
    assert _sdd_params_for(200_000) == (12, 18)


def test_semantic_dedup_banded_superset_and_boundary(spark):
    """The banded operator: (a) drop set is a superset of the
    single-code drop set on the same corpus (band 0 is the single
    code); (b) a planted boundary near-dup that the single code
    MISSES (a plane separates the pair) is caught by some other band
    — the OR-amplification the operator exists for; (c) exact copies
    are always caught; (d) far vectors are never dropped."""
    import random

    from cruncher_spark.operators.similarity import (
        _hyperplane_signs,
        semantic_dedup_banded,
        semantic_dedup_lsh,
    )

    dim, p, r = 16, 6, 4
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(120)
    ]
    # exact copies of every 12th vector
    rows += [(1000 + i, rows[i][1]) for i in range(0, 120, 12)]
    # near-copies of every 6th: deterministic nudge sized so cos lands
    # just above the 0.99 threshold (~0.993-0.996) — close enough to be
    # true dups, angled enough that single-code planes flip ~20%/copy
    rows += [
        (2000 + i, [x + 0.08 * ((i + j) % 3 - 1) for j, x in enumerate(rows[i][1])])
        for i in range(0, 120, 6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    single = {
        row.id: row.kept
        for row in semantic_dedup_lsh(
            df, dim=dim, n_planes=p, min_cos=0.99
        ).collect()
    }
    banded = {
        row.id: row.kept
        for row in semantic_dedup_banded(
            df, dim=dim, n_planes=p, n_bands=r, min_cos=0.99
        ).collect()
    }
    assert set(single) == set(banded) == {i for i, _ in rows}
    # (a) superset: everything single drops, banded drops
    assert {i for i, k in single.items() if not k} <= {
        i for i, k in banded.items() if not k
    }
    # (c) exact copies always dropped by both
    for i in range(0, 120, 12):
        assert not single[1000 + i] and not banded[1000 + i]
    # (d) originals (no smaller-id near-dup) never dropped
    for i in range(0, 120, 12):
        assert banded[i]
    # (b) at least one near-copy that flips a band-0 plane is still
    # caught by another band (probabilistic over the fixture, pinned
    # by the seed: verify the fixture actually exercises the case)
    missed_by_single = [
        i for i in range(0, 120, 6) if single[2000 + i] and not banded[2000 + i]
    ]
    assert missed_by_single, (
        "fixture no longer exercises the single-miss/banded-catch case; "
        "reseed it"
    )
    # sanity: the helper family is deterministic (same planes each call)
    assert _hyperplane_signs(dim, p) == _hyperplane_signs(dim, p)


def test_semantic_dedup_hint_off_identical(spark):
    """hint_broadcast=False (the unbounded-corpus escape hatch: vectors
    ride the band/probe exchange instead of broadcasting for the
    pair-attach) must produce bit-identical (id, cell, kept) for both
    the multiprobe and the banded operators — the two shapes differ
    only in WHERE the vector payload travels, never in the candidate
    set or the verification arithmetic (r11; the broadcast default
    exists because an AQE-fallback sort-merge attach sorts pair-count
    x vector-width intermediates, measured as a disk-filling spill at
    the u100 stress scale)."""
    import random

    from cruncher_spark.operators.similarity import (
        semantic_dedup_banded,
        semantic_dedup_multiprobe,
    )

    dim = 16
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(200)
    ]
    # near-copies angled to flip planes sometimes (the interesting case)
    rows += [
        (1000 + i, [x + 0.08 * ((i + j) % 3 - 1) for j, x in enumerate(rows[i][1])])
        for i in range(0, 200, 5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for fn, kw in [
        (semantic_dedup_multiprobe, dict(n_planes=6)),
        (semantic_dedup_banded, dict(n_planes=6, n_bands=3)),
    ]:
        on = sorted(
            tuple(r)
            for r in fn(
                df, dim=dim, min_cos=0.99, hint_broadcast=True, **kw
            ).collect()
        )
        off = sorted(
            tuple(r)
            for r in fn(
                df, dim=dim, min_cos=0.99, hint_broadcast=False, **kw
            ).collect()
        )
        assert on == off, fn.__name__
        assert any(not kept for _, _, kept in on)  # fixture nontrivial


def test_semantic_dedup_family_matches_standalone_operators(spark):
    """The one-pass family engine (r12, closing r11 VERDICT #3) must be
    bit-identical to the three standalone operators run separately with
    the same (p, r) — for BOTH exchange shapes. The family's band-0
    code IS the single code and its band-0 probe ring IS the multiprobe
    candidate set, so any divergence is a defect in the shared
    derivation, not a semantics choice."""
    import random

    from cruncher_spark.operators.similarity import (
        semantic_dedup_banded,
        semantic_dedup_family,
        semantic_dedup_lsh,
        semantic_dedup_multiprobe,
    )

    dim, p, r = 16, 6, 3
    rng = random.Random(12)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(200)
    ]
    rows += [
        (1000 + i, [x + 0.08 * ((i + j) % 3 - 1) for j, x in enumerate(rows[i][1])])
        for i in range(0, 200, 5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(dim=dim, n_planes=p, min_cos=0.99)
    want_s = {
        row["id"]: row["kept"]
        for row in semantic_dedup_lsh(df, **kw).collect()
    }
    want_m = {
        row["id"]: row["kept"]
        for row in semantic_dedup_multiprobe(
            df, hint_broadcast=True, **kw
        ).collect()
    }
    want_b = {
        row["id"]: row["kept"]
        for row in semantic_dedup_banded(
            df, n_bands=r, hint_broadcast=True, **kw
        ).collect()
    }
    for hint in (True, False):
        fam = semantic_dedup_family(
            df, n_bands=r, hint_broadcast=hint, **kw
        ).collect()
        assert len(fam) == len(rows)
        for row in fam:
            assert row["kept_single"] == want_s[row["id"]], (hint, row)
            assert row["kept_multi"] == want_m[row["id"]], (hint, row)
            assert row["kept_banded"] == want_b[row["id"]], (hint, row)
    # fixture nontrivial in every column: each member drops something,
    # and the supersets strictly widen somewhere
    assert any(not v for v in want_s.values())
    assert sum(want_m.values()) <= sum(want_s.values())
    assert sum(want_b.values()) <= sum(want_s.values())


def test_sdd_shape_policy_boundary_and_defaults(spark):
    """_sdd_shape_for (r12, closing r11 VERDICT #2 'What's missing #2'):
    the exchange-shape choice is policy CODE — it flips from the
    forced-broadcast pair-attach shape to the vector-carry shape at
    exactly the documented boundary (vector-table bytes vs broadcast
    budget), and the operators' hint_broadcast=None default consults
    it. Explicit hint_broadcast overrides remain."""
    from cruncher_spark.operators.similarity import (
        _SDD_BROADCAST_BUDGET,
        _SDD_VEC_ROW_OVERHEAD,
        _sdd_shape_for,
        semantic_dedup_banded,
        semantic_dedup_multiprobe,
    )

    row_bytes = 64 * 8 + _SDD_VEC_ROW_OVERHEAD
    boundary = _SDD_BROADCAST_BUDGET // row_bytes
    assert _sdd_shape_for(boundary, 64) is True
    assert _sdd_shape_for(boundary + 1, 64) is False
    # budget parameter, not an edit: a smaller budget flips earlier
    assert _sdd_shape_for(boundary, 64, broadcast_budget=1 << 20) is False
    # wider vectors flip earlier at the same count
    assert _sdd_shape_for(boundary, 4096) is False
    # operators' None default consults the policy and still runs; the
    # n_rows fast path skips the count job and gives the same plan
    import random

    rng = random.Random(3)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    got = semantic_dedup_multiprobe(df, dim=8, min_cos=0.99).collect()
    assert len(got) == 60
    got2 = semantic_dedup_banded(
        df, dim=8, min_cos=0.99, n_rows=60
    ).collect()
    assert len(got2) == 60


def test_dedup_lsh_eval_sampled_vs_exact(spark):
    """The registered gate is the 1/stride sampled-truth estimator (r9
    VERDICT #6); the exact full-corpus form stays available offline.
    On the strided sub-corpus the two are BY CONSTRUCTION the same
    measurement, and the exact form must still run end-to-end."""
    from cruncher_spark.plans.pipeline_queries import (
        _LSHEVAL_STRIDE,
        dedup_lsh_eval,
        dedup_lsh_eval_exact,
    )

    sf = "/root/testdata/sf0.001"
    sampled = dedup_lsh_eval(spark, sf).collect()[0]
    exact = dedup_lsh_eval_exact(spark, sf).collect()[0]
    assert sampled.asDict().keys() == exact.asDict().keys()
    # the sample covers 1/stride of docs -> far fewer pairs than exact
    assert 0 < sampled.n_true <= exact.n_true
    assert 0 < sampled.n_cand <= exact.n_cand
    assert _LSHEVAL_STRIDE >= 2


def test_banded_pairs_hint_off_identical(spark):
    """hint_broadcast=False (the degenerate-corpus escape hatch from r9
    ADVICE: a hot band makes the forced broadcast OOM instead of
    degrading) must produce bit-identical results with no forced
    broadcast of the candidate list in the physical plan."""
    from cruncher_spark.operators.similarity import (
        semantic_contamination,
        threshold_neighbor_counts,
    )

    dim = 4
    rows = [
        (i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.5])
        for i in range(1, 31)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = vecs.where("vec_id <= 5")

    for fn in (
        lambda h: threshold_neighbor_counts(
            vecs, qs, dim=dim, min_cos=0.9, hint_broadcast=h
        ),
        lambda h: semantic_contamination(
            vecs, qs, dim=dim, min_cos=0.9, hint_broadcast=h
        ),
    ):
        on = sorted(map(tuple, fn(True).collect()))
        off_df = fn(False)
        off = sorted(map(tuple, off_df.collect()))
        assert on == off and len(on) > 0


def test_duplicate_span_removal_hand_case(spark):
    """Lee et al. ExactSubstr removal semantics on constructed docs: the
    canonical (lowest doc,pos) copy of every duplicated 5-gram survives
    verbatim; a verbatim twin is stripped to nothing; an embedded span
    is excised leaving the flanks; sub-window docs survive whole; a
    SELF-repeat inside one document loses to its own first occurrence."""
    import hashlib

    from cruncher_spark.operators.dedup import duplicate_span_removal

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    d1 = "a b c d e f g h"               # canonical owner
    d2 = d1                               # verbatim twin -> fully removed
    d3 = "u v w q1 q2 q3 q4 q5"           # unique -> untouched
    d4 = "too short now"                  # < n words -> no occurrences
    d5 = "x y a b c d e z w"              # embedded copy of d1's span
    d6 = "p q r s t p q r s t"            # self-repeat
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4), (5, d5), (6, d6)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_span_removal(docs, n=5).collect()}
    assert (out[1].n_removed, out[1].clean_digest) == (0, md5(d1))
    assert (out[2].n_removed, out[2].clean_digest) == (8, md5(""))
    assert (out[3].n_removed, out[3].clean_digest) == (0, md5(d3))
    assert (out[4].n_words, out[4].n_removed) == (3, 0)
    assert out[4].clean_digest == md5(d4)
    assert (out[5].n_removed, out[5].clean_digest) == (5, md5("x y z w"))
    assert (out[6].n_removed, out[6].clean_digest) == (5, md5("p q r s t"))


def test_perplexity_buckets_hand_case(spark):
    """CCNet bucketing: with the whole corpus as the fit sample, one
    language's nine docs split head/middle/tail 3/3/3 in avg_nll order;
    a language absent from the fit sample falls entirely to tail."""
    from cruncher_spark.operators.curation import perplexity_buckets

    texts = []
    for i in range(1, 10):
        # doc i repeats a common bigram (low nll) i times then adds
        # increasingly rare word pairs -> avg_nll grows with i
        common = "the cat " * (10 - i)
        rare = " ".join(f"w{i}x{j} w{i}y{j}" for j in range(i))
        texts.append((i, (common + rare).strip(), "en"))
    docs = spark.createDataFrame(texts, "doc_id long, text string, lang string")

    full = perplexity_buckets(docs, sample_mod=1)
    got = {r.doc_id: r for r in full.collect()}
    order = sorted(got, key=lambda d: (got[d].avg_nll, d))
    buckets = [got[d].bucket for d in order]
    assert buckets == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3

    # ids 1..9 are never 0 mod 100 -> empty fit sample -> all tail
    unfit = perplexity_buckets(docs, sample_mod=100)
    assert {r.bucket for r in unfit.collect()} == {"tail"}

    # cache lifetime (r10 ADVICE: keyed, not last-call-wins): the same
    # logical input REUSES its persisted scorer across invocations —
    # including the two sample_mod variants above (the scorer is
    # mod-independent) — while distinct inputs evict oldest-first past
    # the bound, so an interleaved caller never silently recomputes
    from cruncher_spark.operators.curation import (
        _PPL_CACHE_LOCK,
        _PPL_CACHE_MAX,
        _PPL_CACHES,
        _ppl_cache_lookup,
    )

    with _PPL_CACHE_LOCK:
        prev = _ppl_cache_lookup(docs, "doc_id", "text", "lang")
    assert prev is not None and prev.is_cached
    perplexity_buckets(docs, sample_mod=1)
    with _PPL_CACHE_LOCK:
        assert _ppl_cache_lookup(docs, "doc_id", "text", "lang") is prev
    assert prev.is_cached  # reused, not rebuilt
    # interleave: B's build must not drop A's cache (the r10 trap)
    other = spark.createDataFrame(
        [(1, "a b a b", "en")], "doc_id long, text string, lang string"
    )
    perplexity_buckets(other, sample_mod=1)
    with _PPL_CACHE_LOCK:
        assert _ppl_cache_lookup(docs, "doc_id", "text", "lang") is prev
    assert prev.is_cached
    # eviction: flood with distinct inputs until A falls off the LRU
    for i in range(_PPL_CACHE_MAX):
        filler = spark.createDataFrame(
            [(1, f"f{i} g{i} f{i} g{i}", "en")],
            "doc_id long, text string, lang string",
        )
        perplexity_buckets(filler, sample_mod=1)
    with _PPL_CACHE_LOCK:
        assert _ppl_cache_lookup(docs, "doc_id", "text", "lang") is None
    assert not prev.is_cached
    assert len(_PPL_CACHES) <= _PPL_CACHE_MAX
    while _PPL_CACHES:
        _PPL_CACHES.pop()[2].unpersist()


def test_ppl_cache_degrades_past_stale_session_entries(spark):
    """Entries built under a now-stopped SparkSession must not crash an
    unrelated later perplexity_buckets call (r11 ADVICE): a cached plan
    whose sameResult probe RAISES is evicted by the lookup instead of
    squatting in the bounded cache, and an eviction-time unpersist that
    raises degrades to drop-only."""
    from cruncher_spark.operators.curation import (
        _PPL_CACHE_LOCK,
        _PPL_CACHE_MAX,
        _PPL_CACHES,
        perplexity_buckets,
    )

    class RaisingPlan:
        def sameResult(self, other):
            raise RuntimeError("SparkSession stopped")

    class RaisingDF:
        def unpersist(self, *a):
            raise RuntimeError("SparkSession stopped")

    params = ("doc_id", "text", "lang")
    with _PPL_CACHE_LOCK:
        # probe-raising entry (dead session, plan reachable)
        _PPL_CACHES.append((params, RaisingPlan(), RaisingDF()))
        # plan-unreachable entry that will be FIFO-evicted: its
        # unpersist raising must not crash the eviction loop
        _PPL_CACHES.append((params, None, RaisingDF()))
    docs = spark.createDataFrame(
        [(1, "a b a b", "en"), (2, "c d c d", "en")],
        "doc_id long, text string, lang string",
    )
    out = perplexity_buckets(docs, sample_mod=1)  # must not raise
    assert out.count() == 2
    with _PPL_CACHE_LOCK:
        # the raising-probe entry was evicted by the lookup itself
        assert not any(isinstance(e[1], RaisingPlan) for e in _PPL_CACHES)
    # flood: the plan-None entry reaches the FIFO eviction's unpersist
    for i in range(_PPL_CACHE_MAX + 1):
        filler = spark.createDataFrame(
            [(1, f"s{i} t{i} s{i} t{i}", "en")],
            "doc_id long, text string, lang string",
        )
        perplexity_buckets(filler, sample_mod=1)
    with _PPL_CACHE_LOCK:
        assert len(_PPL_CACHES) <= _PPL_CACHE_MAX
        assert not any(isinstance(e[2], RaisingDF) for e in _PPL_CACHES)
        while _PPL_CACHES:
            try:
                _PPL_CACHES.pop()[2].unpersist()
            except Exception:
                pass


def test_domain_token_cap_matches_python_reference(spark):
    """domain_token_cap (r12): per-domain running-token cap in the
    deterministic (md5 hash, id) order — checked against a pure-python
    mirror of the same hash and prefix-sum rule, including the hard-cap
    edge (a single over-cap document is dropped even alone) and the
    boundary document that exactly reaches the cap."""
    import hashlib

    from cruncher_spark.operators.curation import domain_token_cap

    def h(i: int) -> int:
        return int(
            hashlib.md5(f"{i}#domcap".encode()).hexdigest()[:15], 16
        )

    rows = [
        # domain a: several small docs — cap lands mid-sequence
        (1, "w " * 4, "a"), (2, "w " * 3, "a"), (3, "w " * 5, "a"),
        (4, "w " * 2, "a"),
        # domain b: one doc exactly at cap, one over
        (5, "x " * 9, "b"), (6, "x " * 50, "b"),
        # domain c: single doc bigger than cap -> dropped even alone
        (7, "y " * 40, "c"),
    ]
    # note: "w " * 4 has a trailing space -> split yields an extra empty
    # token; mirror with len(text.split(" ")) exactly as Spark does
    cap = 10
    expected = {}
    by_dom: dict[str, list] = {}
    for i, t, d in rows:
        by_dom.setdefault(d, []).append((h(i), i, len(t.split(" "))))
    for d, docs in by_dom.items():
        cum = 0
        for _, i, tok in sorted(docs):
            cum += tok
            expected[i] = cum <= cap
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["id"]: (r["kept"], r["tokens"])
        for r in domain_token_cap(df, cap).collect()
    }
    assert len(got) == len(rows)
    for i, t, _ in rows:
        assert got[i] == (expected[i], len(t.split(" "))), i
    assert not got[7][0]  # hard cap: over-cap singleton dropped
    # the cap binds somewhere and spares somewhere (fixture nontrivial)
    kept = [k for k, _ in got.values()]
    assert any(kept) and not all(kept)


def test_balanced_shards_matches_python_reference(spark):
    """balanced_shards (r12): token-balanced shard assignment in the
    deterministic (bucket, md5 hash, id) global layout order — checked
    against a pure-python mirror of the global prefix sum in the same
    order (the two-phase bucket form must equal the naive global cumsum
    exactly), plus the stated balance contract: every shard index in
    [0, n_shards), per-shard token totals <= target + max_doc - 1 (a
    doc is assigned where it STARTS, so only the straddling doc
    overflows), and the assignment is invariant to input partitioning."""
    import hashlib

    from cruncher_spark.operators.curation import balanced_shards

    def h(i: int) -> int:
        return int(hashlib.md5(f"{i}#shard".encode()).hexdigest()[:15], 16)

    n_shards, n_buckets = 4, 8
    rows = [(i, "w " * (i % 7) + "end") for i in range(1, 41)]
    toks = {i: len(t.split(" ")) for i, t in rows}
    order = sorted(rows, key=lambda r: (h(r[0]) % n_buckets, h(r[0]), r[0]))
    total = sum(toks.values())
    target = -(-total // n_shards)
    expected, cum = {}, 0
    for i, _ in order:
        expected[i] = (cum, cum // target)
        cum += toks[i]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for parts in (1, 7):
        got = {
            r["id"]: (r["start_tok"], r["shard"], r["tokens"])
            for r in balanced_shards(
                df.repartition(parts), n_shards, n_buckets=n_buckets
            ).collect()
        }
        assert len(got) == len(rows)
        for i, _ in rows:
            assert got[i] == (*expected[i], toks[i]), i
    # balance contract on the realized plan
    shard_tot: dict[int, int] = {}
    for i, _ in rows:
        s = expected[i][1]
        shard_tot[s] = shard_tot.get(s, 0) + toks[i]
    max_doc = max(toks.values())
    assert all(0 <= s < n_shards for s in shard_tot)
    assert sorted(shard_tot) == list(range(len(shard_tot)))  # contiguous
    for tot in shard_tot.values():
        assert tot <= target + max_doc - 1
    assert len(shard_tot) > 1  # fixture nontrivial: the plan actually splits


def test_balanced_shards_random_corpora_and_edges(spark):
    """Seeded random corpora × parameter sweep vs the same pure-python
    mirror, plus the degenerate corners: n_shards=1 (everything lands
    in shard 0), n_buckets=1 (the single-bucket layout — one global
    run, still exact), a single-document corpus, and total_tokens <
    n_shards (target clamps to ceil(total/n) ≥ 1, indexes stay valid)."""
    import hashlib
    import random

    from cruncher_spark.operators.curation import balanced_shards

    def mirror(rows, n_shards, n_buckets):
        def h(i):
            return int(
                hashlib.md5(f"{i}#shard".encode()).hexdigest()[:15], 16
            )

        toks = {i: len(t.split(" ")) for i, t in rows}
        order = sorted(rows, key=lambda r: (h(r[0]) % n_buckets, h(r[0]), r[0]))
        total = sum(toks.values())
        target = -(-total // n_shards)
        out, cum = {}, 0
        for i, _ in order:
            out[i] = (cum, cum // target, toks[i])
            cum += toks[i]
        return out

    cases = []
    rng = random.Random(7)
    for n_shards, n_buckets in ((1, 8), (3, 1), (16, 5), (5, 64)):
        rows = [
            (rng.randrange(10**9), "w " * rng.randrange(12) + "end")
            for _ in range(rng.randrange(5, 60))
        ]
        rows = list({i: t for i, t in rows}.items())  # unique ids
        cases.append((rows, n_shards, n_buckets))
    cases.append(([(42, "a b c")], 4, 8))  # single doc
    cases.append(([(1, "a"), (2, "b")], 8, 3))  # total < n_shards

    for rows, n_shards, n_buckets in cases:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["id"]: (r["start_tok"], r["shard"], r["tokens"])
            for r in balanced_shards(
                df, n_shards, n_buckets=n_buckets
            ).collect()
        }
        exp = mirror(rows, n_shards, n_buckets)
        assert got == exp, (n_shards, n_buckets)
        assert all(0 <= s < n_shards for _, s, _ in got.values())
        if n_shards == 1:
            assert {s for _, s, _ in got.values()} == {0}


def test_duplicate_span_removal_matches_reference(spark):
    """Seeded random corpora vs a pure-Python reference of the removal
    contract (loser = any non-canonical occurrence of a >=2x n-gram),
    plus partitioning invariance — the digest must not depend on how
    the input is split across tasks."""
    import hashlib
    import random

    from cruncher_spark.operators.dedup import duplicate_span_removal

    n = 3

    def reference(texts):
        occ: dict[str, list[tuple[int, int]]] = {}
        for d, t in texts:
            wl = t.split(" ")
            for p in range(1, len(wl) - n + 2):
                occ.setdefault(" ".join(wl[p - 1 : p - 1 + n]), []).append(
                    (d, p)
                )
        removed: dict[int, set[int]] = {d: set() for d, _ in texts}
        for sites in occ.values():
            if len(sites) < 2:
                continue
            win = min(sites)  # lexicographic (doc, pos) — no packing bound
            for site in sites:
                if site != win:
                    removed[site[0]].update(range(site[1], site[1] + n))
        out = {}
        for d, t in texts:
            wl = t.split(" ")
            kept = [w for i, w in enumerate(wl, 1) if i not in removed[d]]
            out[d] = (
                len(wl),
                len(removed[d]),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
        return out

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d", "e", "f"]  # tiny -> heavy collisions
        texts = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for d in range(1, 21)
        ]
        expect = reference(texts)
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_words, r.n_removed, r.clean_digest)
            for r in duplicate_span_removal(docs, n=n).collect()
        }
        assert got == expect, f"seed {seed}"
        rep = {
            r.doc_id: (r.n_words, r.n_removed, r.clean_digest)
            for r in duplicate_span_removal(docs.repartition(7), n=n).collect()
        }
        assert rep == expect, f"seed {seed} (repartitioned)"


def test_duplicate_span_removal_long_document(spark):
    """Canonical-owner selection must survive documents longer than any
    packing stride. The retired ``id*100000+pos`` key made a doc-1
    occurrence at pos>100000 pack HIGHER than a doc-2 occurrence at a
    small pos, mis-picking the owner (and equal packed values let both
    survive). With struct-min ordering, doc 1's late occurrence is
    still canonical over doc 2's early one.

    Construction: a 100_005-word doc 1 whose final 3 words are the
    shingle X, and a doc 2 that opens with X. Lowest (doc,pos) is
    (1, 100003) -> doc 1 keeps every word, doc 2 loses its first 3.
    Old packing: (1*100000+100003)=200003 > (2*100000+1)=200001, so the
    owner flipped to doc 2 — this test fails on that formula."""
    import hashlib

    from cruncher_spark.operators.dedup import duplicate_span_removal

    filler = [f"w{i}" for i in range(100_002)]  # all-unique prefix
    shingle = ["x", "y", "z"]
    doc1 = " ".join(filler + shingle)
    doc2 = " ".join(shingle + ["tail1", "tail2"])
    docs = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_removed, r.clean_digest)
        for r in duplicate_span_removal(docs, n=3).collect()
    }
    d1 = hashlib.md5(doc1.encode()).hexdigest()
    d2 = hashlib.md5(" ".join(["tail1", "tail2"]).encode()).hexdigest()
    assert got[1] == (100_005, 0, d1)
    assert got[2] == (5, 3, d2)


def test_quality_pr_curve_invariants(spark):
    """Threshold-sweep sanity on the registered gate at the smoke SF:
    counts are threshold-monotone (n_pred, tp non-increasing as the
    cut rises), tp is bounded by both margins, and the fixed corpus
    totals are constant across rows."""
    from cruncher_spark.plans import query_map

    rows = sorted(
        query_map()["quality_pr_curve"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 5
    assert len({(r.n_docs, r.n_pos) for r in rows}) == 1  # corpus-constant
    for r in rows:
        assert 0 <= r.tp <= min(r.n_pred, r.n_pos)
        if r.n_pred:
            assert abs(r.prec - round(r.tp / r.n_pred, 6)) < 1e-12
    for a, b in zip(rows, rows[1:]):
        assert b.n_pred <= a.n_pred and b.tp <= a.tp
