"""Corpus-curation operators: decontamination and deterministic sampling.

Two operations every LLM training-data pipeline runs at full-corpus scale,
beyond the reference's own surface (the reference has no document
pipeline; these extend the engine the way SURVEY §7's beyond-reference
plan prescribes):

- **benchmark decontamination** (:func:`contamination_check`): flag
  corpus documents sharing word n-grams with an evaluation/benchmark
  set, the standard defense against test-set leakage into training data
  (GPT-3 App. C / The Pile use 13-grams; the n is a parameter — the
  fixtures' ~50-word documents use 3). Scale shape: the eval side is
  SMALL by construction (benchmarks are thousands of documents, not
  billions), so its distinct grams BROADCAST; the corpus side is one
  explode + broadcast-hash semi-join + one aggregate — no corpus-side
  shuffle except the final per-doc count, and no all-pairs anything.

- **stratified hash sampling** (:func:`stratified_sample`): keep each
  row iff ``portable_hash64(id, salt) % DENOM < rate(stratum) * DENOM``.
  Per-stratum rates let a pipeline rebalance (e.g. downsample the
  dominant language); the hash is deterministic and engine-portable, so
  the SAME rows are selected on every run and every engine — which is
  what makes train/val/test splits reproducible (disjoint hash ranges
  from the same salt give leak-proof splits: a row's assignment never
  depends on partitioning, ordering, or cluster size). Scale shape:
  pure map-side filter — rates inline into the plan, no join, no
  shuffle, nothing to skew.
"""

from __future__ import annotations

import threading
from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cruncher_spark.functions.text import portable_hash64

#: hash-space denominator for sampling rates: rates quantize to 1/10000
SAMPLE_DENOM = 10_000


def contamination_check(
    corpus_sh: DataFrame,
    eval_sh: DataFrame,
    id_col: str,
) -> DataFrame:
    """Per-document n-gram overlap with a benchmark set.

    Inputs are ``(id, sh: array<string>)`` shingle tables (see
    :func:`cruncher_spark.operators.dedup.shingle_arrays`) for the corpus
    and the (small) eval set. Output: ``(id, n_matched, n_grams,
    contamination_ratio)`` for every corpus document with ≥1 matched
    gram — the pipeline then drops or audits those ids.

    Plan: eval grams → ``array_distinct``/``explode``/``distinct`` →
    broadcast; corpus explode joins it map-side; one hash aggregate
    counts distinct matches per doc (shingle arrays are distinct per
    doc already, so ``count(*)`` == distinct matched grams).
    """
    eval_grams = (
        eval_sh.select(F.explode("sh").alias("gram")).distinct()
    )
    corpus = corpus_sh.select(
        F.col(id_col), F.size("sh").alias("n_grams"), F.explode("sh").alias("gram")
    )
    return (
        corpus.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .select(
            id_col,
            "n_matched",
            "n_grams",
            (F.col("n_matched").cast("double") / F.col("n_grams")).alias(
                "contamination_ratio"
            ),
        )
    )


def contaminated_ids(
    corpus_sh: DataFrame,
    eval_sh: DataFrame,
    id_col: str,
) -> DataFrame:
    """Just the ids of contaminated documents — the drop-list form.

    Same broadcast shape as :func:`contamination_check` but with a
    left-semi join instead of the per-doc match counting: when the
    pipeline only anti-joins the ids away (the common curation case),
    the count aggregate is wasted work. ``distinct`` on the surviving
    ids is the lone shuffle, and only over matched rows.
    """
    eval_grams = eval_sh.select(F.explode("sh").alias("gram")).distinct()
    return (
        corpus_sh.select(F.col(id_col), F.explode("sh").alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum downsample.

    Keeps a row iff ``hash(id, salt) % 10000 < rate(stratum) * 10000``
    (rates quantize to 1/10000). Unlike ``df.sample``/``sampleBy`` —
    whose selection depends on partition-level RNG streams and therefore
    on the physical plan — the hash rule is a pure function of the row,
    so results are identical across runs, partitionings, and engines,
    and complementary salts/ranges give reproducible disjoint splits.
    """
    # round, don't truncate: 0.57 * 10000 is 5699.999… in binary floating
    # point, and int() would quantize it to 5699 — off by one row-in-10000
    # from the documented `rate * 10000` rule an external reproducer uses
    thresh = F.lit(round(default_rate * SAMPLE_DENOM))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(round(rate * SAMPLE_DENOM))
        ).otherwise(thresh)
    bucket = portable_hash64(F.col(id_col).cast("string"), salt=salt) % SAMPLE_DENOM
    return df.where(bucket < thresh)


def mixture_sample(
    docs: DataFrame,
    weight_col,
    budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    basis: int = 10_000,
) -> DataFrame:
    """Deterministic source-mixture sampling: draw ~``budget`` rows whose
    SOURCE PROPORTIONS follow ``weight_col`` (a Column giving each row's
    source weight), regardless of how skewed the raw corpus is.

    The standard training-data mixing step (web/code/books ratios): each
    source's target share is ``budget * w_s / sum(w)``, its acceptance
    rate is ``target_s / n_s`` quantized to integer ``basis`` points
    (floored — exact integer arithmetic, engine-portable), and a row is
    kept iff ``hash(id) % basis < rate_bp``. Two passes: a per-source
    count (map-side combinable, O(sources) rows), then a map-side-only
    broadcast-join + hash filter over the fact — no shuffle of the corpus,
    the same scale shape as :func:`stratified_sample`. Deterministic
    across runs AND across partitionings, so train mixtures are
    reproducible bit-for-bit.
    """
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__n"), F.max(weight_col).alias("__w")
    )
    total = counts.agg(F.sum("__w").alias("__sum_w"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        source_col,
        F.least(
            F.lit(basis).cast("long"),
            F.expr(
                f"(CAST({basis} AS BIGINT) * {budget} * __w)"
                " div (CAST(__sum_w AS BIGINT) * __n)"
            ),
        ).alias("rate_bp"),
    )
    keyed = docs.join(F.broadcast(rates), source_col)
    accept = (
        portable_hash64(F.col(id_col).cast("string"), salt="mix") % basis
    ) < F.col("rate_bp")
    return keyed.where(accept)


def domain_token_cap(
    docs: DataFrame,
    cap_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    salt: str = "domcap",
) -> DataFrame:
    """Dolma/C4-class DOMAIN BALANCING: no domain may contribute more
    than ``cap_tokens`` whitespace tokens to the output mixture. Within
    each domain, documents are taken in the deterministic
    ``(hash(id, salt), id)`` order (the stratified_sample hash family —
    a pure function of the row, identical across runs, partitionings,
    and engines) and a document is kept iff the RUNNING token total
    including itself stays ≤ the cap; a single document larger than the
    cap is dropped even alone (hard cap, stated contract). The
    cap-by-tokens (not by docs) rule is what real web mixtures use:
    over-crawled domains contribute long boilerplate-heavy pages, so a
    doc-count cap under-trims exactly the domains that need it.

    Output: (id, domain, tokens, kept) — one row per input document.

    Scale shape: ONE shuffle, hash-partitioned by domain; the running
    sum is a window prefix-sum inside each domain's sorted run
    (O(n log n_domain) sort, spill-safe — never a driver collect or a
    cross-domain barrier). A pathologically hot domain funnels into a
    single task; at 100 TB the standard remedy is pre-aggregating
    per-(domain, hash-range) partial token sums to locate the cutoff
    hash, then a map-side keep — the same two-phase refinement the
    CCNet cutoff fit uses. The window form is the declarative baseline
    the oracle mirrors bit-for-bit.
    """
    from pyspark.sql import Window

    tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    h = portable_hash64(F.col(id_col).cast("string"), salt=salt)
    w = (
        Window.partitionBy("domain")
        .orderBy(F.col("h"), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(domain_col).alias("domain"),
            tokens.alias("tokens"),
            h.alias("h"),
        )
        .select(
            "id",
            "domain",
            "tokens",
            (F.sum("tokens").over(w) <= cap_tokens).alias("kept"),
        )
    )


def sequence_pack(
    docs: DataFrame,
    pack_tokens: int,
    n_shards: int,
    token_count_col,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a token
    RANGE inside fixed-size training sequences (GPT-style packing, where
    documents are concatenated in a deterministic order and sliced into
    ``pack_tokens``-token windows; a document may straddle a boundary).

    A single global concatenation order would funnel the running token
    sum through ONE sorted partition — the classic window-function scale
    cliff. Instead documents hash into ``n_shards`` independent streams
    and the cumulative sum runs per shard: full parallelism, and the
    output pack key is (shard, pack) so downstream loaders read shards
    independently. Per-shard order is ``id_col`` — deterministic across
    runs and partitionings.

    Output adds: shard, start_tok / end_tok (the doc's range in its
    shard's token stream), first_pack / last_pack (the sequence windows
    it lands in).
    """
    from pyspark.sql import Window

    shard = (
        portable_hash64(F.col(id_col).cast("string"), salt="pack")
        % n_shards
    ).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        id_col, shard, token_count_col.cast("long").alias("n_tokens")
    )
    cum = toks.withColumn("end_tok", F.sum("n_tokens").over(w))
    return cum.select(
        id_col,
        "shard",
        "n_tokens",
        (F.col("end_tok") - F.col("n_tokens")).alias("start_tok"),
        "end_tok",
        F.expr(f"(end_tok - n_tokens) div {pack_tokens}").alias("first_pack"),
        F.expr(f"(end_tok - 1) div {pack_tokens}").alias("last_pack"),
    )


def balanced_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """TOKEN-BALANCED output sharding: assign every document to one of
    ``n_shards`` output shards so shard token totals are near-equal —
    the "write the curated corpus as N balanced files" planner that
    sits between :func:`domain_token_cap` (what goes in the mixture)
    and :func:`sequence_pack` (how a loader slices it). Hash-mod
    sharding (``sequence_pack``'s stream key) balances only in
    EXPECTATION; heavy-tailed document lengths leave shards percents
    apart, and training infra wants files of equal token size.

    Contract: documents are laid out in the deterministic global order
    ``(bucket, hash(id, salt), id)`` (``bucket = hash % n_buckets`` — a
    pure function of the row, identical across runs, partitionings and
    engines), each doc's ``start_tok`` is the corpus-wide token offset
    where it begins, and ``shard = start_tok div target`` with
    ``target = ceil(total_tokens / n_shards)``. Every shard index lands
    in ``[0, n_shards)``, and a shard's token total exceeds ``target``
    by at most ``max_doc_tokens - 1`` (a doc is assigned where it
    STARTS, so only the straddling doc overflows) — the balance bound
    the tests assert.

    Scale shape — the global prefix-sum WITHOUT the global window
    cliff (one total-ordered window would funnel the whole corpus
    through a single sorted task; cf. ``sequence_pack``'s note):

    1. ONE corpus scan into ONE wide shuffle hash-partitioned by
       ``bucket``; inside it a per-bucket running prefix-sum AND the
       per-bucket total as a second full-frame window over the SAME
       exchange (ReuseExchange — the bucket-sum branch must not replan
       its own corpus scan, which the naive groupBy form does);
    2. the ``n_buckets`` distinct (bucket, total) rows fall out of the
       already-bucket-partitioned data with no further exchange; the
       EXCLUSIVE prefix over that tiny table (one task over
       ``n_buckets`` rows — bounded by a parameter, not the corpus)
       yields each bucket's global offset, broadcast back;
    3. the corpus total aggregates from those same ``n_buckets`` rows
       into a 1-row broadcast, so ``target`` stays a column
       expression — no driver collect anywhere.

    At 100 TB: ``n_buckets`` scales with the cluster (buckets ≈ task
    count keeps per-bucket sorts executor-sized); everything corpus-
    sized stays in stage 1.

    Output: (id, tokens, start_tok, shard) — one row per document.
    """
    from pyspark.sql import Window

    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            F.size(F.split(F.col(text_col), " ")).cast("long")
            .alias("tokens"),
            portable_hash64(F.col(id_col).cast("string"), salt=salt)
            .alias("h"),
        )
        .withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
        # explicit not-null (vacuous: md5 of a non-null cast never nulls)
        # so the offsets join cannot infer an isnotnull(bucket) onto the
        # probe branch alone — an asymmetric inferred filter makes the
        # two corpus subtrees differ and defeats the exchange reuse
        .filter(F.col("bucket").isNotNull())
    )

    w_doc = (
        Window.partitionBy("bucket")
        .orderBy("h", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = tok.select(
        "id",
        "tokens",
        "bucket",
        F.sum("tokens").over(w_doc).alias("cum"),
        F.sum("tokens").over(Window.partitionBy("bucket")).alias("btok"),
    )

    bucket_sums = cum.select("bucket", "btok").distinct()
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "bucket",
        F.coalesce(F.sum("btok").over(w_off), F.lit(0)).alias("offset"),
    )
    total = bucket_sums.agg(F.sum("btok").alias("total"))

    return (
        cum.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "start_tok", F.col("offset") + F.col("cum") - F.col("tokens")
        )
        .select(
            "id",
            "tokens",
            "start_tok",
            F.expr(
                f"start_tok div ((total + {n_shards - 1}) div {n_shards})"
            ).alias("shard"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping word-window chunking — the RAG/embedding-prep primitive
    (split every document into ``window``-word chunks every ``stride``
    words, ``window - stride`` words of overlap between neighbors).

    Chunk starts are 0, stride, 2*stride, … while < n_words, so a doc
    yields ``ceil(n_words / stride)`` chunks and the tail chunk may be
    short (never empty). Returns (id, chunk_ix, n_words, chunk_digest);
    the digest stands in for the chunk text in the gate (the text itself
    is `array_join`-reconstructable and row-identical by construction).

    Scale shape: pure narrow work — split, bounded sequence-explode,
    slice, hash; no shuffle at all. Output size is corpus x (1 +
    overlap/stride), the explicit cost of overlap.
    """
    from cruncher_spark.functions.text import words

    # every-word-covered invariant (pinned by the tests) requires each
    # chunk to reach at least the next chunk's start (ADVICE r5:
    # stride > window silently skipped words between chunks)
    if stride > window:
        raise ValueError(
            f"stride ({stride}) must be <= window ({window}): chunks "
            "must cover every word; a gap between consecutive chunks "
            "is never intended for RAG/embedding prep"
        )
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")

    wl = words(text_col)
    n_chunks = F.ceil(F.size(wl) / F.lit(stride))
    base = docs.select(
        F.col(id_col), wl.alias("wl"), n_chunks.alias("nc")
    ).where(F.col("nc") >= 1)
    chunk_words = F.slice(
        "wl", F.col("chunk_ix").cast("int") * stride + 1, window
    )
    return (
        base.select(
            F.col(id_col),
            "wl",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("nc") - 1, F.lit(1))
            ).alias("chunk_ix"),
        )
        .select(
            F.col(id_col),
            "chunk_ix",
            F.size(chunk_words).alias("n_words"),
            F.md5(F.array_join(chunk_words, " ")).alias("chunk_digest"),
        )
    )


def chunk_documents_oracle_sql(
    id_col: str = "doc_id", window: int = 32, stride: int = 24
) -> str:
    """DuckDB rendering of the identical chunking."""
    return f"""
    WITH w AS (SELECT {id_col}, string_split(text, ' ') AS wl FROM documents),
    c AS (
      SELECT {id_col}, CAST(g AS BIGINT) AS chunk_ix,
        wl[(CAST(g AS INT)*{stride}+1):(CAST(g AS INT)*{stride}+{window})] AS cw
      FROM w, unnest(range(0, CAST(ceil(len(wl) / {stride}.0) AS BIGINT))) t(g)
      WHERE len(wl) > 0
    )
    SELECT {id_col}, chunk_ix, len(cw) AS n_words,
      md5(array_to_string(cw, ' ')) AS chunk_digest
    FROM c
    """


def reservoir_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    *,
    two_phase_buckets: int | None = None,
) -> DataFrame:
    """Deterministic k-per-key sample ("reservoir" made reproducible):
    rank rows inside each key by the md5 of their id and keep the k
    smallest. The hash order is uniform-pseudorandom yet identical on
    every run, engine, and partitioning — the property a train-time
    per-source cap needs (classic reservoir sampling is stream-order-
    dependent and irreproducible).

    Returns (key, id, rk in 1..k). Scale shape: ONE shuffle (hash-
    partition by key) + per-partition sort; a skewed key sorts spill-
    safely inside its partition, and AQE's skew handling does not apply
    to window shuffles — for a pathological corpus where one key holds
    most rows, pass ``two_phase_buckets=B`` (VERDICT r5 next #4): phase
    one ranks within (key, hash-bucket-of-id) — B-way parallel even for
    a single key — and keeps k per bucket, so phase two's per-key rank
    sorts at most ``B*k`` rows per key instead of the key's whole
    population. Identical output by construction: the global k smallest
    under the (md5, id) order are each within their own bucket's k
    smallest, and both phases use the same total order.
    """
    from pyspark.sql import Window

    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    src = df.select(F.col(key_col), F.col(id_col))
    if two_phase_buckets is not None and two_phase_buckets > 1:
        wb = Window.partitionBy(key_col, "_rpk_bkt").orderBy(*order)
        src = (
            src.withColumn(
                "_rpk_bkt",
                F.pmod(
                    F.xxhash64(F.col(id_col).cast("string")),
                    F.lit(two_phase_buckets),
                ),
            )
            .withColumn("_rpk_brk", F.row_number().over(wb))
            .where(F.col("_rpk_brk") <= k)
            .drop("_rpk_bkt", "_rpk_brk")
        )
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        src.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def doc_mean_token_freq(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_buckets: int = 8,
) -> DataFrame:
    """Corpus-relative rarity score per document: the mean corpus
    frequency of the document's tokens (low mean = rare vocabulary, the
    cheap unigram stand-in for LM-perplexity quality filters; boilerplate
    and stopword-soup documents score HIGH).

    Integer-exact until the final division: token frequencies and their
    per-doc sums are exact longs, and long/long division is a single
    IEEE double op — identical on every engine — rounded to 6 decimals.

    Scale shape: one corpus-sized shuffle for the frequency aggregate
    (map-side combined), one term-keyed join to attach frequencies, one
    per-doc aggregate. The frequency-attach join is explicitly SALTED:
    the token side joins on (term, hash(id) % salt_buckets) and the
    one-row-per-term frequency side is replicated across all buckets, so
    a stopword that is half the corpus spreads over ``salt_buckets``
    partitions deterministically. Explicit rather than AQE because
    OptimizeSkewedJoin is structurally unavailable here (verified r6,
    pinned by tests/test_pipeline_ops.py): it pattern-matches
    SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) over ENSURE_REQUIREMENTS
    stages only, and the frequency aggregate fuses INSIDE the join stage
    (child = Sort(HashAgg(ShuffleRead))), while forcing a boundary with
    repartition() mints a REPARTITION_BY_COL stage AQE refuses to
    rewrite. Salt cost: the vocabulary-sized frequency table shuffles
    x salt_buckets — negligible next to the corpus-sized token side.
    """
    from cruncher_spark.functions.text import words

    toks = docs.select(
        F.col(id_col), F.explode(words(text_col)).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    salted_toks = toks.withColumn(
        "salt",
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets)),
    )
    salted_freq = freq.select(
        "term",
        "c",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(salt_buckets - 1))
        ).alias("salt"),
    )
    return (
        salted_toks.join(salted_freq, ["term", "salt"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("freq_sum"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(
                F.col("freq_sum") / F.col("n_tokens"), 6
            ).alias("mean_token_freq"),
        )
    )


def fuzzy_contamination(
    corpus_sh: DataFrame,
    eval_sh: DataFrame,
    id_col: str = "doc_id",
    min_containment: float = 0.5,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """NEAR-duplicate benchmark contamination: corpus documents whose
    shingle sets CONTAIN a large fraction of an eval document's shingles
    — the fuzzy complement to :func:`contamination_check`, which counts
    exact shared grams per corpus doc but cannot say "this corpus doc is
    a light paraphrase of that benchmark item". Containment |C∩E|/|E|
    is the right asymmetric measure: a benchmark question embedded in a
    much larger corpus page scores ~1.0 where symmetric Jaccard would
    dilute toward 0.

    Inputs are (id, sh) shingle-array tables (:func:`shingle_arrays`).
    Scale shape: MinHash signatures on both sides (map-side-combinable
    aggregates), banded candidates via an equi-join where the eval side
    is benchmark-sized (broadcast — the corpus never shuffles for
    candidate generation), and exact containment verified by
    ``array_intersect`` on candidates only. Self-pairs (a benchmark doc
    also present in the corpus) are kept — finding exact copies is
    contamination too.
    """
    from cruncher_spark.operators.dedup import (
        lsh_cross_candidates,
        minhash_signatures,
    )

    sig_c = minhash_signatures(corpus_sh, id_col, num_hashes).withColumnRenamed(
        id_col, "corpus_id"
    )
    sig_e = minhash_signatures(eval_sh, id_col, num_hashes).withColumnRenamed(
        id_col, "eval_id"
    )
    cand = lsh_cross_candidates(
        sig_c, sig_e, "corpus_id", "eval_id",
        num_hashes=num_hashes, band_size=band_size,
    )
    verified = (
        cand.join(
            corpus_sh.select(
                F.col(id_col).alias("corpus_id"), F.col("sh").alias("sh_c")
            ),
            "corpus_id",
        )
        .join(
            F.broadcast(
                eval_sh.select(
                    F.col(id_col).alias("eval_id"), F.col("sh").alias("sh_e")
                )
            ),
            "eval_id",
        )
        .select(
            "corpus_id",
            "eval_id",
            (
                F.size(F.array_intersect("sh_c", "sh_e")).cast("double")
                / F.size("sh_e")
            ).alias("containment"),
        )
    )
    return verified.where(F.col("containment") >= min_containment)


def bigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_alpha: int = 1,
) -> DataFrame:
    """Self-trained bigram-LM negative log-likelihood per document — the
    perplexity quality filter real pipelines run (CCNet trains a 5-gram
    KenLM; Gopher/RefinedWeb filter on its perplexity). A corpus-trained
    add-one bigram model is the engine-native counterpart: documents of
    fluent, corpus-typical text score LOW; gibberish, boilerplate-soup
    and wrong-language documents score HIGH. Complements
    :func:`doc_mean_token_freq` (unigram rarity) with CONTEXT: a doc of
    common words in improbable ORDER only this scorer flags.

    Model: ``P(w2|w1) = (c(w1,w2) + a) / (c(w1·) + a·V)`` with a =
    ``vocab_alpha`` and V the corpus unigram vocabulary; per-doc score is
    the bigram-multiplicity-weighted mean of ``-ln P``. Docs with fewer
    than two words have no bigrams and are dropped (a length filter owns
    those).

    Cross-engine float discipline (as tfidf/bm25): all counts are exact
    longs; each distinct bigram's nll is ONE double division + ln,
    rounded to 6 decimals, then accumulated exactly — DECIMAL(18,6)
    weighted by the exact long multiplicity, so the per-doc sum is
    order-independent; the final 6-digit mean is EXACT integer half-up
    rounding of the decimal sum ((2*N6+n) div (2n), N6 = sum*1e6) —
    round(double, 6) there is tie-prone because a 6-decimal sum over a
    small count lands exactly on .5 boundaries, where JVM decimal-
    render rounding and binary rounding disagree (2 of 5000 docs at
    sf0.1, caught by the r9 two-scale oracle attestation).

    Scale shape (the tfidf lesson): the corpus bigram explode feeds two
    map-side-combined aggregates — per-doc multiplicities shuffling once
    on (doc, w1, w2) (uniform, no hot key) and the (w1, w2) model
    counts. Everything DOWNSTREAM of those is vocabulary-sized: context
    totals attach as a SUM OVER the w1 window on the aggregated bigram
    table (window partition = distinct successors of w1, vocabulary-
    bounded — never token- or doc-bounded), and V broadcasts as a
    one-row aggregate, so the smoothing denominators never re-aggregate
    the corpus. The model-attach join keys (w1, w2) against
    per-doc-DISTINCT rows, so a hot bigram ("of the") contributes at
    most one row per document — the posting-list bound bm25 accepts;
    AQE splits any residual skew.
    """
    from pyspark.sql import Window

    from cruncher_spark.functions.text import words

    w = words(text_col)
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.struct(
                        F.element_at(w, i).alias("w1"),
                        F.element_at(w, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("g"),
    ).select(id_col, "g.w1", "g.w2")

    # per-doc multiplicities: the only corpus-sized shuffle
    dg = grams.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("m"))

    # model tables: vocabulary-sized from here on
    cb = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    with_ctx = cb.withColumn(
        "cu", F.sum("cb").over(Window.partitionBy("w1"))
    )
    vocab = docs.select(
        F.explode(w).alias("t")
    ).agg(F.countDistinct("t").alias("v"))

    a = F.lit(vocab_alpha)
    model = with_ctx.crossJoin(F.broadcast(vocab)).select(
        "w1",
        "w2",
        F.round(
            -F.log(
                (F.col("cb") + a).cast("double")
                / (F.col("cu") + a * F.col("v"))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("nll"),
    )

    # final mean via EXACT integer half-up rounding: nll_sum is
    # DECIMAL(18,6) exact, so the 6-digit mean is the integer quotient
    # (2*N6 + n) div (2*n) with N6 = nll_sum*1e6 — round(double, 6)
    # here is the one tie-prone spot (the quotient of a 6-decimal sum
    # by a small count lands EXACTLY on .5 boundaries, where Spark
    # rounds the shortest decimal rendering half-up and DuckDB rounds
    # in binary: 2 of 5000 docs flipped at sf0.1, r9)
    return (
        dg.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("nll")).alias("nll_sum"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            (F.col("nll_sum") * 1_000_000).cast("long").alias("n6"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            (
                F.expr("(2*n6 + n_bigrams) div (2*n_bigrams)").cast(
                    "double"
                )
                / F.lit(1_000_000.0)
            ).alias("avg_nll"),
        )
    )


#: perplexity_buckets' corpus-sized scorer caches, KEYED by the input's
#: analyzed plan + scorer columns so an interleaved caller (build plan
#: A, build plan B, materialize A) reuses A's persisted scorer instead
#: of silently losing it to B's build, and concurrent plan builds on
#: one driver are lock-safe (r10 ADVICE). Entries are
#: (params, jvm analyzed plan, scored DF); hits require the JVM's
#: ``sameResult`` — EXACT semantic plan equality (canonicalized
#: toString would collide for LocalRelations, whose literal data never
#: prints), so a wrong hit is impossible; when the JVM plan is
#: unreachable (connect-mode/API drift) the cache degrades to
#: always-build, never to a stale hit. Bounded FIFO-LRU: the oldest
#: entry unpersists past _PPL_CACHE_MAX — harnesses that cycle corpora
#: (scale_stress u1/u10/u100) hold a handful of caches, never a pile.
_PPL_CACHE_LOCK = threading.Lock()
_PPL_CACHES: list[tuple] = []
_PPL_CACHE_MAX = 4


def _ppl_analyzed_plan(docs: DataFrame):
    """The JVM analyzed logical plan, or None when unreachable."""
    try:
        return docs._jdf.queryExecution().analyzed()
    except Exception:
        return None


def _ppl_cache_lookup(
    docs: DataFrame, id_col: str, text_col: str, lang_col: str
) -> DataFrame | None:
    """Return the cached scorer for this exact input (sameResult match
    on the analyzed plan, same scorer columns), refreshing its LRU
    position; None on miss. Caller must hold _PPL_CACHE_LOCK."""
    jplan = _ppl_analyzed_plan(docs)
    if jplan is None:
        return None
    params = (id_col, text_col, lang_col)
    hit, dead = None, []
    for ent in _PPL_CACHES:
        if ent[0] != params or ent[1] is None:
            continue
        try:
            same = ent[1].sameResult(jplan)
        except Exception:
            # a probe that RAISES marks a dead entry (its SparkSession
            # was stopped — harnesses that restart sessions in-process);
            # evict it now rather than letting it squat in the bounded
            # cache until FIFO age reaches it (r11 ADVICE)
            dead.append(ent)
            continue
        if same and hit is None:
            hit = ent
    for ent in dead:
        _PPL_CACHES.remove(ent)
    if hit is not None:
        _PPL_CACHES.remove(hit)
        _PPL_CACHES.append(hit)
        return hit[2]
    return None


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    sample_mod: int = 5,
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): per language, documents are split into three quality tiers
    by LM perplexity — *head* (most fluent third), *middle*, *tail* —
    so downstream consumers can train on head+middle and audit tail.

    Faithful to CCNet's two-phase shape: the tier CUTOFFS are fitted
    once on a bounded sample (CCNet computes them from the perplexity
    distribution of one Common Crawl dump, then applies them as
    constants to every dump), and the corpus-wide assignment is a pure
    map-side comparison against the per-language cutoff row. The fit
    sample here is the deterministic stride ``id % sample_mod == 0``
    (the IVF quantizer-fit convention); ``sample_mod`` is the
    production dial — at 100 TB you raise it until the per-language
    rank fit is driver-trivial, and ONLY the fit pays the per-language
    sort. The apply side broadcasts the one-row-per-language cutoffs,
    so assignment adds zero shuffles beyond the scorer's own.

    Cutoff definition (integer-exact cross-engine): order the sample
    within each language by ``(avg_nll, id)``; ``c1`` = the avg_nll at
    rank ``ceil(n/3)`` (max of the first third), ``c2`` at
    ``ceil(2n/3)``. Rank predicates are the integer forms
    ``3*rn <= n+2`` / ``3*rn <= 2n+2`` — no float division anywhere.
    Bucket: head iff ``avg_nll <= c1``, else middle iff ``<= c2``,
    else tail; a language absent from the sample falls to tail (CASE
    over NULL cutoffs — same in both engines).

    Scorer: the corpus-trained add-one bigram LM of
    :func:`bigram_nll` (its rounded avg_nll is the ordering key, so
    ties resolve on the id). Documents with fewer than two words have
    no bigrams and are dropped by the scorer, as in doc_perplexity.

    Output: (id, lang, avg_nll, bucket).
    """
    from pyspark.sql import Window

    # persisted: both the cutoff fit and the assignment read it — without
    # this the corpus-sized LM scorer runs twice (minhash/graph convention;
    # exchange reuse does NOT kick in here because column pruning pushes
    # different projections into the two branches). Lifetime: keyed LRU
    # over (analyzed plan via sameResult, columns) — the same logical
    # input reuses the persisted scorer across invocations (including
    # interleaved builds), distinct inputs evict oldest-first past
    # _PPL_CACHE_MAX, and the lock makes concurrent plan builds on one
    # driver safe (r10 ADVICE; sample_mod is excluded from the key
    # because the scorer is mod-independent — only the downstream fit
    # stride differs).
    with _PPL_CACHE_LOCK:
        scored = _ppl_cache_lookup(docs, id_col, text_col, lang_col)
        if scored is None:
            scored = (
                bigram_nll(docs, id_col=id_col, text_col=text_col)
                .join(docs.select(F.col(id_col), F.col(lang_col)), id_col)
                .persist()
            )
            while len(_PPL_CACHES) >= _PPL_CACHE_MAX:
                try:
                    _PPL_CACHES.pop(0)[2].unpersist()
                except Exception:
                    # evicted entry built under a now-stopped session:
                    # the py4j unpersist raises — degrade to drop-only,
                    # same posture as _ppl_analyzed_plan (r11 ADVICE)
                    pass
            _PPL_CACHES.append(
                ((id_col, text_col, lang_col), _ppl_analyzed_plan(docs), scored)
            )
    samp = scored.where(F.col(id_col) % sample_mod == 0)
    wl = Window.partitionBy(lang_col).orderBy(
        F.col("avg_nll").asc(), F.col(id_col).asc()
    )
    ranked = samp.select(
        F.col(lang_col),
        F.col("avg_nll"),
        F.row_number().over(wl).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(lang_col)).alias("nn"),
    )
    cuts = ranked.groupBy(lang_col).agg(
        F.max(
            F.when(3 * F.col("rn") <= F.col("nn") + 2, F.col("avg_nll"))
        ).alias("c1"),
        F.max(
            F.when(3 * F.col("rn") <= 2 * F.col("nn") + 2, F.col("avg_nll"))
        ).alias("c2"),
    )
    return scored.join(F.broadcast(cuts), lang_col, "left").select(
        F.col(id_col),
        F.col(lang_col),
        F.col("avg_nll"),
        F.when(F.col("avg_nll") <= F.col("c1"), F.lit("head"))
        .when(F.col("avg_nll") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# corpus-frequency boilerplate removal (CCNet-style)
# ---------------------------------------------------------------------------


def boilerplate_strip(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 5,
    max_docs: int = 3,
) -> DataFrame:
    """Remove corpus-frequent chunks from EVERY document, then rebuild.

    The CCNet/RefinedWeb boilerplate pass: a chunk ("line" on a real
    corpus; a fixed ``chunk_words``-word window on this single-line
    fixture, same stand-in as paragraph_dedup) that occurs in more than
    ``max_docs`` DISTINCT documents is navigation/footer/template noise
    and is stripped from all of them — unlike paragraph_dedup, which
    keeps the first occurrence. Returns (id, n_chunks, n_kept,
    clean_digest) with clean_digest the md5 of the reconstruction from
    surviving chunks in document order.

    Scale shape (mirrors paragraph_dedup's audited one):

    1. hot-chunk detection is ``groupBy(chunk).count_distinct(doc)`` —
       partial aggregation combines map-side, so a chunk in half the
       corpus still reduces per map task before the exchange;
    2. the hot table has one row per distinct FREQUENT chunk (orders of
       magnitude smaller than the corpus); occurrences LEFT-join it on
       the chunk text — a hot boilerplate chunk is exactly the skew AQE
       skew-join splits, same as paragraph_dedup's winners join;
    3. reconstruction regroups per document, bounded by document length.
    """
    from cruncher_spark.operators.dedup import paragraph_table

    paras = paragraph_table(docs, id_col, text_col, chunk_words)
    hot = (
        paras.groupBy("para")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") > max_docs)
        .select("para", F.lit(True).alias("hot"))
    )
    flagged = paras.join(hot, "para", "left")
    kept = F.col("hot").isNull()
    # when() with no otherwise -> NULL for stripped rows; collect_list
    # skips NULLs, so only surviving chunks are gathered
    kept_struct = F.when(kept, F.struct("pos", "para"))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(kept.cast("int")).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["para"],
                ),
            )
        ).alias("clean_digest"),
    )


# ---------------------------------------------------------------------------
# vocabulary growth (Heaps'-law checkpoints)
# ---------------------------------------------------------------------------


def vocab_growth(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fractions: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 1.0),
) -> DataFrame:
    """Vocabulary size at document-id checkpoints — the Heaps'-law curve.

    Corpus-diversity analytics: how fast does the distinct-term count
    grow as the corpus grows? A flattening curve means new documents are
    re-treading existing vocabulary (template/boilerplate-heavy crawl); a
    near-linear one means high novelty. Checkpoints are
    ``floor(max(id) * f)`` for each fraction, so the SAME query shape
    works at every scale factor without data-dependent literals.

    Returns (cp, n_docs, vocab_size): documents with id <= cp and
    distinct terms FIRST SEEN at or before cp.

    Scale shape — the curve costs one corpus tokenize plus small aggs:

    - per-term first-seen is ``groupBy(term).min(id)`` (map-side
      combined, vocabulary-sized output);
    - each checkpoint count is a conditional aggregate over a
      broadcast-replicated |fractions|-row checkpoint table: the
      replicated rows collapse to |fractions| groups in the partial agg
      before any exchange, so no pass over the corpus is repeated and
      nothing is collected to the driver.
    """
    mx = docs.agg(F.max(F.col(id_col)).alias("mx"))
    cps = (
        mx.select(
            F.explode(F.array([F.lit(f) for f in fractions])).alias("f"), "mx"
        )
        .select(F.floor(F.col("mx") * F.col("f")).cast("long").alias("cp"))
        .distinct()
    )
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    first = toks.groupBy("term").agg(F.min(F.col(id_col)).alias("first_seen"))
    vocab = (
        first.crossJoin(F.broadcast(cps))
        .where(F.col("first_seen") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    ndocs = (
        docs.select(F.col(id_col))
        .crossJoin(F.broadcast(cps))
        .where(F.col(id_col) <= F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return ndocs.join(vocab, "cp")


# ---------------------------------------------------------------------------
# Zipf slope: log-log rank-frequency regression
# ---------------------------------------------------------------------------

#: exact accumulator for products of 9-decimal log coordinates
_ZIPF_DEC = "decimal(38,18)"


def zipf_slope(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Least-squares slope of ln(freq) vs ln(rank) over the vocabulary.

    The Zipf diagnostic next to :func:`vocab_growth`: natural corpora
    fit slope ~ -1; a much flatter slope flags synthetic/templated text,
    a much steeper one a degenerate vocabulary. Returns one row
    (n_terms, slope, intercept).

    Scale shape — no global single-partition window anywhere:

    - term frequencies are one map-side-combined corpus aggregate;
    - the global rank is built WITHOUT a total-order window over the
      vocabulary: the cumulative count of strictly-higher frequencies
      runs over the DISTINCT-frequency table (heavy-tailed corpora have
      far fewer distinct frequencies than terms — the one unpartitioned
      window here is bounded by that small table), then ties rank by a
      window PARTITIONED on the frequency;
    - the regression sums accumulate DECIMAL(38,18)-exact over rounded
      9-decimal log coordinates (order-independent, engine-portable),
      and the closed-form slope/intercept is one final double step.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    fc = tf.groupBy("f").agg(F.count(F.lit(1)).alias("nt"))
    higher = (
        F.sum("nt")
        .over(
            Window.orderBy(F.col("f").desc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
    )
    fc = fc.withColumn("higher", F.coalesce(higher, F.lit(0)))
    rank = F.col("higher") + F.row_number().over(
        Window.partitionBy("f").orderBy("term")
    )
    xy = (
        tf.join(fc.select("f", "higher"), "f")
        .withColumn("r", rank)
        .select(
            F.round(F.log(F.col("r").cast("double")), 9).alias("x"),
            F.round(F.log(F.col("f").cast("double")), 9).alias("y"),
        )
    )
    sums = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(_ZIPF_DEC)).alias("sx"),
        F.sum(F.col("y").cast(_ZIPF_DEC)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(_ZIPF_DEC)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(_ZIPF_DEC)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - F.round(slope, 6) * sx) / n, 6).alias("intercept"),
    )


def weighted_sample_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "wres",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per key —
    Efraimidis-Spirakis A-Res with the hash standing in for randomness.

    Each row draws the deterministic uniform
    ``u = (portable_hash64(id, salt) % D + 1) / (D + 1)`` and ranks by
    the exponential key ``-ln(u) / w`` ascending (the strictly monotone
    equivalent of A-Res's ``u^(1/w)`` descending, chosen because it does
    not compress toward 1.0 for large weights); the k smallest win. The
    inclusion law is exactly weighted sampling without replacement —
    P(row first) = w_i / sum(w) — yet the draw is a pure function of the
    row, so the sample reproduces across runs, partitionings, and
    engines (the same property :func:`reservoir_per_key` gives the
    unweighted case).

    Sort keys round to 9 decimals before ranking (ln is not
    correctly-rounded across libms; the logreg gates pin this discipline
    at 9 for exp) with the id as tie-break, so cross-engine ordering is
    exact. Scale shape: identical to reservoir_per_key — one shuffle +
    per-key partition sort; the same two-phase bucket fallback applies
    if one key dominates (rank within (key, bucket) first, then re-rank
    the <= B*k survivors).

    Weights must be positive; rows with NULL or non-positive weight are
    excluded (they have zero inclusion probability).
    """
    from pyspark.sql import Window

    d = SAMPLE_DENOM * 100  # 1e6: finer than the rate grid, same family
    u = (
        (portable_hash64(F.col(id_col).cast("string"), salt) % d + 1)
        / F.lit(float(d + 1))
    )
    skey = F.round(-F.log(u) / F.col(weight_col), 9)
    w = Window.partitionBy(key_col).orderBy(skey.asc(), F.col(id_col))
    return (
        df.where(F.col(weight_col) > 0)
        .select(F.col(key_col), F.col(id_col), F.col(weight_col))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = ("the", "a", "of"),
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_distinct_stopwords: int = 2,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, table A1's
    heuristic filters) as ONE map-side projection — the composite gate a
    crawl-curation pass runs on every document before the expensive
    dedup/classifier tiers:

    - word count within ``[min_words, max_words]``;
    - mean word length within ``[min_mean_word_len, max_mean_word_len]``
      (kills character-soup and concatenated-token pages);
    - fraction of words containing an alphabetic character >=
      ``min_alpha_frac`` (kills symbol/number tables);
    - at least ``min_distinct_stopwords`` DISTINCT stopwords present
      (the "real prose" signal — machine-generated keyword stuffing
      rarely carries function words).

    Scale shape: pure whole-stage-codegen expressions over one corpus
    scan — zero shuffle, zero Python, trivially 100 TB-safe; the output
    is the per-document flag table downstream stages semi-join against.

    Output: (id, n_words, mean_word_len, alpha_frac, n_stop_distinct,
    kept) with ratios rounded to 6 digits for cross-engine stability.
    """
    w = F.split(F.trim(F.col(text_col)), " ")
    n_words = F.size(w).cast("long")
    sum_len = F.aggregate(
        w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    mean_wl = F.round(sum_len.cast("double") / n_words, 6)
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n_words,
        6,
    )
    stop = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.array_intersect(F.array_distinct(w), stop)).cast("long")
    out = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stop_distinct"),
    )
    kept = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("n_stop_distinct") >= min_distinct_stopwords)
    )
    return out.withColumn("kept", kept)


# ---------------------------------------------------------------------------
# DSIR: hashed n-gram importance resampling (target-domain data selection)
# ---------------------------------------------------------------------------


def dsir_importance(
    docs: DataFrame,
    target_flag: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how much more likely its hashed unigram+
    bigram bag is under the TARGET-domain feature distribution than
    under the raw-corpus one — the published recipe for selecting
    pretraining data that "looks like" a small high-quality target set.

    Model (both engines bit-identical): features are the 60-bit
    portable hash of each unigram (salt ``dsir_u``) and each positional
    bigram (salt ``dsir_b``) taken mod ``n_buckets`` — DSIR's hashed
    generative model, so the parameter table is B-bounded regardless of
    vocabulary. With add-one smoothing over the B buckets,
    ``lambda(f) = round(ln((ct+1)/(Tt+B)) - ln((cr+1)/(Tr+B)), 6)`` as
    DECIMAL(18,6) (ct/cr = target/corpus counts of f, Tt/Tr totals);
    the per-doc log importance weight is the EXACT decimal sum of
    multiplicity * lambda — order-independent, so no float-accumulation
    drift across engines (the bigram_nll discipline), and no mean/div
    rounding tail at all since DSIR uses the sum.

    Scale shape (the bigram_nll lesson): the feature explode feeds one
    corpus-sized map-side-combined groupBy on (doc, flag, f); every
    model table after that is B-bounded — cr/ct aggregate to <= B rows,
    totals are one-row aggregates, and the lambda table BROADCASTS into
    the per-doc attach, so the smoothing denominators and the ratio
    model never re-shuffle the corpus. ``target_flag`` is any
    deterministic predicate column over ``docs`` (a domain label, a
    hand-curated id set, a quality tier).

    Output: (id, n_feats, log_weight double, selected bool) — selected
    is ``log_weight > 0`` (more target-like than corpus-like), the
    DSIR drop-list shape; resample instead by ranking on log_weight.
    Documents with zero words contribute no features and drop out (a
    length filter owns those).
    """
    from cruncher_spark.functions.text import portable_hash64, words

    B = n_buckets
    w = words(text_col)
    base = docs.select(
        F.col(id_col), target_flag.alias("__tgt__"), w.alias("wl")
    )
    uni = base.select(
        F.col(id_col), "__tgt__", F.explode("wl").alias("tok")
    ).select(
        F.col(id_col),
        "__tgt__",
        F.pmod(portable_hash64(F.col("tok"), "dsir_u"), F.lit(B)).alias("f"),
    )
    big = (
        base.where(F.size("wl") >= 2)
        .select(
            F.col(id_col),
            "__tgt__",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("wl") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("wl"), i),
                        F.element_at(F.col("wl"), i + 1),
                    ),
                )
            ).alias("g"),
        )
        .select(
            F.col(id_col),
            "__tgt__",
            F.pmod(portable_hash64(F.col("g"), "dsir_b"), F.lit(B)).alias(
                "f"
            ),
        )
    )
    feats = (
        uni.unionByName(big)
        .groupBy(id_col, "__tgt__", "f")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    # ONE f-keyed aggregation carries both distributions (target count
    # as a conditional sum) — a separate filtered ct branch would
    # re-derive the corpus-sized feature subtree a third time
    model = feats.groupBy("f").agg(
        F.sum("m").alias("cr"),
        F.sum(
            F.when(F.col("__tgt__"), F.col("m")).otherwise(F.lit(0))
        ).alias("ct"),
    )
    totals = model.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    lam = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "f",
            F.round(
                F.log((F.col("ct") + 1) / (F.col("tt") + B))
                - F.log((F.col("cr") + 1) / (F.col("tr") + B)),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lam"),
        )
    )
    return (
        feats.join(F.broadcast(lam), "f")
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_feats"),
            F.sum(F.col("m") * F.col("lam")).alias("lw"),
        )
        .select(
            F.col(id_col),
            "n_feats",
            F.col("lw").cast("double").alias("log_weight"),
            (F.col("lw") > 0).alias("selected"),
        )
    )
