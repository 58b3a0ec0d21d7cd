"""Distributed BPE tokenizer training and application.

The missing piece between corpus curation and token counting: LEARN the
subword vocabulary from the corpus itself (Sennrich et al. 2016, the
byte-pair-encoding scheme GPT/Llama-family tokenizers descend from), then
tokenize with it.

Scale shape — the part that matters at 100 TB: BPE learning never
iterates over the corpus. One corpus-sized shuffle builds the WORD
FREQUENCY table (distinct words + counts — vocabulary-sized, bounded by
language, not data volume); every one of the K merge rounds then runs on
that vocab-sized table — driver-side when it fits under
``driver_vocab_cap`` (the bounded-collect fit pattern), distributed above
it: explode adjacent symbol pairs weighted by word
count, one map-side-combined aggregate, and a single-ROW driver collect
of the argmax pair (count desc, pair lexicographic — pinned so learning
is deterministic under any partitioning). Applying the chosen merge
rewrites the symbol arrays with one Arrow-batched pandas UDF pass over
the vocab table (greedy leftmost, the classic sequential-scan semantics
no built-in array function expresses); each round localCheckpoints the
small table so lineage stays flat across rounds, exactly the pagerank
discipline.

Tokenization (:func:`bpe_tokenize`) replays the learned merge list per
word — corpus-sized but embarrassingly parallel (mapInPandas, zero
shuffles), with the merge list broadcast by closure.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel, kept out of any plausible corpus alphabet
EOW = "</w>"


def word_freq_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) over whitespace words — the ONLY corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_once(symbols: list[str], a: str, b: str) -> list[str]:
    """Greedy leftmost application of one merge to one symbol list."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _learn_from_counts(
    counts: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Sequential merge learning over an aggregated word-count table —
    the driver-side fit path (same argmax/tie-break/stop rule as the
    distributed loop; tests pin the two paths equal)."""
    vocab = {tuple(list(w) + [EOW]): n for w, n in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {tuple(_merge_once(list(s), a, b)): n for s, n in vocab.items()}
    return merges


def learn_bpe_merges(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    driver_vocab_cap: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus (module docstring
    has the scale analysis). Returns the ordered merge list.

    When the aggregated vocabulary fits under ``driver_vocab_cap`` rows,
    the K merge rounds run driver-side over the collected (word, count)
    table — the bounded-collect fit pattern the IVF centroid trainer
    uses, and how production tokenizer trainers work (the corpus-sized
    COUNTING is distributed; merge selection runs on the aggregate,
    which natural language bounds at millions of rows regardless of
    corpus bytes). Over the cap, every round runs distributed
    (pair-explode aggregate + single-row argmax collect + one pandas-UDF
    rewrite of the vocab table); ``driver_vocab_cap=0`` forces that
    path, which the tests pin equal to the driver fit.
    """
    from pyspark.sql.types import ArrayType, StringType

    wf = word_freq_table(docs, text_col)
    if driver_vocab_cap > 0:
        head = wf.limit(driver_vocab_cap + 1).collect()
        if len(head) <= driver_vocab_cap:
            return _learn_from_counts(((r.word, r.n) for r in head), num_merges)

    vocab = wf.select(
        F.concat(
            F.split(F.col("word"), "(?!$)"), F.array(F.lit(EOW))
        ).alias("syms"),
        "n",
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        adjacent = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + 1).alias("b"),
            ),
        )
        pairs = vocab.select(
            F.explode(
                # guard: a fully-merged single-symbol word has no pairs
                # (sequence(1, 0) would count DOWN in Spark)
                F.when(F.size("syms") >= 2, adjacent).otherwise(
                    F.array().cast("array<struct<a:string,b:string>>")
                )
            ).alias("p"),
            "n",
        ).groupBy("p.a", "p.b").agg(F.sum("n").alias("c"))
        top = pairs.orderBy(
            F.col("c").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not top or top[0].c < 2:
            break  # nothing left to merge
        a, b = top[0].a, top[0].b
        merges.append((a, b))

        @F.pandas_udf(ArrayType(StringType()))
        def apply_merge(col: pd.Series) -> pd.Series:
            return col.map(lambda s: _merge_once(list(s), a, b))

        vocab = vocab.select(
            apply_merge("syms").alias("syms"), "n"
        ).localCheckpoint()
    return merges


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>) — replay the merge list per word.

    Zero shuffles: mapInPandas over whatever partitioning the input has,
    with a per-batch word→tokens memo (real corpora repeat words heavily,
    so each distinct word is segmented once per Arrow batch)."""
    out_schema = f"{id_col} long, tokens array<string>"
    ranks = {pair: i for i, pair in enumerate(merges)}

    def segment(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is None:
            syms = list(word) + [EOW]
            while len(syms) > 1:
                best = min(
                    (
                        (ranks[(syms[i], syms[i + 1])], i)
                        for i in range(len(syms) - 1)
                        if (syms[i], syms[i + 1]) in ranks
                    ),
                    default=None,
                )
                if best is None:
                    break
                a, b = merges[best[0]]
                syms = _merge_once(syms, a, b)
            got = memo[word] = syms
        return got

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = pdf[text_col].map(
                lambda t: [
                    s
                    for w in t.split()
                    for s in segment(w, memo)
                ]
            )
            yield pd.DataFrame({id_col: pdf[id_col], "tokens": toks})

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)
