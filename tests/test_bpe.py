"""BPE learning/tokenization vs the classic sequential reference
(Sennrich et al. 2016 algorithm, pure python)."""

from __future__ import annotations

from collections import Counter

import pytest

from cruncher_spark.operators.bpe import (
    EOW,
    _merge_once,
    bpe_tokenize,
    learn_bpe_merges,
)

CORPUS = [
    (1, "low low low lower lower lowest"),
    (2, "new newer newer newest newest newest"),
    (3, "wide wider widest low new"),
    (4, "slow slower slowest low lower"),
]


def _ref_learn(texts: list[str], k: int) -> list[tuple[str, str]]:
    counts = Counter(w for t in texts for w in t.split())
    vocab = {tuple(list(w) + [EOW]): n for w, n in counts.items()}
    merges = []
    for _ in range(k):
        stats: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {
            tuple(_merge_once(list(s), a, b)): n for s, n in vocab.items()
        }
    return merges


def _ref_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        a, b = merges[min(cands)[0]]
        syms = _merge_once(syms, a, b)
    return syms


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_learned_merges_match_sequential_reference(corpus_df):
    k = 12
    got = learn_bpe_merges(corpus_df, k)
    assert got == _ref_learn([t for _, t in CORPUS], k)
    assert len(got) == k  # corpus is rich enough to fill all rounds


def test_learning_is_partitioning_invariant(corpus_df):
    # driver_vocab_cap=0 forces the DISTRIBUTED round loop
    k = 6
    a = learn_bpe_merges(corpus_df.repartition(7), k, driver_vocab_cap=0)
    b = learn_bpe_merges(corpus_df.coalesce(1), k, driver_vocab_cap=0)
    assert a == b


def test_driver_fit_equals_distributed_loop(corpus_df):
    k = 10
    assert learn_bpe_merges(corpus_df, k) == learn_bpe_merges(
        corpus_df, k, driver_vocab_cap=0
    )


def test_tokenize_matches_reference_and_reconstructs(corpus_df):
    merges = learn_bpe_merges(corpus_df, 8)
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_tokenize(corpus_df, merges).collect()
    }
    for doc_id, text in CORPUS:
        expect = [s for w in text.split() for s in _ref_segment(w, merges)]
        assert got[doc_id] == expect, doc_id
        # lossless: concatenation reconstructs the text
        assert "".join(got[doc_id]).replace(EOW, " ").strip() == text


def test_learning_stops_when_nothing_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every adjacent pair occurs once -> max count 1 -> no merges
    assert learn_bpe_merges(df, 5) == []
