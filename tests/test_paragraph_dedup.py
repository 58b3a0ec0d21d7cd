"""Paragraph-level dedup: first-occurrence semantics, reconstruction order,
within-document repeats, empty-document guard."""

from __future__ import annotations

import hashlib

from cruncher_spark.operators.dedup import paragraph_dedup, paragraph_table


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_paragraph_table_orders_and_chunks(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    rows = paragraph_table(docs, chunk_words=10).orderBy("pos").collect()
    assert [(r["pos"], r["para"]) for r in rows] == [
        (0, "a b c d e f g h i j"),
        (1, "k l"),
    ]


def test_first_occurrence_wins_and_reconstruction(spark):
    # doc 1 owns both paragraphs; doc 2 repeats doc 1's first paragraph
    # then adds its own — only the repeat is dropped
    p1, p2, p3 = "a b", "c d", "e f"
    docs = spark.createDataFrame(
        [(1, f"{p1} {p2}"[:100]), (2, f"{p1} {p3}")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, chunk_words=2).collect()
    }
    assert got[1]["n_kept"] == 2
    assert got[1]["clean_digest"] == _md5(f"{p1} {p2}")
    assert got[2]["n_paras"] == 2 and got[2]["n_kept"] == 1
    assert got[2]["clean_digest"] == _md5(p3)


def test_within_document_repeat_kept_once(spark):
    docs = spark.createDataFrame(
        [(7, "x y x y z z")], "doc_id long, text string"
    )
    got = paragraph_dedup(docs, chunk_words=2).collect()[0]
    # "x y" repeats inside the same doc; second copy dropped, "z z" kept
    assert got["n_paras"] == 3 and got["n_kept"] == 2
    assert got["clean_digest"] == _md5("x y z z")


def test_fully_duplicated_document_hashes_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs, chunk_words=2).collect()}
    assert got[2]["n_kept"] == 0
    assert got[2]["clean_digest"] == _md5("")


def test_empty_and_trailing_whitespace_chunks_match_fixed_window(spark):
    """Dirty-input contract (r11 ADVICE medium): the chunker emits
    EXACTLY ceil(words/chunk_words) rows with pos = window index — an
    empty-text doc tokenizes to [''] and owns one empty paragraph, a
    trailing-whitespace doc whose remainder window is the lone empty
    token owns that empty paragraph at its real pos, and an exact
    multiple of chunk_words emits NO trailing artifact row. The old
    blanket p != '' filter dropped the first two rows entirely (and
    with chunk_words=1 renumbered every pos after an interior empty
    token) while the DuckDB oracle kept them."""
    docs = spark.createDataFrame(
        [
            (1, ""),                         # [''] -> one empty para
            (2, "a b c d e f g h i j "),     # 11 tokens, remainder ['']
            (3, "a b c d e f g h i j"),      # exact multiple: no artifact
        ],
        "doc_id long, text string",
    )
    rows = paragraph_table(docs, chunk_words=10).collect()
    got = {(r["doc_id"], r["pos"]): r["para"] for r in rows}
    assert got == {
        (1, 0): "",
        (2, 0): "a b c d e f g h i j",
        (2, 1): "",
        (3, 0): "a b c d e f g h i j",
    }


def test_interior_empty_token_keeps_pos_numbering(spark):
    # chunk_words=1 over consecutive spaces: the interior empty token is
    # a paragraph of its own and every later pos stays window-aligned
    docs = spark.createDataFrame([(5, "x  y")], "doc_id long, text string")
    rows = paragraph_table(docs, chunk_words=1).orderBy("pos").collect()
    assert [(r["pos"], r["para"]) for r in rows] == [(0, "x"), (1, ""), (2, "y")]


def test_paragraph_dedup_dirty_corpus_matches_duckdb_oracle(spark):
    """Bit-parity with the registered DuckDB oracle on a corpus the
    fixtures never exercise: empty texts, trailing whitespace, interior
    runs of spaces, and exact chunk multiples. This pins the divergence
    class the r11 ADVICE named — the oracle's fixed-window chunker and
    the Spark chunker must agree on EMPTY paragraphs, not just clean
    ones."""
    import duckdb
    import pandas as pd

    from cruncher_spark.plans.registry import QUERIES, _load_all

    _load_all()

    data = [
        (1, ""),
        (2, "a b c d e f g h i j "),
        (3, " ".join(f"w{i}" for i in range(25)) + "  tail"),
        (4, "a b c d e f g h i j"),
        (5, "a b c d e f g h i j "),  # dup of doc 2's content
    ]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_digest"])
        for r in paragraph_dedup(docs, chunk_words=10).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(data, columns=["doc_id", "text"])
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(QUERIES["paragraph_dedup"].oracle).fetchall()
    }
    assert got == want
    """The retired doc*100000+pos packing (and the chunk-time truncation
    that kept it sound) mis-handled documents with more paragraphs than
    the bound: tail paragraphs were silently dropped, so a duplicate
    whose FIRST occurrence sat past the bound picked the wrong winner.
    With the (doc, pos) struct key (r11, the r10 span-removal fix
    class) a 100,005-paragraph document keeps every paragraph and owns
    the duplicate its tail introduced."""
    words = [f"w{i}" for i in range(100_004)] + ["dup"]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "dup x y")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in paragraph_dedup(docs, chunk_words=1).collect()
    }
    # no truncation: all 100,005 one-word paragraphs survive in doc 1
    assert got[1]["n_paras"] == 100_005 and got[1]["n_kept"] == 100_005
    # the winner of "dup" is (1, 100004) < (2, 0): doc 2's copy drops —
    # under the old truncation pos 100004 never existed and doc 2
    # wrongly kept it
    assert got[2]["n_paras"] == 3 and got[2]["n_kept"] == 2
    assert got[2]["clean_digest"] == _md5("x y")
