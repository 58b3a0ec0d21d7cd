"""Property tests for the SQL front-end's lexical layer.

The translation rests on three primitives — top-level splitting,
top-level keyword search, and literal rendering. Each gets a generative
test; literal escaping is verified against the ENGINE (Spark parses the
rendered literal back to the original string), not against our own
expectations.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cruncher_spark import sqlfront

# fragments with balanced parens; commas allowed only inside parens.
# Quotes appear only as BALANCED literals: since the round-5 quote-aware
# lexer (ADVICE r4), an unbalanced quote legitimately swallows the rest
# of the text as a string literal — valid SQL always balances them.
_plain = st.text(
    alphabet=string.ascii_letters + string.digits + " .=<>", min_size=1, max_size=8
)
_atom = st.one_of(
    _plain,
    # quoted literal with nasty contents: commas, parens, keywords
    st.text(
        alphabet=string.ascii_letters + " ,()", min_size=0, max_size=8
    ).map(lambda s: f"'{s}'"),
)
_fragment = st.one_of(
    _atom,
    st.tuples(_atom, _atom).map(lambda t: f"f({t[0]},{t[1]})"),
    st.tuples(_atom, _atom).map(lambda t: f"({t[0]},({t[1]}))"),
)


@given(st.lists(_fragment, min_size=1, max_size=6))
def test_split_top_round_trips(frags):
    joined = ",".join(frags)
    assert sqlfront._split_top(joined) == [f.strip() for f in frags if f.strip()]


@given(_atom, _atom)
def test_find_top_ignores_parenthesized_keywords(pre, post):
    s = f"{pre} (select x from t) where {post}"
    ix = sqlfront._find_top(s, r"\bwhere\b")
    assert s[ix:ix + 5] == "where"
    assert sqlfront._find_top(s, r"\bfrom\b") == -1  # only inside parens


@settings(max_examples=30, deadline=None)
@given(
    st.text(
        alphabet=string.printable,
        min_size=0,
        max_size=30,
    ).filter(lambda s: "[[:" not in s)
)
def test_literal_escaping_round_trips_through_spark(spark, s):
    """Spark must parse the rendered literal back to the exact string —
    the engine is the oracle for the escaping rules (the '[\\d]'→'[d]'
    bug class)."""
    row = spark.sql(f"select {sqlfront._lit(s)} as x").collect()[0]
    assert row.x == s
