"""Text-analysis column expressions for the training-data pipeline.

All pure built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen —
no Python in the hot path), each with a documented DuckDB-SQL mirror so every
operator stays oracle-checkable. Beyond-reference surface (the reference has
no text ops); designed for 100 TB document tables: every expression is a
narrow per-row projection, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish tokenizer regex: word pieces or single non-space punctuation.
TOKEN_REGEX = r"\w+|[^\w\s]"

#: tiny per-language discriminative word lists for the n-gram language-ID
#: heuristic (word, lang, weight). Deliberately small and editable; at scale
#: this dim is broadcast.
LANG_DICT: list[tuple[str, str, int]] = [
    ("the", "en", 2), ("a", "en", 1), ("fast", "en", 1),
    ("le", "fr", 2), ("la", "fr", 2), ("et", "fr", 1),
    ("el", "es", 2), ("los", "es", 2), ("y", "es", 1),
    ("der", "de", 2), ("und", "de", 2), ("das", "de", 1),
    ("of", "zh", 1), ("big", "zh", 1),  # placeholder row set; dim is data-driven
]


def words(col: str | Column) -> Column:
    """Whitespace word split. DuckDB mirror: ``string_split(text, ' ')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column.

    DuckDB mirror::

        SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2]
        FROM (SELECT doc_id, string_split(text,' ') w FROM docs),
             unnest(range(1, len(w)-1)) t(g)

    Guarded for texts with fewer than ``n`` words (empty array, matching the
    empty ``range``).
    """
    w = words(col)
    size = F.size(w)
    idx = F.sequence(F.lit(1), size - (n - 1))  # 1-based start positions
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))
    return F.when(size >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def portable_hash64(col: str | Column, salt: str = "") -> Column:
    """Deterministic 60-bit integer hash reproducible in any SQL engine.

    ``conv(substr(md5(s || '#salt'), 1, 15), 16, 10)`` — DuckDB mirror:
    ``CAST('0x' || substr(md5(s || '#salt'), 1, 15) AS BIGINT)``.

    md5 is ~3x slower than xxhash64 but cross-engine reproducible, which the
    correctness gate needs; production MinHash at 100 TB should swap in
    ``F.xxhash64`` (same call shape, engine-local).
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(c, F.lit(f"#{salt}")) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def token_count(col: str | Column) -> Column:
    """BPE-ish token count. DuckDB: ``len(regexp_extract_all(text, pat))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def n_words(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def stopword_ratio(col: str | Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of words in the stopword list (quality-scoring feature).

    DuckDB mirror uses ``list_filter``/``len`` over the same split.
    """
    w = F.split(F.trim(F.col(col) if isinstance(col, str) else col), r"\s+")
    stop = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop, x)))
    return (n_stop.cast("double") / F.size(w)).alias("stopword_ratio")


#: PII detection patterns — one regex dialect for both engines (Java regex
#: and DuckDB's RE2 both support \b, \d, bounded repetition; POSIX classes
#: deliberately avoided, cf. the build-regex dialect trap in
#: functions/scalars.posix_to_java_regex).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_REPLACEMENT = "<PII>"


def pii_counts(col: str | Column) -> list[Column]:
    """Per-row match counts for each PII pattern (JVM ``regexp_count``,
    whole-stage codegen). DuckDB mirror: ``len(regexp_extract_all(c, pat))``."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def pii_redact(col: str | Column) -> Column:
    """Replace every PII match with a fixed placeholder token.

    Spark ``regexp_replace`` is replace-all; the DuckDB mirror needs the
    explicit ``'g'`` flag (``regexp_replace(c, pat, rep, 'g')``) or it
    replaces only the first match per row.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, PII_REPLACEMENT)
    return c


def doc_fingerprint(col: str | Column) -> Column:
    """Canonical content fingerprint: md5 of the sorted distinct word set.

    Near-dup resilient to word order/repetition; DuckDB mirror:
    ``md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' '))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(c, " ")))))


def html_to_text(col: str | Column) -> Column:
    """Crude-but-JVM-side HTML → text extraction for crawl payloads.

    Four whole-stage-codegen ``regexp_replace`` passes: drop
    ``<script>``/``<style>`` blocks (their text is never content),
    strip remaining tags, decode the half-dozen entities that dominate
    real pages, collapse whitespace. This is the cheap extraction tier
    (CCNet-style pipelines run exactly this class of strip before
    language-ID and quality gating); DOM-accurate readability
    extraction is a Pandas-UDF tier a deployment can slot behind the
    same column contract. Case-insensitive via inline ``(?i)`` flags;
    ``(?s)`` lets blocks span lines.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
        ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
    ):
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))
