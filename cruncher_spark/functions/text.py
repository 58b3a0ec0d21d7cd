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


#: query parameters stripped by URL canonicalization: click/campaign
#: trackers that vary per impression while the landing page is identical —
#: the crawl-frontier dedup would otherwise keep one copy per campaign.
#: No backslashes anywhere in the URL patterns (deliberate): Spark SQL
#: string literals eat unrecognized escapes while DuckDB keeps them, so
#: `[.]`-style classes are the only form whose text is dialect-identical.
URL_TRACKER_PATTERN = "^(utm_[^=]*|gclid|fbclid|msclkid)(=|$)"

_URL_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_URL_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def canonicalize_url_sql(url: str, dialect: str) -> str:
    """ONE canonicalization expression rendered for either engine — the
    :func:`cruncher_spark.operators.similarity.pq_code_sql` pattern: the
    Spark plan and the DuckDB oracle evaluate textually-derived-identical
    logic, so canonical forms cannot drift between the gate's two sides.

    Steps (the classic crawl-frontier normalization, RFC 3986 §6 plus the
    tracker strip every CommonCrawl-scale pipeline applies before URL
    dedup): lowercase scheme+authority, drop userinfo, strip a leading
    ``www.`` label and a trailing root dot, drop the scheme's default
    port (:80/:443), collapse duplicate path slashes, strip one trailing
    slash (root stays ``/``; empty path becomes ``/``), drop the
    fragment, drop tracker params (:data:`URL_TRACKER_PATTERN`), sort
    the surviving query params byte-wise. Non-absolute inputs (no
    ``scheme://`` or empty host) canonicalize to NULL — the caller's
    quarantine signal, mirroring read_warc's parse_error rows.

    Pure string expressions (regexp/split/sort/join) — whole-stage
    codegen on Spark, zero Python, zero shuffle; dot-segment (``/../``)
    resolution and %-encoding normalization are deliberately out of
    scope (crawlers emit resolved absolute URLs; documented contract).
    """
    d = {
        "spark": {
            "split": "split",
            "lsort": "array_sort",
            "ljoin": "array_join",
            "lfilter": "filter",
            "rmatch": "{x} RLIKE '{p}'",
            "greplace": "regexp_replace({x}, '{p}', '{r}')",
        },
        "duckdb": {
            "split": "string_split",
            "lsort": "list_sort",
            "ljoin": "array_to_string",
            "lfilter": "list_filter",
            "rmatch": "regexp_matches({x}, '{p}')",
            "greplace": "regexp_replace({x}, '{p}', '{r}', 'g')",
        },
    }[dialect]

    def rep(x: str, p: str, r: str) -> str:
        return d["greplace"].format(x=x, p=p, r=r)

    scheme = f"lower(regexp_extract({url}, '{_URL_SCHEME_RE}', 1))"
    host = f"lower(regexp_extract({url}, '{_URL_HOST_RE}', 1))"
    host = rep(host, "^[^@]*@", "")  # userinfo
    # default-port strip FIRST: the port trails the host, so a root-dot
    # host ('example.com.:443') only exposes its trailing dot once the
    # port is gone (first cut of this expression stripped the dot first
    # and left 'example.com.' — caught by the dual-engine probe)
    host = (
        f"CASE WHEN {scheme} = 'http' THEN {rep(host, ':80$', '')} "
        f"WHEN {scheme} = 'https' THEN {rep(host, ':443$', '')} "
        f"ELSE {host} END"
    )
    host = rep(host, "[.]$", "")
    host = rep(host, "^www[.]", "")
    path = f"regexp_extract({url}, '{_URL_PATH_RE}', 1)"
    path = rep(path, "/{2,}", "/")
    path = rep(path, "/$", "")
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    # anchored: the first '?' counts only if it precedes the first '#' —
    # an unanchored '[?]' scanned the WHOLE URL, so a '?' inside the
    # fragment ('/page#a?b=1', hash-router URLs) leaked fragment content
    # into the canonical query and collided with genuinely distinct URLs
    # (ADVICE r8 high; '#-before-?' cases pinned in tests/test_url_canon.py)
    query = f"regexp_extract({url}, '^[^#?]*[?]([^#]*)', 1)"
    keep = d["rmatch"].format(x="p", p=URL_TRACKER_PATTERN)
    params = (
        f"{d['lfilter']}({d['split']}({query}, '&'), "
        f"p -> p <> '' AND NOT ({keep}))"
    )
    # COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — without it every query-less URL canonicalized
    # to NULL on the oracle side only (caught by the dual-engine probe)
    qs = f"coalesce({d['ljoin']}({d['lsort']}({params}), '&'), '')"
    return (
        f"CASE WHEN {scheme} = '' OR {host} = '' THEN NULL "
        f"ELSE {scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END) END"
    )


def canonicalize_url(col: str | Column) -> Column:
    """Canonical URL column (see :func:`canonicalize_url_sql`); accepts a
    column NAME only — the expression is rendered as SQL text, so an
    arbitrary Column object has no stable name to splice in."""
    if not isinstance(col, str):
        raise TypeError("canonicalize_url takes a column name (str)")
    if "`" in col:
        raise ValueError(f"column name must not contain backticks: {col!r}")
    return F.expr(canonicalize_url_sql(f"`{col}`", "spark"))


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
