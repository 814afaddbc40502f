"""Text-analysis expressions for the training-data-pipeline operators.

All pure Catalyst column expressions (JVM-side, codegen'd) — no Python
UDFs. Designed so each has an exact ANSI-SQL equivalent runnable by the
DuckDB oracle (see __spark_entry__.oracle_sql), which constrains us to
portable primitives: md5, regexp, arithmetic.

``stable_hash60`` is the cross-engine hash backbone: Spark's xxhash64
and DuckDB's hash() disagree, but md5 is identical everywhere, so we
derive a 60-bit integer from the first 15 hex chars of md5. At scale
md5 is ~2× slower than xxhash64 but still JVM-side and vectorized;
swap for xxhash64 in production where cross-engine parity is not
needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword list for the language-ID / quality heuristics.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "for"]


def norm_text(text: Column) -> Column:
    """Canonical text form: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens (regexp_count of \\S+)."""
    return F.regexp_count(text, F.lit(r"\S+")).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not word chars or whitespace."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(text: Column, stopwords: list[str] | None = None) -> Column:
    """Count of stopword occurrences (word-boundary matches)."""
    words = stopwords or STOPWORDS_EN
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat)).cast("long")


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    The exact-dedup backbone (generalizes reference A1 dropDuplicates,
    01_ingest_gtfs.py:160 etc., to content-addressed dedup).
    """
    return F.md5(norm_text(text))


def stable_hash60(s: Column) -> Column:
    """Cross-engine-stable 60-bit non-negative integer hash of a string.

    first 15 hex chars of md5 → bigint. DuckDB equivalent:
    ``('0x' || substr(md5(s),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined) over normalized text.

    Built with sequence+transform over the token array — stays JVM-side.
    Returns distinct shingles (set semantics, as MinHash/Jaccard need).

    PERFORMANCE HAZARD: the transform lambda closes over the split()
    expression, which Catalyst inlines and re-evaluates per shingle
    index — O(tokens²) per document. For bulk pipelines materialize the
    token array as a projection column first (see
    queries_text._shingle_table); this convenience form is fine for
    small/ad-hoc use.
    """
    toks = F.split(norm_text(text), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]),
    )
    # A doc shorter than k tokens yields its whole text as one shingle.
    return F.when(n >= k, F.array_distinct(sh)).otherwise(F.array(norm_text(text)))
