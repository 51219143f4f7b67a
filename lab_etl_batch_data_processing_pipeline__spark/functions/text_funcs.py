"""Text Column-expression builders (documents.text and friends).

All built-in expressions (split / filter / size / regexp) — JVM-side,
codegen-friendly, no UDFs. These are the building blocks for the
text-analysis and dedup operators; each returns a Column so they compose
inside a single projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties removed (leading/trailing-space safe)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    words = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens(F.lower(text)), lambda x: F.array_contains(words, x)))


def punct_count(text: Column) -> Column:
    """Count of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
