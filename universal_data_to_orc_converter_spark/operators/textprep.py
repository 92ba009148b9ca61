"""Shared text-preparation column expressions (tokens, shingles).

Used by the dedup and text-analysis operators. Everything here is a
built-in higher-order function over arrays — JVM-side, no Python UDFs —
so shingling 100 TB of documents is a narrow map stage with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Lowercased SPACE-split tokens, empty strings dropped.

    Split on the literal space, not ``\\s+``: every DuckDB oracle
    tokenizes with ``string_split(lower(text), ' ')`` and half the
    text ops inline the same literal-space split — the old regex
    variant was a SECOND tokenizer that diverged on tabs/newlines
    (review finding; fixture text is single-space so all current
    hashes are unchanged, but a raw-text corpus would have split the
    engines). Runs of spaces produce empty strings on both engines
    and the filter drops them identically."""
    return F.filter(F.split(F.lower(col), " "), lambda x: x != "")


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Documents shorter than ``n``
    tokens collapse to a single whole-document shingle."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            F.array(F.concat_ws(" ", toks))
        )
    )
