"""Shared text-preparation column expressions (tokens, shingles).

Used by the dedup and text-analysis operators. Everything here is a
built-in higher-order function over arrays — JVM-side, no Python UDFs —
so shingling 100 TB of documents is a narrow map stage with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empty strings dropped."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


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
