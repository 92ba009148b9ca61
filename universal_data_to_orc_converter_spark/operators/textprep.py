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


def let(value: Column, body) -> Column:
    """Bind ``value`` ONCE and reference it via a lambda variable:
    ``let(expensive, lambda v: f(v))`` builds
    ``transform(array(expensive), v -> f(v))[0]``.

    Column expressions have no sharing — pasting the same Column
    object at k use sites evaluates it k times, and inside a
    ``transform`` lambda that means PER ELEMENT. ``shingles`` hit
    exactly this: 3 ``element_at(toks, ·)`` per output element
    re-ran the full split+filter tokenization, O(tokens²) per doc —
    measured 53.5 s → 2.15 s (25×) for explode+count over sf1
    documents with this binding (PERF.md r9 "shingle let-binding").
    The lambda variable is a bound VALUE in HOF evaluation, so every
    reference inside ``body`` is free."""
    return F.transform(F.array(value), body)[0]


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Documents shorter than ``n``
    tokens collapse to a single whole-document shingle. ``toks`` is
    let-bound (see ``let``): it is referenced 3 times per output
    element, which without the binding re-tokenizes the document
    per element — O(tokens²)."""

    def over(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        )
        return F.array_distinct(
            F.when(F.size(t) >= n, grams).otherwise(
                F.array(F.concat_ws(" ", t))
            )
        )

    return let(toks, over)
