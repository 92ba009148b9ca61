"""Generate the LONG-DOC fixtures used by the r10 verify-prefilter
investigation (PERF.md r10 "L1-histogram verify prefilter") so those
measurements are reproducible from the repo:

* ``/tmp/sflong`` — 20k docs × 1200-1800 tokens over a 50k-word open
  vocabulary; every 20th doc is a planted near-dup of its predecessor
  (5% token mutation). Shingle vocab ~28.7M, max_df 3: the open-vocab
  regime where candidates only form between genuine near-dups.
* ``/tmp/sflongclosed`` — 20k docs × 900-1100 tokens over a CLOSED
  3000-word vocabulary, same planting. Demonstrates that even a tiny
  word vocab yields a combinatorial (19M) 3-gram shingle vocab with
  max_df 4 — real long text cannot saturate shingle space, which is
  why the many-candidates × big-arrays regime the histogram prefilter
  needs does not occur under rarest-first prefix selection.

Deterministic (fixed numpy Generator seeds). Usage:

    python scripts/make_longdoc.py [open_dest] [closed_dest]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd


def make(dest: str, vocab_size: int, length_range: tuple[int, int],
         seed: int, source: str, n_docs: int = 20000) -> None:
    rng = np.random.default_rng(seed)
    width = 5 if vocab_size > 10000 else 4
    vocab = [f"w{i:0{width}d}" for i in range(vocab_size)]
    docs: list[str] = []
    prev: list[str] | None = None
    for i in range(n_docs):
        if i % 20 == 1 and prev is not None:
            toks = prev.copy()
            idxs = rng.choice(
                len(toks), size=max(1, len(toks) // 20), replace=False
            )
            for j in idxs:
                toks[j] = vocab[rng.integers(vocab_size)]
        else:
            n = int(rng.integers(*length_range))
            toks = [vocab[rng.integers(vocab_size)] for _ in range(n)]
        prev = toks
        docs.append(" ".join(toks))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype="int64"),
            "text": docs,
            "lang": "en",
            "source": source,
            "n_chars": np.array([len(t) for t in docs], dtype="int64"),
        }
    )
    os.makedirs(dest, exist_ok=True)
    pdf.to_parquet(os.path.join(dest, "documents.parquet"), index=False)
    print(f"wrote {dest}/documents.parquet: {n_docs} docs, "
          f"avg chars {int(pdf.n_chars.mean())}")


def main() -> None:
    open_dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sflong"
    closed_dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sflongclosed"
    make(open_dest, 50000, (1200, 1800), seed=42, source="long")
    make(closed_dest, 3000, (900, 1100), seed=7, source="longclosed")


if __name__ == "__main__":
    main()
