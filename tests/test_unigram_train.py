"""op_unigram_train content tests: the distributed EM loop must match
an INDEPENDENT pure-Python reference implementing the same
deterministic algorithm (substring seeding with distributed-prune
rule, Viterbi E-step with longer-piece tiebreak, score/prune M-step)
over the same word counts — full-table exactness, the same standard
op_bpe_train is held to."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.operators.tokenizer_train import (
    UNIGRAM_ITERS,
    UNIGRAM_MAX_LEN,
    UNIGRAM_SCALE,
    UNIGRAM_VOCAB,
    op_unigram_train,
)

from .conftest import SF_DIR


def _reference_unigram(word_counts: dict[str, int]) -> list[tuple]:
    """Pure-Python replica, written independently of the operator."""

    def substrings(w):
        for i in range(len(w)):
            for ln in range(1, min(UNIGRAM_MAX_LEN, len(w) - i) + 1):
                yield w[i : i + ln]

    seed = Counter()
    for w, c in word_counts.items():
        for p in substrings(w):
            seed[p] += c
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: 4 * UNIGRAM_VOCAB]
    vocab = {p: c for p, c in seed.items() if len(p) == 1}
    vocab.update(dict(multi))

    def scores_of(counts):
        total = sum(counts.values())
        return {
            p: int(round(math.log(c / total) * UNIGRAM_SCALE))
            for p, c in counts.items()
            if c > 0
        }

    scores = scores_of(vocab)

    def viterbi(w, sc):
        NEG = -(1 << 60)
        best = [NEG] * (len(w) + 1)
        back = [0] * (len(w) + 1)
        best[0] = 0
        for i in range(1, len(w) + 1):
            for ln in range(1, min(UNIGRAM_MAX_LEN, i) + 1):
                s = sc.get(w[i - ln : i])
                if s is None or best[i - ln] == NEG:
                    continue
                if best[i - ln] + s >= best[i]:
                    best[i] = best[i - ln] + s
                    back[i] = ln
        out, i = [], len(w)
        while i > 0:
            out.append(w[i - back[i] : i])
            i -= back[i]
        return out[::-1]

    for _ in range(UNIGRAM_ITERS):
        counts = Counter()
        for w, c in word_counts.items():
            for p in viterbi(w, scores):
                counts[p] += c
        keep_multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:UNIGRAM_VOCAB]
        kept = {p: c for p, c in counts.items() if len(p) == 1}
        kept.update(dict(keep_multi))
        for p in vocab:  # single-char coverage floor (see operator)
            if len(p) == 1 and kept.get(p, 0) <= 0:
                kept[p] = 1
        scores = scores_of({p: c for p, c in kept.items() if c > 0})
        vocab = kept
    return sorted(
        (
            (p, c, scores[p])
            for p, c in vocab.items()
            if c > 0 and p in scores
        ),
        key=lambda r: (-r[1], r[0]),
    )


def _word_counts(spark):
    d = load(spark, SF_DIR, "documents")
    return {
        r["w"]: r["c"]
        for r in d.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    }


def test_unigram_matches_pure_python_reference(spark):
    got = [
        (r["piece"], r["cnt"], r["score"])
        for r in op_unigram_train(spark, SF_DIR).collect()
    ]
    want = _reference_unigram(_word_counts(spark))
    assert got == want


def test_unigram_learns_compressive_pieces(spark):
    """The learned vocabulary must actually compress: segmenting the
    corpus with the trained pieces must use materially fewer tokens
    than character-level segmentation, and multi-char pieces must
    carry most usage."""
    rows = op_unigram_train(spark, SF_DIR).collect()
    total_tokens = sum(r["cnt"] for r in rows)
    char_level = sum(
        len(w) * c for w, c in _word_counts(spark).items()
    )
    assert total_tokens < 0.5 * char_level, (
        f"{total_tokens} trained tokens vs {char_level} chars — the "
        "vocabulary learned nothing"
    )
    multi_usage = sum(r["cnt"] for r in rows if len(r["piece"]) > 1)
    assert multi_usage / total_tokens > 0.5


def test_unigram_single_char_coverage_floor(spark):
    """The review-found hang: a char fully covered by multi-char
    pieces in round 1 used to fall out of the score table with count
    0; if segmentation later needed it, Viterbi's backtrack looped
    forever. The coverage floor keeps every seeded single char
    scoreable — train on a corpus engineered so 'z' is always eaten
    by the dominant piece 'ze', and require training to terminate
    with 'z' still in the vocabulary."""
    from universal_data_to_orc_converter_spark.operators.tokenizer_train import (
        unigram_train,
    )

    rows = [("ze", 500), ("zebra", 200), ("bra", 300)]
    wc = spark.createDataFrame(rows, "w string, c bigint")
    pieces = {r["piece"] for r in unigram_train(wc)}
    assert "z" in pieces or "ze" in pieces
    # and every input word is segmentable with the final vocab
    assert pieces, "training produced an empty vocabulary"


def test_unigram_oracle_on_crafted_edge_corpus(spark, tmp_path):
    """The r14 DuckDB oracle (recursive-CTE Viterbi + unrolled EM) vs
    BOTH the Spark op and the pure-Python reference, on a corpus
    crafted around the algorithm's edges: single-char words (L=1 DP),
    a word that reuses one piece back-to-back (multiplicity in the
    usage SUM), exact count TIES at prune boundaries (broken by piece
    ASC on both engines), chars fully covered by multi-char pieces in
    round 1 (the floor-1 coverage rule — the NOT IN branch of the
    oracle's vocab CTEs), null and empty texts, and words at exactly
    UNIGRAM_MAX_LEN."""
    import duckdb
    import pandas as pd

    from universal_data_to_orc_converter_spark.registry import QUERIES

    docs = [
        "a b c a b",                # single-char words, repeated
        "abab abab abab",           # piece reuse inside one word
        "abcd abcd dcba",           # exactly MAX_LEN words + a tie-mate
        "xyxy yxyx",                # tie candidates at equal counts
        "zzzz zzzz zzzz zzzz",      # one char dominating via multi cover
        "qq qq qq",                 # short multi
        None,                       # null text -> no words
        "",                         # empty text -> no words
        "   ",                      # only separators -> empty words dropped
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(docs))),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["test"] * len(docs),
            "n_chars": [len(d or "") for d in docs],
        }
    )
    spark.createDataFrame(pdf).selectExpr(
        "CAST(doc_id AS BIGINT) doc_id", "text", "lang", "source",
        "CAST(n_chars AS BIGINT) n_chars",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    spec = QUERIES["op_unigram_train"]
    got_spark = [
        (r["piece"], r["cnt"], r["score"])
        for r in spec.fn(spark, str(tmp_path)).collect()
    ]

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    got_oracle = [
        (p, int(c), int(s)) for p, c, s in con.sql(spec.oracle).fetchall()
    ]
    con.close()

    wc = {}
    for d in docs:
        for w in (d or "").lower().split(" "):
            if len(w) >= 1:
                wc[w] = wc.get(w, 0) + 1
    want = _reference_unigram(wc)

    assert got_spark == want
    assert got_oracle == want
