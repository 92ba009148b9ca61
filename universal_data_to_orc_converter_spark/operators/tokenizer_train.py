"""Distributed BPE tokenizer training — the full merge LOOP, completing
the single pair-count step of ``op_bpe_pair_counts`` (text.py) into a
trained merge table (SURVEY.md §2.I extension, r5).

Byte-pair encoding training is the canonical iterative corpus job in an
LLM data pipeline: k rounds of (score adjacent symbol pairs → pick the
most frequent → merge it everywhere). The scale decomposition follows
production trainers (HuggingFace ``tokenizers``, SentencePiece):

1. ONE corpus-scale pass aggregates the corpus to DISTINCT token
   frequencies — the 10^11-token-instance stream compresses to a
   |vocab|-row table (tens of rows here, ~10^7 at 100 TB).
2. Every merge iteration then runs over the |vocab|-row symbol table
   only: a JVM ``transform``+``explode`` enumerates adjacent pairs
   weighted by token count, a map-side-combined groupBy scores them,
   and the winning pair's merge is applied with a JVM ``aggregate``
   fold (leftmost-first, non-overlapping — textbook BPE order). No
   Python executes per row; the only driver traffic is ONE (a, b,
   count) row per iteration — metadata, not data.

The merge applied by the fold is exactly classic BPE: scan symbols
left→right, gluing ``b`` onto a preceding ``a``; a freshly merged
symbol never immediately re-merges because the comparison is against
the whole merged string. Ties are broken (count DESC, a ASC, b ASC) so
training is deterministic; tests/test_bpe_train.py replays the same
corpus through a pure-Python reference trainer and asserts the merge
tables are IDENTICAL (exact, not approximate).

Lineage per iteration is truncated with an eager ``cache()`` of the
tiny symbol table (the prior iteration is unpersisted) — without it,
iteration k would replay all k-1 previous folds from the corpus scan.
Same pattern as op_pagerank (graph.py) and op_dedup_clusters' label
propagation: iterate on the SMALL derived state, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: number of merge rounds the query trains (small fixture vocab —
#: enough rounds to exercise merged-symbol-on-merged-symbol merges)
N_MERGES = 10


def _bpe_ctes(n: int) -> str:
    """DuckDB CTE chain replicating ``n`` BPE merge rounds — the same
    unrolling trick as the kmeans/pagerank oracles, upgrading both BPE
    ops from rows-only to full hash-checked (r13).

    Round state is the word's symbol list encoded as a DOUBLE-SPACE-
    joined string with a two-space sentinel on each end (symbols never
    contain spaces — they are concatenations of ``string_split(t, ' ')``
    word characters). The winning pair (a, b) is applied with plain
    ``replace(s, ' a  b ', ' ab ')``, which is exactly the Spark fold's
    leftmost-first non-overlapping merge:

    * no false positives: spaces occur only in runs of exactly two, and
      a single-space pattern margin can only align with the run's inner
      space, so ``a``/``b`` always match COMPLETE symbols;
    * consecutive occurrences both merge (``[a,b,a,b]`` → ``[ab,ab]``):
      the single-space margins leave one space of each boundary run
      unconsumed, so back-to-back matches don't overlap in the source;
    * overlapping occurrences resolve leftmost (``[a,a,a]`` with (a,a)
      → ``[aa,a]``), matching the fold's freshly-merged-symbol-never-
      immediately-re-merges semantics.

    Every CTE is MATERIALIZED: each round references the previous one
    several times, and DuckDB's default CTE inlining makes the plan
    tree grow ~4^n (measured: "Too many open files" at n=10 from
    re-reading the parquet a million times).

    An empty winner (vocab exhausted before round n) keeps the state
    unchanged via the COUNT guard and contributes no output row —
    mirroring the Spark loop's early ``break``. Caveat shared with the
    Spark side: character splitting is per code point on both engines
    (Java regex ``split("")`` / DuckDB ``string_split(t, '')``);
    differential-tested at sf0.001/0.01/0.1.
    """
    parts = [
        """
        r0 AS MATERIALIZED (
          SELECT CAST(c AS BIGINT) AS c,
                 '  ' || array_to_string(
                   list_filter(string_split(t, ''), x -> x <> ''), '  ')
                 || '  ' AS s
          FROM (
            SELECT t, COUNT(*) AS c FROM (
              SELECT unnest(string_split(text, ' ')) AS t FROM documents
            ) WHERE length(t) >= 2 GROUP BY t
          )
        )"""
    ]
    for k in range(n):
        parts.append(f"""
        p{k} AS MATERIALIZED (
          SELECT l[u.i] AS a, l[u.i+1] AS b,
                 CAST(SUM(c) AS BIGINT) AS cnt
          FROM (SELECT c,
                       list_filter(string_split(s, '  '), x -> x <> '') AS l
                FROM r{k}),
               LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) u
          GROUP BY 1, 2
        ),
        w{k} AS MATERIALIZED (
          SELECT a, b, a || b AS ab, cnt
          FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
        ),
        r{k + 1} AS MATERIALIZED (
          SELECT c,
                 CASE WHEN (SELECT COUNT(*) FROM w{k}) = 1
                      THEN replace(s,
                             (SELECT ' ' || a || '  ' || b || ' ' FROM w{k}),
                             (SELECT ' ' || ab || ' ' FROM w{k}))
                      ELSE s END AS s
          FROM r{k}
        )""")
    return "WITH " + ",".join(parts)


_BPE_TRAIN_ORACLE = _bpe_ctes(N_MERGES) + "\n" + "\nUNION ALL\n".join(
    f'SELECT CAST({k} AS INT) AS rank, a AS "left", b AS "right", '
    f"ab AS merged, cnt AS pair_count FROM w{k}"
    for k in range(N_MERGES)
)

_BPE_APPLY_ORACLE = _bpe_ctes(N_MERGES) + f"""
        SELECT symbol, CAST(SUM(c) AS BIGINT) AS n_occur FROM (
          SELECT c, unnest(list_filter(string_split(s, '  '),
                                       x -> x <> '')) AS symbol
          FROM r{N_MERGES}
        ) GROUP BY symbol ORDER BY n_occur DESC, symbol LIMIT 20
"""


def bpe_train_merges(token_counts: DataFrame, n_merges: int) -> list[dict]:
    """Run ``n_merges`` BPE merge rounds over a ``(t, c)`` DISTINCT
    token-frequency table; return the learned merge list
    ``[{rank, left, right, merged, pair_count}, ...]``.

    Distributed shape: each round is one groupBy over the |vocab|-row
    symbol table plus a 1-row driver fetch of the winner; the corpus
    itself is never re-read (the caller's aggregation already reduced
    it). Stops early if no adjacent pair remains.
    """
    cur = token_counts.select(
        "c",
        F.filter(F.split("t", ""), lambda x: x != F.lit("")).alias("syms"),
    ).cache()
    prev = None
    merges: list[dict] = []
    try:
        for rank in range(n_merges):
            pairs = (
                cur.filter(F.size("syms") >= 2)
                .select(
                    "c",
                    F.explode(
                        F.transform(
                            # size>=2 guaranteed by the filter, so the
                            # sequence is always ascending (Spark's
                            # sequence(1, 0) would count DOWN)
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i).alias("a"),
                                F.element_at(F.col("syms"), i + 1).alias(
                                    "b"
                                ),
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("c").cast("bigint").alias("cnt"))
            )
            top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
            # the collect above materialized cur's cache — the previous
            # round's table is now safe to drop
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
            ab = a + b
            # leftmost-first non-overlapping merge as a JVM fold: glue
            # b onto a preceding a; try_element_at(acc, -1) is NULL on
            # the empty accumulator (plain element_at THROWS under
            # ANSI), which safely falls to the append arm
            merged = F.aggregate(
                F.col("syms"),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                    & (x == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(ab)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            # cache lazily: the NEXT round's pair-count collect (or the
            # caller's first action) materializes it, and only then is
            # the parent dropped — removing the per-round eager count()
            # measured 2.8x end-to-end at sf0.1 (8.4 s -> 3.0 s)
            nxt = cur.select("c", merged.alias("syms")).cache()
            prev, cur = cur, nxt
            merges.append(
                {
                    "rank": rank,
                    "left": a,
                    "right": b,
                    "merged": ab,
                    "pair_count": int(cnt),
                }
            )
    finally:
        if prev is not None:
            prev.unpersist()
        cur.unpersist()
    return merges


@query(
    "op_bpe_train",
    oracle=_BPE_TRAIN_ORACLE,
    notes="Full distributed BPE training loop (module docstring): one "
    "corpus-scale pass reduces the corpus to DISTINCT token "
    "frequencies, then every merge round runs over the |vocab|-row "
    "symbol table — JVM transform/explode pair scoring, map-side-"
    "combined groupBy, JVM aggregate-fold merge application, 1-row "
    "driver fetch per round. FULLY ORACLE-CHECKED as of r13 (was "
    "rows-only): the 10 merge rounds unroll into MATERIALIZED DuckDB "
    "CTEs — the op_pagerank/op_kmeans technique — with the fold's "
    "leftmost non-overlapping merge replicated as a string replace "
    "over a double-space-joined symbol encoding (equivalence argument "
    "in _bpe_ctes). Deterministic by the count-DESC/pair-ASC "
    "tiebreak; additionally tests/test_bpe_train.py replays the same "
    "corpus through a pure-Python reference trainer and asserts the "
    "merge tables are identical, and a second test asserts the "
    "learned merges chain (later merges consume earlier merged "
    "symbols).",
    tags=("text", "scale"),
)
def op_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train N_MERGES BPE merges on the documents corpus; return the
    merge table (rank, left, right, merged, pair_count)."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") >= 2)
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    merges = bpe_train_merges(tc, N_MERGES)
    schema = (
        "rank int, left string, right string, merged string, "
        "pair_count bigint"
    )
    return spark.createDataFrame(merges, schema=schema).orderBy("rank")


def merge_fold_expr(col, a: str, b: str, ab: str):
    """The leftmost-first non-overlapping merge of pair (a, b) -> ab
    over a symbol array, as a pure JVM fold expression (same logic as
    the training loop's merge step)."""
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


@query(
    "op_bpe_apply",
    oracle=_BPE_APPLY_ORACLE,
    notes="BPE ENCODING with the merges op_bpe_train learns — the "
    "apply half of the tokenizer lifecycle, and a structurally "
    "different computation than training: training is inherently "
    "iterative (each merge depends on the argmax AFTER the previous "
    "one: k rounds, k tiny jobs), but application of a FIXED merge "
    "list composes all k folds lazily into ONE JVM expression chain — "
    "a single corpus-scale pass, zero intermediate jobs, no Python. "
    "The op trains 10 merges, encodes the distinct-token vocabulary "
    "(corpus->vocab compression again: folds run over |vocab| rows, "
    "weighted by token frequency), and emits the top-20 subword "
    "symbols by occurrence. FULLY ORACLE-CHECKED as of r13 (was "
    "rows-only): the encoded vocabulary is exactly the unrolled merge "
    "chain's final-round state (r10 in _bpe_ctes), so the oracle "
    "explodes that and top-20s it; tests/test_bpe_train.py "
    "additionally replays train+apply through the pure-Python "
    "reference and asserts the symbol frequency table matches "
    "EXACTLY.",
    tags=("text", "scale"),
)
def op_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus vocabulary with trained BPE merges; top-20
    subword symbols by weighted frequency."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") >= 2)
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    merges = bpe_train_merges(tc, N_MERGES)
    col = F.filter(F.split("t", ""), lambda x: x != F.lit(""))
    for m in merges:
        col = merge_fold_expr(col, m["left"], m["right"], m["merged"])
    return (
        tc.select("c", F.explode(col).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("c").cast("bigint").alias("n_occur"))
        .orderBy(F.desc("n_occur"), "symbol")
        .limit(20)
    )


#: unigram trainer configuration: substring seed length cap, kept
#: multi-char vocabulary size, EM rounds
UNIGRAM_MAX_LEN = 4
UNIGRAM_VOCAB = 48
UNIGRAM_ITERS = 2
UNIGRAM_SCALE = 1_000_000


def unigram_train(word_counts: DataFrame, iters: int = UNIGRAM_ITERS):
    """SentencePiece-style UNIGRAM-LM tokenizer training — the other
    canonical subword algorithm next to BPE (Kudo 2018), in the same
    scale decomposition as ``bpe_train_merges``:

    1. ONE distributed pass seeds candidate pieces: every substring
       (length ≤ UNIGRAM_MAX_LEN) of every DISTINCT word, weighted by
       word frequency — Arrow-batched; the seed table is pruned to
       the top multi-char candidates DISTRIBUTED (orderBy+limit) so
       the driver only ever holds O(vocab) state, never the substring
       universe (~20 × distinct-words rows at corpus scale).
    2. Each EM round broadcasts the integer piece scores
       (log-probability × 1e6, computed once on the driver), runs the
       VITERBI E-step over the distinct-word table in Arrow batches
       (per-word best segmentation under current scores; ties prefer
       the longer piece — deterministic), aggregates piece usage
       DISTRIBUTED (groupBy weighted by word count), and the driver
       M-step recomputes scores and prunes to UNIGRAM_VOCAB
       multi-char pieces (single chars are never pruned — coverage).

    Exactness: no SQL oracle (iterative, log-scores), but the loop is
    deterministic end-to-end and tests/test_unigram_train.py replays
    the identical algorithm in pure Python over the same word counts
    and asserts the full (piece, count, score) tables are IDENTICAL.
    """
    import math

    import pandas as pd

    spark = word_counts.sparkSession

    def substr_counts(batches):
        from collections import Counter

        acc: "Counter[str]" = Counter()
        for pdf in batches:
            for w, c in zip(pdf["w"], pdf["c"]):
                L = len(w)
                for i in range(L):
                    for ln in range(1, min(UNIGRAM_MAX_LEN, L - i) + 1):
                        acc[w[i : i + ln]] += int(c)
        yield pd.DataFrame(
            {
                "piece": pd.Series(list(acc), dtype="object"),
                "cnt": pd.Series(
                    [acc[p] for p in acc], dtype="int64"
                ),
            }
        )

    seeds = (
        word_counts.mapInPandas(substr_counts, "piece string, cnt bigint")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )
    chars = seeds.filter(F.length("piece") == 1)
    multi = (
        seeds.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(4 * UNIGRAM_VOCAB)
    )
    vocab = {
        r["piece"]: int(r["cnt"])
        for r in chars.unionByName(multi).collect()
    }

    def mk_scores(counts: dict) -> dict:
        total = sum(counts.values())
        return {
            p: int(round(math.log(c / total) * UNIGRAM_SCALE))
            for p, c in counts.items()
            if c > 0
        }

    scores = mk_scores(vocab)

    def viterbi(w: str, sc: dict) -> list[str]:
        NEG = -(1 << 60)
        L = len(w)
        best = [NEG] * (L + 1)
        back = [0] * (L + 1)
        best[0] = 0
        for i in range(1, L + 1):
            for ln in range(1, min(UNIGRAM_MAX_LEN, i) + 1):
                p = w[i - ln : i]
                s = sc.get(p)
                if s is None or best[i - ln] == NEG:
                    continue
                cand = best[i - ln] + s
                # ties prefer the LONGER piece: ln ascends, so >= wins
                if cand >= best[i]:
                    best[i] = cand
                    back[i] = ln
        out, i = [], L
        while i > 0:
            if back[i] == 0:  # unreachable — vocab lost a char
                raise ValueError(
                    f"unsegmentable word {w!r}: a required piece left "
                    f"the score table (single-char coverage violated)"
                )
            out.append(w[i - back[i] : i])
            i -= back[i]
        return out[::-1]

    for _ in range(iters):
        b_scores = spark.sparkContext.broadcast(scores)

        def estep(batches):
            from collections import Counter

            sc = b_scores.value
            acc: "Counter[str]" = Counter()
            for pdf in batches:
                for w, c in zip(pdf["w"], pdf["c"]):
                    for p in viterbi(w, sc):
                        acc[p] += int(c)
            yield pd.DataFrame(
                {
                    "piece": pd.Series(list(acc), dtype="object"),
                    "cnt": pd.Series(
                        [acc[p] for p in acc], dtype="int64"
                    ),
                }
            )

        used = (
            word_counts.mapInPandas(estep, "piece string, cnt bigint")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
        counts = {r["piece"]: int(r["cnt"]) for r in used}
        # prune: all single chars survive (coverage), top UNIGRAM_VOCAB
        # multi-char pieces by (count desc, piece) survive
        keep_multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:UNIGRAM_VOCAB]
        kept = {p: c for p, c in counts.items() if len(p) == 1}
        kept.update(dict(keep_multi))
        # single chars NEVER leave the score table, even at zero usage
        # (count floor 1): a char fully covered by multi-char pieces
        # this round may be needed next round if those pieces are
        # pruned — without the floor, Viterbi would find such a word
        # unsegmentable (best[i] stuck at NEG, back[i]==0, and the
        # backtrack would never terminate)
        for p in vocab:
            if len(p) == 1 and kept.get(p, 0) <= 0:
                kept[p] = 1
        scores = mk_scores({p: c for p, c in kept.items() if c > 0})
        vocab = kept
    return [
        {
            "piece": p,
            "cnt": int(c),
            "score": int(scores[p]),
        }
        for p, c in sorted(vocab.items(), key=lambda pc: (-pc[1], pc[0]))
        if c > 0 and p in scores
    ]


def _unigram_ctes(iters: int) -> str:
    """DuckDB replay of ``unigram_train``'s full EM loop — upgrading
    op_unigram_train from rows-only to a hash-checked oracle (r14),
    the same unrolled-CTE technique as the BPE/kmeans/pagerank
    oracles, plus a new trick: the VITERBI DP runs as a recursive CTE
    whose state row carries the last UNIGRAM_MAX_LEN best[] values
    (b0..b3), so the 4-deep lookback never references an earlier
    recursion layer. One recursion step per character position; four
    LEFT JOINs against the round's score table look up the candidate
    pieces ending at the next position; the longest-piece tiebreak is
    the CASE order (ln=4 checked first — Python's ``>=`` with ln
    ascending keeps the LAST maximal ln). A second recursive CTE
    walks back[] from each word's end to emit the segmentation pieces
    (multiplicity preserved — ``SUM(c)`` over walk rows equals the
    Counter's ``+= c`` per occurrence).

    Exactness argument: every count (word, seed, usage) is an exact
    integer aggregate; scores are ``round(ln(c/total)*1e6)`` where
    c/total is one double division of exact integers on both engines,
    so the only divergences are ln()'s last-ulp rounding and Python
    round()'s half-even vs DuckDB ROUND's half-away — both reachable
    only when ln(c/total)*1e6 lands within ~1e-9 of a rounding
    boundary (differential-matched at sf0.001/0.01/0.1). The floored
    single-char coverage rule (unused chars survive at count 1) is
    the NOT IN branch of each vocab{k} CTE."""
    NEG = -(1 << 60)
    cand = {
        ln: f"CASE WHEN s{ln}.score IS NOT NULL AND b{ln - 1} > {NEG} "
        f"THEN b{ln - 1} + s{ln}.score ELSE {NEG} END"
        for ln in range(1, UNIGRAM_MAX_LEN + 1)
    }
    best = "GREATEST(" + ", ".join(cand.values()) + ")"
    back = (
        f"CASE {best} "
        + " ".join(
            f"WHEN {cand[ln]} THEN {ln}"
            for ln in range(UNIGRAM_MAX_LEN, 1, -1)
        )
        + " ELSE 1 END"
    )
    parts = [
        f"""
        words AS MATERIALIZED (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS c, length(w) AS L FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents
          ) WHERE length(w) >= 1 GROUP BY w
        ),
        seeds AS MATERIALIZED (
          SELECT substr(w, u.i, v.ln) AS piece,
                 CAST(SUM(c) AS BIGINT) AS cnt
          FROM words,
               LATERAL (SELECT unnest(generate_series(1, L)) AS i) u,
               LATERAL (SELECT unnest(generate_series(1,
                          {UNIGRAM_MAX_LEN})) AS ln) v
          WHERE u.i + v.ln - 1 <= L
          GROUP BY 1
        ),
        vocab0 AS MATERIALIZED (
          SELECT piece, cnt FROM seeds WHERE length(piece) = 1
          UNION ALL
          SELECT piece, cnt FROM (
            SELECT piece, cnt FROM seeds WHERE length(piece) > 1
            ORDER BY cnt DESC, piece LIMIT {4 * UNIGRAM_VOCAB}
          )
        )"""
    ]
    for r in range(iters + 1):
        parts.append(f"""
        scores{r} AS MATERIALIZED (
          SELECT piece,
                 CAST(ROUND(ln(CAST(cnt AS DOUBLE) /
                     (SELECT CAST(SUM(cnt) AS DOUBLE) FROM vocab{r}))
                   * {UNIGRAM_SCALE}) AS BIGINT) AS score
          FROM vocab{r} WHERE cnt > 0
        )""")
        if r == iters:
            break
        k = r + 1
        joins = "\n".join(
            f"            LEFT JOIN scores{r} s{ln} ON i + 1 >= {ln} "
            f"AND s{ln}.piece = substr(w, i + 2 - {ln}, {ln})"
            for ln in range(1, UNIGRAM_MAX_LEN + 1)
        )
        parts.append(f"""
        seg{k} AS MATERIALIZED (
          WITH RECURSIVE dp AS (
            SELECT w, c, L, 0 AS i,
                   CAST(0 AS BIGINT) AS b0, CAST({NEG} AS BIGINT) AS b1,
                   CAST({NEG} AS BIGINT) AS b2, CAST({NEG} AS BIGINT) AS b3,
                   0 AS back
            FROM words
            UNION ALL
            SELECT w, c, L, i + 1, {best}, b0, b1, b2, {back}
            FROM dp
{joins}
            WHERE i < L
          ),
          walk AS (
            SELECT w, c, L AS i FROM words
            UNION ALL
            SELECT walk.w, walk.c, walk.i - dp.back
            FROM walk JOIN dp ON dp.w = walk.w AND dp.i = walk.i
            WHERE walk.i > 0
          )
          SELECT walk.w, walk.c,
                 substr(walk.w, walk.i - dp.back + 1, dp.back) AS piece
          FROM walk JOIN dp ON dp.w = walk.w AND dp.i = walk.i
          WHERE walk.i > 0
        ),
        usage{k} AS MATERIALIZED (
          SELECT piece, CAST(SUM(c) AS BIGINT) AS cnt
          FROM seg{k} GROUP BY piece
        ),
        vocab{k} AS MATERIALIZED (
          SELECT piece, cnt FROM usage{k} WHERE length(piece) = 1
          UNION ALL
          SELECT v.piece, CAST(1 AS BIGINT) AS cnt FROM vocab{r} v
          WHERE length(v.piece) = 1
            AND v.piece NOT IN (SELECT piece FROM usage{k}
                                WHERE length(piece) = 1)
          UNION ALL
          SELECT piece, cnt FROM (
            SELECT piece, cnt FROM usage{k} WHERE length(piece) > 1
            ORDER BY cnt DESC, piece LIMIT {UNIGRAM_VOCAB}
          )
        )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT v.piece, v.cnt, s.score
        FROM vocab{iters} v JOIN scores{iters} s USING (piece)
        ORDER BY v.cnt DESC, v.piece
    """
    )


@query(
    "op_unigram_train",
    oracle=_unigram_ctes(UNIGRAM_ITERS),
    notes="SentencePiece-style UNIGRAM-LM tokenizer training (Kudo "
    "2018) — completes the tokenizer family next to BPE: substring "
    "seeding, Viterbi E-step, score/prune M-step (unigram_train "
    "docstring for the scale decomposition — the corpus reduces to "
    "distinct word counts once; every EM round is Arrow-batched "
    "Viterbi over that |words|-row table with broadcast integer "
    "scores, a distributed piece-usage aggregate, and O(vocab) "
    "driver state; the substring seed universe is pruned "
    "DISTRIBUTED before any collect). FULLY ORACLE-CHECKED as of "
    "r14 (was rows-only): the whole EM loop — including the Viterbi "
    "DP — replays in DuckDB via unrolled CTEs with a recursive-CTE "
    "DP whose state carries the 4-deep best[] lookback "
    "(_unigram_ctes docstring for the exactness argument); "
    "tests/test_unigram_train.py additionally replays the identical "
    "algorithm in pure Python — full (piece, cnt, score) table "
    "equality, not approximate.",
    tags=("text", "scale"),
)
def op_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM piece vocabulary on the documents corpus;
    returns (piece, cnt, score) sorted by usage."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    rows = unigram_train(wc)
    return spark.createDataFrame(
        rows, schema="piece string, cnt bigint, score bigint"
    ).orderBy(F.desc("cnt"), "piece")
