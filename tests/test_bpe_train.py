"""Exact content check for op_bpe_train: the distributed merge loop
must learn the IDENTICAL merge table as a pure-Python reference BPE
trainer run on the same token frequencies with the same tiebreak
(count DESC, then pair ASC). Not approximate — BPE training is
deterministic, so any divergence (wrong pair scoring, wrong merge
application order, wrong tiebreak) fails exactly."""

from __future__ import annotations

from universal_data_to_orc_converter_spark.operators.tokenizer_train import (
    N_MERGES,
    op_bpe_train,
)

from .conftest import SF_DIR


def _py_bpe(token_counts: dict[str, int], k: int):
    """Textbook BPE trainer: symbols start as characters; each round
    scores adjacent pairs weighted by token frequency, merges the
    winner leftmost-first non-overlapping."""
    vocab: dict[tuple[str, ...], int] = {}
    for t, c in token_counts.items():
        key = tuple(t)
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for rank in range(k):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = ab
                else:
                    out.append(x)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
        merges.append((rank, a, b, ab, cnt))
    return merges


def test_bpe_train_matches_python_reference(spark, oracle):
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in op_bpe_train(spark, SF_DIR).collect()
    ]
    tc = dict(
        oracle.sql(
            """
            SELECT t, COUNT(*) AS c FROM (
              SELECT unnest(string_split(text, ' ')) AS t FROM documents
            ) WHERE length(t) >= 2 GROUP BY t
            """
        ).fetchall()
    )
    want = _py_bpe(tc, N_MERGES)
    assert got == want


def test_bpe_apply_matches_python_reference(spark, oracle):
    """Train + apply through the engine must equal train + apply
    through the pure-Python reference: identical top-20 subword
    frequency table after 10 merges."""
    from universal_data_to_orc_converter_spark.operators.tokenizer_train import (
        op_bpe_apply,
    )

    got = [
        (r["symbol"], r["n_occur"])
        for r in op_bpe_apply(spark, SF_DIR).collect()
    ]
    tc = dict(
        oracle.sql(
            """
            SELECT t, COUNT(*) AS c FROM (
              SELECT unnest(string_split(text, ' ')) AS t FROM documents
            ) WHERE length(t) >= 2 GROUP BY t
            """
        ).fetchall()
    )
    merges = _py_bpe(tc, N_MERGES)
    counts: dict[str, int] = {}
    for t, c in tc.items():
        syms: list[str] = list(t)
        for _, a, b, ab, _cnt in merges:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = ab
                else:
                    out.append(x)
            syms = out
        for s in syms:
            counts[s] = counts.get(s, 0) + c
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_bpe_merges_chain(spark):
    """Later merges must be able to consume earlier merged symbols —
    the property that distinguishes the LOOP from a single pair-count
    pass. With N_MERGES rounds on this corpus at least one learned
    pair has a multi-character side."""
    rows = op_bpe_train(spark, SF_DIR).collect()
    assert len(rows) == N_MERGES
    assert [r["rank"] for r in rows] == list(range(N_MERGES))
    assert any(
        len(r["left"]) > 1 or len(r["right"]) > 1 for r in rows
    ), "no merge consumed a previously merged symbol"
    # counts are non-increasing only per-pair, but every count is >0
    # and every merged symbol is the concatenation of its sides
    for r in rows:
        assert r["pair_count"] > 0
        assert r["merged"] == r["left"] + r["right"]


def _run_bpe_specs_on_corpus(spark, tmp_path, texts):
    """Run op_bpe_train + op_bpe_apply AND their DuckDB oracles on a
    crafted documents corpus; return ((train_spark, train_duck),
    (apply_spark, apply_duck)) as sorted tuple lists."""
    import os

    import duckdb

    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = str(tmp_path / "docs")
    d.coalesce(1).write.parquet(out)
    import glob as g

    os.rename(
        g.glob(os.path.join(out, "part-*.parquet"))[0],
        str(tmp_path / "documents.parquet"),
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path / 'documents.parquet'}'"
    )
    specs = load_all_queries()
    res = []
    for name in ("op_bpe_train", "op_bpe_apply"):
        sp = sorted(map(tuple, specs[name].fn(spark, str(tmp_path)).collect()))
        dk = sorted(map(tuple, con.sql(specs[name].oracle).fetchall()))
        res.append((sp, dk))
    return res


def test_bpe_oracle_matches_op_on_early_exhaustion(spark, tmp_path):
    """The unrolled-CTE oracle's empty-winner guard (r13) must mirror
    the Spark loop's early break when the vocabulary exhausts before
    N_MERGES rounds — a branch no fixture corpus reaches. Corpus 'ab':
    round 0 merges (a,b)->ab, round 1 has no adjacent pairs left, so
    BOTH sides must emit exactly one merge row and the single symbol
    'ab' from apply."""
    (tr_sp, tr_dk), (ap_sp, ap_dk) = _run_bpe_specs_on_corpus(
        spark, tmp_path, ["ab ab ab"]
    )
    assert tr_sp == tr_dk == [(0, "a", "b", "ab", 3)]
    assert ap_sp == ap_dk == [("ab", 3)]


def test_bpe_oracle_matches_op_on_empty_corpus(spark, tmp_path):
    """Zero eligible tokens (all shorter than 2 chars): the Spark loop
    breaks at round 0 and the oracle's every winner CTE is empty —
    both sides must return zero rows, not error."""
    (tr_sp, tr_dk), (ap_sp, ap_dk) = _run_bpe_specs_on_corpus(
        spark, tmp_path, ["a b c", ""]
    )
    assert tr_sp == tr_dk == []
    assert ap_sp == ap_dk == []


def test_bpe_oracle_matches_op_on_mid_loop_exhaustion(spark, tmp_path):
    """Exhaustion strictly BETWEEN rounds 1 and N_MERGES-1 (corpus
    supports a few merges, then runs dry): the oracle must keep state
    unchanged through the remaining empty-winner rounds and emit
    exactly the merges the Spark loop learned."""
    (tr_sp, tr_dk), (ap_sp, ap_dk) = _run_bpe_specs_on_corpus(
        spark, tmp_path, ["abcd abcd", "abcd"]
    )
    assert tr_sp == tr_dk
    assert ap_sp == ap_dk
    assert 1 < len(tr_sp) < N_MERGES  # genuinely mid-loop
