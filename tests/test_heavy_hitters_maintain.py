"""op_heavy_hitters_maintain — exact-regime oracle is covered by the
driver harness; here: the below-capacity Misra-Gries bounds on a
crafted over-capacity corpus, and empty-partition safety."""

from __future__ import annotations

from collections import Counter


def test_mg_bounds_hold_below_capacity(spark):
    """With k far below the distinct-key count, every estimate must
    satisfy true - n/(k+1) <= est <= true, and every key with true
    frequency > n/(k+1) must survive in the merged summary."""
    from pyspark.sql import functions as F

    from universal_data_to_orc_converter_spark.operators.maintenance import (
        _mg_partials,
        _mg_trim,
    )

    k = 8
    # 3 heavy keys + a 200-key uniform tail, interleaved
    rows = []
    for i in range(6000):
        if i % 3 == 0:
            rows.append(i % 2 - 2)  # keys -2, -1 heavy-ish
        elif i % 5 == 0:
            rows.append(-3)
        else:
            rows.append(i % 200)
    true = Counter(rows)
    n = len(rows)
    df = spark.createDataFrame([(r,) for r in rows], "k bigint").repartition(4)
    partials = _mg_partials(df, k).collect()
    merged: dict[int, int] = {}
    for r in partials:
        merged[r["k"]] = merged.get(r["k"], 0) + r["est"]
    merged = _mg_trim(merged, k)
    assert len(merged) <= k
    bound = n / (k + 1)
    for key, est in merged.items():
        assert est <= true[key], f"MG must never overcount ({key})"
        assert true[key] - est <= bound, f"undercount beyond n/(k+1) ({key})"
    for key, cnt in true.items():
        if cnt > bound:
            assert key in merged, f"guaranteed heavy key {key} evicted"


def test_empty_split_yields_empty_summary(spark):
    from universal_data_to_orc_converter_spark.operators.maintenance import (
        _mg_partials,
    )

    df = spark.createDataFrame([], "k bigint").repartition(2)
    assert _mg_partials(df, 8).count() == 0


def test_maintain_reclaims_scratch_store_and_result_survives(
    spark, tmp_path, monkeypatch
):
    """Regression: the parquet MG state store must be reclaimed before
    the op returns (it used to leak one mg_state_* dir per call), and
    the returned frame must still be collectable afterwards — i.e. the
    lazy dependency on the deleted directory was severed by an eager
    checkpoint, not left to fail on first action.

    The scratch root is isolated to tmp_path (the op's mkdtemp honors
    tempfile.tempdir, and it runs driver-side in this process): with
    the shared /tmp, ANOTHER repo process running concurrently — e.g.
    a scale audit alongside pytest — creates its own mg_state_* dir
    between the before/after globs and fails the leak assert
    spuriously (observed r13)."""
    import glob
    import os
    import tempfile

    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    from .conftest import SF_SMOKE

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    pattern = os.path.join(tempfile.gettempdir(), "mg_state_*")
    before = set(glob.glob(pattern))
    out = load_all_queries()["op_heavy_hitters_maintain"].fn(
        spark, SF_SMOKE
    )
    assert set(glob.glob(pattern)) == before, "scratch store leaked"
    rows = out.collect()
    assert 1 <= len(rows) <= 10
    # top row is one of the three hot sentinels by construction
    assert rows[0]["k"] in (-1, -2, -3)


def test_hist_serve_matches_python_quantile_reference(spark):
    """hist_serve's integer-rank reads (cum*2>=n etc.) vs an
    independent Python computation over random histograms — the
    all-integer comparisons must pick the same lower bin edge for
    p50/p90/p99 on every seed."""
    import random

    from universal_data_to_orc_converter_spark.operators.maintenance import (
        hist_serve,
    )

    rng = random.Random(0xFEED)
    rows = []
    want = {}
    for g in range(5):
        typ = f"t{g}"
        bins = {b: rng.randint(1, 50) for b in rng.sample(range(-20, 200), 12)}
        rows += [(typ, b, c) for b, c in bins.items()]
        n = sum(bins.values())
        cum, marks = 0, {}
        for b in sorted(bins):
            cum += bins[b]
            if "p50" not in marks and cum * 2 >= n:
                marks["p50"] = float(b)
            if "p90" not in marks and cum * 10 >= 9 * n:
                marks["p90"] = float(b)
            if "p99" not in marks and cum * 100 >= 99 * n:
                marks["p99"] = float(b)
        want[typ] = marks
    df = spark.createDataFrame(rows, "event_type string, bin bigint, c bigint")
    got = {r["event_type"]: r for r in hist_serve(df).collect()}
    for typ, marks in want.items():
        assert got[typ]["p50_lo"] == marks["p50"], typ
        assert got[typ]["p90_lo"] == marks["p90"], typ
        assert got[typ]["p99_lo"] == marks["p99"], typ
