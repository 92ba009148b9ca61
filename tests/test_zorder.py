"""Z-order clustering: Morton-code correctness vs a pure-Python
reference, and the data-skipping claim measured from per-file min/max
envelopes — z-order skips files for predicates on EITHER clustering
column, a linear sort only for its own."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.operators.zorder import (
    file_envelopes,
    linear_write,
    morton2,
    skipped_fraction,
    zorder_write,
)

from .conftest import SF_DIR


def _py_part1by1(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_morton2(a: int, b: int) -> int:
    return _py_part1by1(a) | (_py_part1by1(b) << 1)


class TestMortonCode:
    def test_matches_pure_python_reference(self, spark):
        pairs = [
            (0, 0),
            (1, 0),
            (0, 1),
            (65535, 65535),
            (12345, 54321),
            (0x5555, 0xAAAA),
            (255, 256),
        ]
        df = spark.createDataFrame(pairs, "a long, b long").withColumn(
            "z", morton2(F.col("a"), F.col("b"))
        )
        for row in df.collect():
            assert row["z"] == _py_morton2(row["a"], row["b"]), (
                row["a"],
                row["b"],
            )

    def test_locality_low_bits_interleave(self, spark):
        # adjacent ranks differ only in low Morton bits: z(a+1,b)
        # stays within the same high-bit prefix for small deltas —
        # spot-check the defining bit placement instead
        assert _py_morton2(1, 0) == 0b01
        assert _py_morton2(0, 1) == 0b10
        assert _py_morton2(3, 5) == 0b100111  # a bits → even positions


@pytest.fixture(scope="module")
def clustered_dirs(spark):
    """lineitem written 3 ways: arrival order, linear sort on
    l_orderkey, z-order on (l_orderkey, l_suppkey) — 16 files each."""
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_returnflag"
    )
    root = tempfile.mkdtemp(prefix="zorder_test_")
    paths = {
        "arrival": os.path.join(root, "arrival"),
        "linear": os.path.join(root, "linear"),
        "zorder": os.path.join(root, "zorder"),
    }
    li.repartition(16).write.mode("overwrite").orc(paths["arrival"])
    linear_write(li, paths["linear"], "l_orderkey", n_files=16)
    zorder_write(li, paths["zorder"], ("l_orderkey", "l_suppkey"), n_files=16)
    return spark, paths


def _env(spark, path):
    return [
        r.asDict()
        for r in file_envelopes(
            spark, path, ["l_orderkey", "l_suppkey"]
        ).collect()
    ]


class TestDataSkipping:
    def test_lossless_reorder(self, clustered_dirs):
        spark, paths = clustered_dirs
        base = spark.read.orc(paths["arrival"])
        for kind in ("linear", "zorder"):
            got = spark.read.orc(paths[kind])
            assert got.count() == base.count()
            assert (
                got.exceptAll(base).count() == 0
                and base.exceptAll(got).count() == 0
            ), f"{kind} write changed row multiset"

    def test_envelope_skipping(self, clustered_dirs):
        spark, paths = clustered_dirs
        li = spark.read.orc(paths["arrival"])
        ok_hi = li.agg(F.max("l_orderkey")).first()[0]
        sk_hi = li.agg(F.max("l_suppkey")).first()[0]
        # quarter-range predicates on each dimension
        ok_pred = (0, ok_hi // 4)
        sk_pred = (0, sk_hi // 4)

        arrival = _env(spark, paths["arrival"])
        linear = _env(spark, paths["linear"])
        zord = _env(spark, paths["zorder"])
        assert len(zord) == 16

        # arrival order: every file spans the whole key space → no
        # pruning on either column
        assert skipped_fraction(arrival, "l_orderkey", *ok_pred) == 0.0
        assert skipped_fraction(arrival, "l_suppkey", *sk_pred) == 0.0

        # linear sort: near-perfect on its own column, nothing on the
        # other
        assert skipped_fraction(linear, "l_orderkey", *ok_pred) >= 0.5
        assert skipped_fraction(linear, "l_suppkey", *sk_pred) == 0.0

        # z-order: real pruning on BOTH columns (16 files ≈ 4×4 grid;
        # a 1/4-range slab intersects one row/column of cells)
        z_ok = skipped_fraction(zord, "l_orderkey", *ok_pred)
        z_sk = skipped_fraction(zord, "l_suppkey", *sk_pred)
        assert z_ok >= 0.5, f"z-order orderkey skip {z_ok}"
        assert z_sk >= 0.5, f"z-order suppkey skip {z_sk}"

    def test_orc_predicate_pushdown_reaches_scan(self, clustered_dirs):
        spark, paths = clustered_dirs
        z = spark.read.orc(paths["zorder"]).filter(
            F.col("l_orderkey") <= 100
        )
        plan = z._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        assert "l_orderkey" in plan.split("PushedFilters:")[1][:200]


class TestQuantizeEdgeCases:
    def test_constant_column(self, spark):
        # hi == lo must not divide by zero; order then follows the
        # other dimension entirely
        df = spark.createDataFrame(
            [(7, i) for i in range(100)], "a long, b long"
        )
        out = os.path.join(tempfile.mkdtemp(prefix="zconst_"), "t")
        zorder_write(df, out, ("a", "b"), n_files=2)
        back = spark.read.orc(out)
        assert back.count() == 100
        env = [
            r.asDict()
            for r in file_envelopes(spark, out, ["b"]).collect()
        ]
        # degenerate dim contributes nothing → files range-split on b
        assert skipped_fraction(env, "b", 0, 10) >= 0.5


class TestMortonBijection:
    """encode∘decode = id over the full 16-bit × 16-bit domain — the
    property that makes the z-value a lossless ordering key (two
    distinct (a,b) cells can never collide into one code)."""

    @staticmethod
    def _decode(z: int) -> tuple[int, int]:
        def compact(x: int) -> int:
            x &= 0x55555555
            x = (x | (x >> 1)) & 0x33333333
            x = (x | (x >> 2)) & 0x0F0F0F0F
            x = (x | (x >> 4)) & 0x00FF00FF
            x = (x | (x >> 8)) & 0x0000FFFF
            return x

        return compact(z), compact(z >> 1)

    def test_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300)
        @given(
            st.integers(min_value=0, max_value=0xFFFF),
            st.integers(min_value=0, max_value=0xFFFF),
        )
        def check(a, b):
            assert self._decode(_py_morton2(a, b)) == (a, b)

        check()
