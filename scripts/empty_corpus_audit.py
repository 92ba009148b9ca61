"""Run every registered query against a ZERO-ROW (or N-row) fixture
and report which ones crash.

Why this matters at 100 TB: a predicate, a partition-pruned read, or
an upstream filter routinely hands an operator an EMPTY relation.
Operators must degrade to an empty (or well-defined small) result —
not die on ``collect()[0]``, a division by zero hoisted to the
driver, or an eager certificate that assumes at least one row.
Local fixtures are never empty, so this failure class is invisible
to the oracle gate; this audit makes it visible.

The empty fixture is derived from sf0.001 by ``LIMIT 0`` per table,
so every schema (names, types, nullability as written by the real
generator) is preserved exactly.

Run:  PYTHONPATH=/root/repo python scripts/empty_corpus_audit.py \
          [src_sf_dir] [n_rows] [nullify]
``n_rows`` (default 0) keeps the first N rows of every table — n=1 is
the off-by-one boundary regime (single doc/vector/order: no pairs, no
second window row, k-means with one point). A third argument
``nullify`` NULLs every 3rd documents.text and embeddings.embedding
(keys stay non-null) — the dirty-crawl regime the clean synthetic
fixtures never exercise.
Output: one line per failing op with the exception class + head of
the message; a summary count at the end. Exit 0 always (audit, not
gate) — failures feed fixes + regression tests, see PERF.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback


def main() -> int:
    from universal_data_to_orc_converter_spark.catalog import TABLES
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )
    from universal_data_to_orc_converter_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    nullify = len(sys.argv) > 3 and sys.argv[3] == "nullify"
    dst = f"/tmp/sf_sliced_{n_rows}" + ("_null" if nullify else "")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    # single-FILE parquet per table, exactly like the driver-generated
    # testdata layout (a Spark-written DIRECTORY breaks the ops that
    # hand the path to non-Spark readers — first audit run's artifact)
    import pyarrow.parquet as pq

    import pyarrow as pa

    null_cols = {"documents": "text", "embeddings": "embedding"}
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        tbl = tbl.slice(0, n_rows)
        if nullify and t in null_cols and len(tbl):
            c = null_cols[t]
            i = tbl.schema.get_field_index(c)
            col = tbl.column(c).combine_chunks()
            mask = pa.array([j % 3 == 0 for j in range(len(tbl))])
            import pyarrow.compute as pc

            nulled = pc.if_else(
                mask, pa.nulls(len(tbl), type=tbl.schema.field(c).type), col
            )
            tbl = tbl.set_column(i, tbl.schema.field(c), nulled)
        pq.write_table(tbl, f"{dst}/{t}.parquet")
    print(
        f"[setup] {n_rows}-row fixture at {dst} (schemas from {src}, "
        f"nullify={nullify})"
    )

    specs = load_all_queries()
    ok, failed = 0, []
    for name in sorted(specs):
        try:
            n = specs[name].fn(spark, dst).count()
            ok += 1
            if n and n_rows == 0:
                print(f"[nonzero-on-empty] {name}: {n} rows")
        except Exception as e:  # noqa: BLE001 — audit wants them all
            msg = str(e).split("\n")[0][:160]
            failed.append(name)
            print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
            if os.environ.get("EMPTY_AUDIT_TRACE"):
                traceback.print_exc()
    print(
        f"[summary] {ok} ok / {len(failed)} failed of {len(specs)}; "
        f"failures: {failed}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
