"""Regenerate the local 10x scaling fixture at /tmp/sf1.

Methodology (PERF.md "sf1 scaling experiment"): each sf0.1 table is
replicated 10x with keys offset per replica so the result is a
plausible larger instance, not 10 identical copies:

* lineitem / orders: l_orderkey / o_orderkey (+ o_custkey) offset by
  replica * (max_key + 1)  -> 6M / 1.5M rows, join cardinalities
  preserved per replica.
* events: event_id and user_id offset per replica -> 1M rows, 10x the
  user population (window/sessionize per-user profiles preserved).
* documents: doc_id offset; text WORD-SHUFFLED with a per-replica
  seed so replicas are not near-duplicates of the originals
  (dedup/minhash recall experiments stay honest) while token counts
  and lengths are preserved.
* embeddings: vec_id offset; vectors perturbed by a small deterministic
  per-replica rotation-free jitter (+0.01*replica on one coordinate)
  so exact-dup collapse does not occur.
* region/nation/customer/supplier/part: copied unchanged (dimensions).

Deterministic: seeded with (rung, replica) — the rung index is derived
from the destination path so chained rungs never repeat a shuffle.
"""

from __future__ import annotations

import os
import random
import shutil
import sys

import duckdb

#: Usage: make_sf1.py [dst] [src] [replicas] — chaining the script on
#: its own output builds a scaling LADDER: the default builds /tmp/sf1
#: (10x) from sf0.1; `make_sf1.py /tmp/sf10 /tmp/sf1` builds the 100x
#: rung (dimension tables stay fixture-sized on every rung, exactly
#: like TPC-H's non-scaling dims; document replicas re-shuffle with
#: fresh per-rung seeds so no rung introduces near-duplicates).
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

# Rung-specific seed base (r15 ADVICE): with a seed of (1234 + r) on
# every rung, chaining the script on its own output reproduced rung-1's
# replica-r blocks exactly (replica r of the verbatim block-0 is the
# same shuffle on both rungs), so ~9% of a chained 100x fixture's
# documents/embeddings were exact duplicates under different ids.
# Mixing a DST-derived rung index into the seed makes every rung's
# shuffles and jitter coordinates distinct. Ladders generated before
# this fix carried those duplicates; at-scale dedup/minhash/semdedup
# numbers quoted from them (PERF.md r14) should be read with that
# caveat or re-measured on a regenerated ladder.
import zlib

SEED_BASE = zlib.crc32(os.path.abspath(DST).encode())
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

#: Parquet row-group sizing (r16): the driver's fixtures are
#: single-row-group files, so every scan stage is ONE task at any core
#: count — that floors every local measurement and hides core scaling
#: (r15 verdict item). The ladder's tables are written with explicit
#: row groups sized so each table splits into >= 16 groups (floor 2048
#: rows so groups stay vectorization-friendly), which is what any real
#: multi-hundred-MB table looks like.
def row_group_size(n_rows: int) -> int:
    return max(2048, n_rows // 16)

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

for dim in ("region", "nation", "customer", "supplier", "part"):
    shutil.copyfile(f"{SRC}/{dim}.parquet", f"{DST}/{dim}.parquet")

offsets = {
    "lineitem": ("l_orderkey", ["l_orderkey"]),
    "orders": ("o_orderkey", ["o_orderkey", "o_custkey"]),
    "events": ("event_id", ["event_id", "user_id"]),
}
for t, (keycol, cols) in offsets.items():
    base = con.sql(f"SELECT MAX({keycol}) FROM '{SRC}/{t}.parquet'").fetchone()[0] + 1
    # user_id/custkey need their own modulus
    parts = []
    for r in range(REPLICAS):
        sel = []
        desc = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        for name, typ, *_ in desc:
            if name in cols:
                sel.append(f"{name} + {r * base} AS {name}")
            else:
                sel.append(name)
        parts.append(f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'")
    n_src = con.sql(f"SELECT COUNT(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
    rg = row_group_size(n_src * REPLICAS)
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{t}.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
    )
    print(t, con.sql(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0])

# documents: word-shuffle replicas 1..9, replica 0 verbatim
docs = con.sql(f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'").fetchall()
max_doc = max(d[0] for d in docs) + 1
out = []
for r in range(REPLICAS):
    # explicit integer mixing (r15 ADVICE: hash(tuple) seeding is a
    # CPython implementation detail, not a documented guarantee)
    rng = random.Random(SEED_BASE * 1_000_003 + 1234 + r)
    for doc_id, text, lang, source, n_chars in docs:
        if r == 0:
            t2 = text
        else:
            words = text.split(" ")
            rng.shuffle(words)
            t2 = " ".join(words)
        out.append((doc_id + r * max_doc, t2, lang, source, len(t2)))
con.sql("CREATE TABLE docs_out (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO docs_out VALUES (?,?,?,?,?)", out)
con.sql(
    f"COPY docs_out TO '{DST}/documents.parquet' "
    f"(FORMAT PARQUET, ROW_GROUP_SIZE {row_group_size(len(out))})"
)
print("documents", len(out))

# embeddings: jitter one coordinate per replica
embs = con.sql(f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'").fetchall()
max_vec = max(e[0] for e in embs) + 1
eout = []
for r in range(REPLICAS):
    for vec_id, emb, label in embs:
        v = list(emb)
        if r:
            j = (SEED_BASE + r) % len(v)
            v[j] = float(v[j]) + 0.01 * r
        eout.append((vec_id + r * max_vec, v, label))
con.sql("CREATE TABLE emb_out (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO emb_out VALUES (?,?,?)", eout)
con.sql(
    f"COPY emb_out TO '{DST}/embeddings.parquet' "
    f"(FORMAT PARQUET, ROW_GROUP_SIZE {row_group_size(len(eout))})"
)
print("embeddings", len(eout))
print("done ->", DST)
