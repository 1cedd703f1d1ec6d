#!/usr/bin/env python
"""Derive a CAPPED-CORPUS twin of a giant replica for the minhash-family
spot sweep (VERDICT r7 next-step 4).

The HUGEINT minhash oracle is exact but O(docs x 64 permutations) in pure
SQL arithmetic — hours in DuckDB at the 100x replica's 500k documents. The
dedup tier still deserves at-scale ORACLE evidence (the 100x spot sweep is
otherwise TPC-H/agg/ANN only), so this script materializes a deterministic
doc_id-mod sample of the replica's documents table into a sibling fixture
dir (every other table symlinked), small enough for the SQL twin to run in
minutes while the documents themselves are the REPLICA's documents — salted
texts, replica-scale id space, production multi-file layout preserved.

The sample is content-blind (doc_id % k == 0), so near-duplicate pairs
survive proportionally and both engines see the identical capped table:
a hash mismatch still means a logic divergence, now witnessed on at-scale
data. Run the spot sweep afterwards:

    python scripts/build_capped_corpus.py /tmp/sf1x100 /tmp/sf1x100_capped 25
    python scripts/sweep_oracle.py /tmp/sf1x100_capped dedup_minhash,dedup_incremental,...

Usage: build_capped_corpus.py [SRC] [OUT] [MOD]   # defaults above
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x100_capped"
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    # r10: the table to cap is a parameter — dedup_embedding joined the
    # capped-axis family (the DuckDB all-pairs twin is O(n²·dim) SQL
    # arithmetic: >9 min at the 100x replica's 200k vectors), so the
    # embeddings table gets the same content-blind id-mod cap treatment.
    table = sys.argv[4] if len(sys.argv) > 4 else "documents"
    id_col = {"documents": "doc_id", "embeddings": "vec_id"}[table]
    fname = f"{table}.parquet"

    import duckdb

    os.makedirs(out, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if name == fname:
            continue
        dst = os.path.join(out, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, name), dst)

    src_doc = os.path.join(src, fname)
    glob = f"{src_doc}/*.parquet" if os.path.isdir(src_doc) else src_doc
    con = duckdb.connect()
    n = con.sql(
        f"SELECT count(*) FROM '{glob}' WHERE {id_col} % {mod} = 0"
    ).fetchone()[0]
    # one file is the right layout here: the capped table is sweep-sized
    # (tens of k rows), not a bench-timing subject
    con.sql(
        f"COPY (SELECT * FROM '{glob}' WHERE {id_col} % {mod} = 0 "
        f"ORDER BY {id_col}) TO '{os.path.join(out, fname)}' "
        "(FORMAT parquet)"
    )
    print(f"capped {table}: {n} rows (mod {mod}) -> {out}/{fname}")


if __name__ == "__main__":
    main()
