#!/usr/bin/env python3
"""Derive a deterministic block-sample corpus from a ScaleGen output dir.

The two quadratic dedup oracles (p32 blocked-Jaccard pairs, p49 duplicate
clusters) block on `source`: a pair can only form between docs with equal
source. Sampling WHOLE source blocks therefore preserves exact semantics
on the sample — the engine and the quadratic DuckDB oracle both see the
same closed world, and every pair/cluster of the sampled corpus is also a
pair/cluster of the full corpus. That makes the sample a sound gate for
the 100x corpus where the full quadratic oracle is intractable.

Sample rule (deterministic, no RNG): sort the distinct sources, keep
every `stride`-th starting at index 0. `documents` is rewritten filtered
to those sources; every other table is symlinked unchanged.

Usage: sample_blocks.py <sf_dir> <out_dir> [stride=20]
"""
import os
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
stride = int(sys.argv[3]) if len(sys.argv) > 3 else 20

docs = f"{sf_dir}/documents.parquet"
if os.path.isdir(docs):
    docs = docs + "/*.parquet"

os.makedirs(out_dir, exist_ok=True)
con = duckdb.connect()
sources = [r[0] for r in con.execute(
    f"SELECT DISTINCT source FROM '{docs}' ORDER BY 1").fetchall()]
keep = sources[::stride]
print(f"[sample] {len(keep)} of {len(sources)} blocks: {keep}")

out_docs = f"{out_dir}/documents.parquet"
if os.path.exists(out_docs):
    os.remove(out_docs)
kept_sql = ",".join("'" + s.replace("'", "''") + "'" for s in keep)
con.execute(f"COPY (SELECT * FROM '{docs}' WHERE source IN ({kept_sql})) "
            f"TO '{out_docs}' (FORMAT PARQUET)")
n = con.execute(f"SELECT count(*) FROM '{out_docs}'").fetchone()[0]
print(f"[sample] documents: {n} rows")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    src = os.path.abspath(f"{sf_dir}/{t}.parquet")
    dst = f"{out_dir}/{t}.parquet"
    if os.path.islink(dst) or os.path.exists(dst):
        continue
    os.symlink(src, dst)
print(f"[sample] done -> {out_dir}")
