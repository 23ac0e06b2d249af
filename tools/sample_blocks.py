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

The same closed-world argument holds for the hyperplane-LSH pair oracle
(p35), whose buckets are a pure function of each VECTOR: any vector
subset is a self-contained corpus, and its pairs are exactly the full
corpus's pairs restricted to the subset. Pass vec_stride > 0 to also
rewrite `embeddings` keeping vec_id % vec_stride == 0 (ScaleGen copy
offsets are multiples of any small stride, so every copy is sampled
evenly).

The graph-analytics family (g42-g47) blocks on nation: its tournament
edges are pairs of SUPPLIERS within a nation, a pure function of the
supplier set — so a deterministic supplier-stride subset is a closed
world too (the fixture's edge count is quadratic in suppliers-per-
nation because nations are fixed dims; sampling suppliers is the sound
way to hold the fixture linear at 100x). Pass sup_stride > 0 to rewrite
`supplier` keeping s_suppkey % sup_stride == 0.

Usage: sample_blocks.py <sf_dir> <out_dir> [stride=20] [vec_stride=0]
       [sup_stride=0]
"""
import os
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
stride = int(sys.argv[3]) if len(sys.argv) > 3 else 20
vec_stride = int(sys.argv[4]) if len(sys.argv) > 4 else 0
sup_stride = int(sys.argv[5]) if len(sys.argv) > 5 else 0

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

passthrough = ["region", "nation", "customer", "part",
               "orders", "lineitem", "events"]
if sup_stride > 0:
    sup = f"{sf_dir}/supplier.parquet"
    if os.path.isdir(sup):
        sup = sup + "/*.parquet"
    out_sup = f"{out_dir}/supplier.parquet"
    if os.path.islink(out_sup) or os.path.exists(out_sup):
        os.remove(out_sup)
    con.execute(f"COPY (SELECT * FROM '{sup}' "
                f"WHERE s_suppkey % {sup_stride} = 0) "
                f"TO '{out_sup}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out_sup}'").fetchone()[0]
    print(f"[sample] supplier: {n} rows (s_suppkey % {sup_stride} == 0)")
else:
    passthrough.append("supplier")
if vec_stride > 0:
    emb = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(emb):
        emb = emb + "/*.parquet"
    out_emb = f"{out_dir}/embeddings.parquet"
    if os.path.islink(out_emb) or os.path.exists(out_emb):
        os.remove(out_emb)
    con.execute(f"COPY (SELECT * FROM '{emb}' "
                f"WHERE vec_id % {vec_stride} = 0) "
                f"TO '{out_emb}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out_emb}'").fetchone()[0]
    print(f"[sample] embeddings: {n} rows (vec_id % {vec_stride} == 0)")
else:
    passthrough.append("embeddings")

for t in passthrough:
    src = os.path.abspath(f"{sf_dir}/{t}.parquet")
    dst = f"{out_dir}/{t}.parquet"
    if os.path.islink(dst) or os.path.exists(dst):
        continue
    os.symlink(src, dst)
print(f"[sample] done -> {out_dir}")
