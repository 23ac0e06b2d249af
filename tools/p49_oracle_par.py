#!/usr/bin/env python3
"""Parallel variant of p49_oracle.py: one DuckDB process per source
block (blocks are independent -- pairs require equal source), pair sets
dumped to parquet, then one min-root union-find + label compare against
the engine's p49 dump. Usage:
  p49_oracle_par.py <sf_dir> <dump_dir> <pairs_out_dir> [workers]
Block dumps are cached: rerunning resumes from completed blocks."""
import os
import subprocess
import sys
import time

import duckdb

sf_dir, dump_dir, out_pairs = sys.argv[1], sys.argv[2], sys.argv[3]
workers = int(sys.argv[4]) if len(sys.argv) > 4 else 4

docs = f"{sf_dir}/documents.parquet"
if os.path.isdir(docs):
    docs = docs + "/*.parquet"

con = duckdb.connect()
sources = [r[0] for r in con.execute(
    f"SELECT DISTINCT source FROM '{docs}' ORDER BY 1").fetchall()]
os.makedirs(out_pairs, exist_ok=True)

BLOCK_SQL = """
SET threads TO 8;
COPY (
WITH t AS (SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS w
           FROM '{docs}' WHERE source = '{src}'),
 sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w)-1)]
          END) AS sh FROM t)
SELECT a.doc_id AS ia, b.doc_id AS ib FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.01
) TO '{out}' (FORMAT PARQUET);
"""

pending = []
for s in sources:
    if os.path.exists(f"{out_pairs}/{s}.parquet"):
        print(f"[p49-par] {s}: cached", flush=True)
    else:
        pending.append(s)

running = {}
t0 = time.time()
while pending or running:
    while pending and len(running) < workers:
        s = pending.pop(0)
        sql = BLOCK_SQL.format(docs=docs, src=s,
                               out=f"{out_pairs}/{s}.parquet.tmp")
        running[s] = subprocess.Popen([sys.executable, "-c",
            "import duckdb,sys\n"
            "for st in sys.argv[1].split(';'):\n"
            "    if st.strip(): duckdb.connect().execute(st)",
            sql])
    done = [s for s, p in running.items() if p.poll() is not None]
    for s in done:
        rc = running.pop(s).returncode
        if rc != 0:
            print(f"[p49-par] {s} FAILED rc={rc}", flush=True)
            sys.exit(2)
        os.rename(f"{out_pairs}/{s}.parquet.tmp", f"{out_pairs}/{s}.parquet")
        print(f"[p49-par] {s} done at t={time.time()-t0:.0f}s", flush=True)
    time.sleep(2)

parent = {}
def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent.get(r, r)
    while x != r:
        parent[x], x = r, parent.get(x, x)
    return r

n_pairs = 0
for s in sources:
    rows = con.execute(
        f"SELECT ia, ib FROM '{out_pairs}/{s}.parquet'").fetchall()
    n_pairs += len(rows)
    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
print(f"[p49-par] union-find over {n_pairs} pairs", flush=True)

expected = {}
for (i,) in con.execute(f"SELECT doc_id FROM '{docs}'").fetchall():
    expected[i] = find(i)
eng = dict(con.execute(
    f"SELECT doc_id, cluster FROM '{dump_dir}/p49_dup_clusters/*.parquet'"
).fetchall())
if eng == expected:
    print(f"PASS p49_dup_clusters ({len(expected)} labels, {n_pairs} "
          "oracle pairs, independent union-find)")
    sys.exit(0)
bad = sum(1 for k in expected if eng.get(k) != expected[k])
diff = [(k, eng.get(k), expected[k]) for k in expected
        if eng.get(k) != expected[k]][:5]
print(f"FAIL p49: {bad} label mismatches of {len(expected)}; first: {diff}")
sys.exit(1)
