#!/usr/bin/env python3
"""Independent p49 oracle at scale: per-source-block exact-Jaccard pairs
in DuckDB (clusters cannot span blocks — pairs require equal source) +
a min-root union-find over the pair set, compared label-by-label to the
engine's p49 dump. Same protocol as the committed sf1 gate, extended to
run block-by-block so each quadratic piece stays bounded."""
import json, sys, time
import duckdb

sf_dir, dump_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
docs = f"{sf_dir}/documents.parquet"
import os
if os.path.isdir(docs):
    docs = docs + "/*.parquet"
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{docs}'")
sources = [r[0] for r in con.execute(
    "SELECT DISTINCT source FROM documents ORDER BY 1").fetchall()]

PAIR_SQL = """
WITH t AS (SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS w
           FROM documents WHERE source = ?),
 sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
          THEN [array_to_string(w, ' ')]
          ELSE [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w)-1)]
          END) AS sh FROM t)
SELECT a.doc_id, b.doc_id FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.01
"""

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
    t0 = time.time()
    rows = con.execute(PAIR_SQL, [s]).fetchall()
    n_pairs += len(rows)
    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb: parent[rb] = ra
            else: parent[ra] = rb
    print(f"[p49-oracle] {s}: {len(rows)} pairs in {time.time()-t0:.1f}s",
          flush=True)

expected = {}
for (i,) in con.execute("SELECT doc_id FROM documents").fetchall():
    expected[i] = find(i)

eng = dict(con.execute(
    f"SELECT doc_id, cluster FROM '{dump_dir}/p49_dup_clusters/*.parquet'"
).fetchall())

if eng == expected:
    print(f"PASS p49_dup_clusters ({len(expected)} labels, {n_pairs} "
          "oracle pairs, independent union-find)")
    sys.exit(0)
diff = [(k, eng.get(k), expected[k]) for k in expected
        if eng.get(k) != expected[k]][:5]
print(f"FAIL p49: {sum(1 for k in expected if eng.get(k) != expected[k])} "
      f"label mismatches of {len(expected)}; first: {diff}")
sys.exit(1)
