#!/usr/bin/env python3
"""Prototype the p35 cosine-LSH DuckDB oracle against the Spark dump.

Mirrors Dedup.cosinePairsLsh(planes=8, tables=1, threshold=0.4):
hyperplane component (p, d) = (pmod(xxhash64(p, d), 2001) - 1000)/1000
with xxhash64(int p, int d) = hashInt(d, hashInt(p, 42)).
"""
import sys

import duckdb

sys.path.insert(0, "tools")
from duck_xxh64_proto import xxh64_int, to_signed  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DUMP = sys.argv[2] if len(sys.argv) > 2 else "target/verify_proto"
PLANES = 8
THR = 0.4


def duck_dot(a, b):
    return (f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, "
            f"{b}), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))), "
            "(x,y) -> x+y)")


def duck_cos(a, b):
    return (f"({duck_dot(a, b)} / (sqrt({duck_dot(a, a)}) * "
            f"sqrt({duck_dot(b, b)})))")


# chained hashInt as two lateral-alias stages (u32 reinterpretation of
# p/d is the identity — both are >= 0)
from duck_xxh64_proto import xxh64_int_aliases  # noqa: E402
c1, h1 = xxh64_int_aliases("p", "42::HUGEINT", "q")
c2, h2 = xxh64_int_aliases("d", h1, "r")
w = (f"(CAST((((({to_signed(h2)}) % 2001) + 2001) % 2001) - 1000 AS DOUBLE)"
     " / 1000.0)")

con = duckdb.connect()
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
dims = con.sql("SELECT len(embedding) FROM embeddings LIMIT 1").fetchall()
print("dims:", dims)

sql = f"""
WITH hp0 AS MATERIALIZED (
  SELECT p.p, d.d, {c1}
  FROM (SELECT unnest(range({PLANES})) AS p) p
  CROSS JOIN (SELECT unnest(range({dims[0][0]})) AS d) d),
hp1 AS MATERIALIZED (SELECT p, d, {c2} FROM hp0),
hp AS MATERIALIZED (
  SELECT p, list(w ORDER BY d) AS wl FROM (
    SELECT p, d, {w} AS w FROM hp1)
  GROUP BY p),
bkt AS MATERIALIZED (
  SELECT e.vec_id, sum(CASE WHEN {duck_dot('e.embedding', 'hp.wl')} > 0.0
                       THEN (1::BIGINT << p) ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN hp GROUP BY e.vec_id),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b, {duck_cos('va.embedding', 'vb.embedding')} AS cosine
FROM cand c JOIN embeddings va ON va.vec_id = c.id_a
JOIN embeddings vb ON vb.vec_id = c.id_b
WHERE {duck_cos('va.embedding', 'vb.embedding')} >= {THR}
"""
ora = sorted(map(tuple, con.sql(sql).fetchall()))
eng = sorted(map(tuple, con.sql(
    f"SELECT id_a, id_b, cosine FROM '{DUMP}/p35_cosine_lsh/*.parquet'"
).fetchall()))
print(f"oracle rows={len(ora)} engine rows={len(eng)}")
if ora == eng:
    print("MATCH")
else:
    so, se = set(ora), set(eng)
    print("only-oracle:", sorted(so - se)[:5])
    print("only-engine:", sorted(se - so)[:5])
