#!/usr/bin/env python3
"""Prototype the p37 IVF DuckDB oracle against the Spark dump.

Mirrors Similarity.ivfTrain(k=16, iters=2) + ivfAssign + ivfTopK(k=10,
nProbe=4, queries = vec_id < 5): deterministic lowest-id init, two
Lloyd rounds (argmin-L2² assignment, per-dim double mean cast to
float), probe the 4 nearest centroids per query, exact cosine top-10
within the probed cells.
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DUMP = sys.argv[2] if len(sys.argv) > 2 else "target/verify_proto"
K, NPROBE, TOPK = 16, 4, 10


def dot(a, b):
    return (f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, "
            f"{b}), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))), "
            "(x,y) -> x+y)")


def cos(a, b):
    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def l2sq(a, b):
    return (f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, "
            f"{b}), p -> (CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))*"
            "(CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE)))), (x,y) -> x+y)")


def assign(vecs, cents, out):
    """argmin-L2² assignment, ties to lowest c_id."""
    return f"""{out} AS MATERIALIZED (
  SELECT vec_id, embedding, c_id AS cluster FROM (
    SELECT v.vec_id, v.embedding, c.c_id,
      row_number() OVER (PARTITION BY v.vec_id
        ORDER BY {l2sq('v.embedding', 'c.cv')} ASC, c.c_id ASC) AS rn
    FROM {vecs} v CROSS JOIN {cents} c)
  WHERE rn = 1)"""


def means(assigned, dims, out):
    """per-cluster per-dim double mean, cast to float (Spark order)."""
    return f"""{out} AS MATERIALIZED (
  SELECT cluster AS c_id, list(CAST(m AS FLOAT) ORDER BY d) AS cv FROM (
    SELECT a.cluster, d.d, avg(CAST(a.embedding[d.d + 1] AS DOUBLE)) AS m
    FROM {assigned} a CROSS JOIN (SELECT unnest(range({dims})) AS d) d
    GROUP BY 1, 2)
  GROUP BY cluster)"""


con = duckdb.connect()
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
dims = con.sql("SELECT len(embedding) FROM embeddings LIMIT 1").fetchall()[0][0]

sql = f"""
WITH c0 AS MATERIALIZED (
  SELECT vec_id AS c_id, embedding AS cv FROM embeddings
  ORDER BY vec_id LIMIT {K}),
{assign('embeddings', 'c0', 'a1')},
{means('a1', dims, 'c1')},
{assign('embeddings', 'c1', 'a2')},
{means('a2', dims, 'c2')},
{assign('embeddings', 'c2', 'af')},
probes AS MATERIALIZED (
  SELECT q_id, qv, c_id AS cluster FROM (
    SELECT q.vec_id AS q_id, q.embedding AS qv, c.c_id,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY {l2sq('q.embedding', 'c.cv')} ASC, c.c_id ASC) AS rn
    FROM embeddings q CROSS JOIN c2 c WHERE q.vec_id < 5)
  WHERE rn <= {NPROBE})
SELECT q_id, nn_id, CAST(rank AS INT) AS rank, cosine FROM (
  SELECT p.q_id, a.vec_id AS nn_id,
    {cos('p.qv', 'a.embedding')} AS cosine,
    row_number() OVER (PARTITION BY p.q_id
      ORDER BY {cos('p.qv', 'a.embedding')} DESC, a.vec_id ASC) AS rank
  FROM af a JOIN probes p ON a.cluster = p.cluster
  WHERE p.q_id <> a.vec_id)
WHERE rank <= {TOPK}
"""
ora = sorted(map(tuple, con.sql(sql).fetchall()))
eng = sorted(map(tuple, con.sql(
    f"SELECT q_id, nn_id, rank, cosine FROM '{DUMP}/p37_ann_ivf/*.parquet'"
).fetchall()))
print(f"oracle rows={len(ora)} engine rows={len(eng)}")
if ora == eng:
    print("MATCH")
else:
    so, se = set(ora), set(eng)
    print("only-oracle:", sorted(so - se)[:8])
    print("only-engine:", sorted(se - so)[:8])
