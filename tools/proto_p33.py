#!/usr/bin/env python3
"""Prototype the p33 simhash-pairs DuckDB oracle against the Spark dump."""
import sys

import duckdb

sys.path.insert(0, "tools")
from duck_xxh64_proto import xxh64_str_ctes, to_signed  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DUMP = sys.argv[2] if len(sys.argv) > 2 else "target/verify_proto"
MAXH = 10
MAXB = 4096

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

sql = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS ct FROM tok GROUP BY 1, 2),
voc AS (SELECT DISTINCT tok FROM tc),
{xxh64_str_ctes('voc', 'tok', 'vh').lstrip()},
bits AS (
  SELECT tc.doc_id, b.b,
         sum(tc.ct * CASE WHEN (vh.xh // power(2::HUGEINT, b.b)::HUGEINT) % 2 = 1
                          THEN 1 ELSE -1 END) AS s
  FROM tc JOIN vh ON tc.tok = vh.tok CROSS JOIN (SELECT unnest(range(64)) AS b) b
  GROUP BY 1, 2),
sig AS (
  SELECT doc_id, {to_signed('sum(CASE WHEN s > 0 THEN power(2::HUGEINT, b)::HUGEINT ELSE 0::HUGEINT END)')} AS sig
  FROM bits GROUP BY doc_id),
dsig AS (SELECT DISTINCT sig FROM sig),
chunked AS (
  SELECT sig, c, (sig >> (c * 16)) & 65535 AS chunk,
         row_number() OVER (PARTITION BY c, (sig >> (c * 16)) & 65535 ORDER BY sig) AS rn
  FROM dsig CROSS JOIN (SELECT unnest(range(4)) AS c) cc
  QUALIFY rn <= {MAXB}),
sigpairs AS (
  SELECT DISTINCT a.sig AS sig_a, b.sig AS sig_b
  FROM chunked a JOIN chunked b ON a.c = b.c AND a.chunk = b.chunk
   AND a.sig < b.sig),
hp AS (
  SELECT sig_a, sig_b, bit_count(xor(sig_a, sig_b)) AS hamming
  FROM sigpairs WHERE bit_count(xor(sig_a, sig_b)) <= {MAXH}),
cross_pairs AS (
  SELECT least(ia.doc_id, ib.doc_id) AS id_a,
         greatest(ia.doc_id, ib.doc_id) AS id_b, hp.hamming
  FROM hp JOIN sig ia ON ia.sig = hp.sig_a JOIN sig ib ON ib.sig = hp.sig_b),
within AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
  FROM sig a JOIN sig b ON a.sig = b.sig AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM cross_pairs
UNION ALL
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM within
"""

ora = sorted(map(tuple, con.sql(sql).fetchall()))
eng = sorted(map(tuple, con.sql(
    f"SELECT id_a, id_b, hamming FROM '{DUMP}/p33_simhash_pairs/*.parquet'"
).fetchall()))
print(f"oracle rows={len(ora)} engine rows={len(eng)}")
if ora == eng:
    print("MATCH")
else:
    so, se = set(ora), set(eng)
    print("only-oracle:", sorted(so - se)[:5])
    print("only-engine:", sorted(se - so)[:5])
