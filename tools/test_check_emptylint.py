#!/usr/bin/env python3
"""Regression test for check.py's empty-oracle lint (r15 judge item #1).

The a23 lesson: a gate whose oracle returns 0 rows books as pass:true
while proving only schema agreement — a23_setops shipped three rounds
of constant-empty EXCEPT operands that way. This test feeds check.py
an empty engine dump + an empty oracle (values "identical") and asserts
the lint REJECTS it, and that the same gate with one real row passes.

Run: python3 tools/test_check_emptylint.py  (exit 0 = lint works)
"""
import json
import os
import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402


def run_case(where_sql):
    """Gate = SELECT v FROM documents WHERE <where_sql>; the engine
    dump is built by DuckDB itself from the same predicate, so engine
    and oracle agree exactly — only row count varies between cases."""
    tmp = tempfile.mkdtemp(prefix="emptylint_")
    try:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        os.makedirs(os.path.join(out_dir, "el_gate"))
        con = duckdb.connect()
        for t in check.TABLES:
            con.execute(
                f"COPY (SELECT 1 AS doc_id, CAST(913 AS BIGINT) AS v) "
                f"TO '{sf_dir}/{t}.parquet' (FORMAT PARQUET)")
        sql = f"SELECT v FROM documents WHERE {where_sql}"
        con.execute(
            f"COPY (SELECT v FROM '{sf_dir}/documents.parquet' "
            f"WHERE {where_sql}) TO "
            f"'{out_dir}/el_gate/part-0.parquet' (FORMAT PARQUET)")
        json.dump({"el_gate": sql},
                  open(os.path.join(out_dir, "oracle_sql.json"), "w"))
        return check.main(sf_dir, out_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    # empty-vs-empty: rows/schema/hash all "match", must STILL fail
    rc_empty = run_case("v < 0")
    # the same gate with one real row passes
    rc_row = run_case("v = 913")
    ok = rc_empty != 0 and rc_row == 0
    print(f"emptylint regression: empty rc={rc_empty} (want !=0), "
          f"non-empty rc={rc_row} (want 0) "
          f"→ {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
