#!/usr/bin/env python3
"""Regression test for check.py's oracle type-lint (r13 judge item #2).

The r13 gate-fidelity hole: DuckDB returns bare sum(BIGINT) as HUGEINT,
which check.py's fetchall() saw as an exact Python int (match) while
the driver's Arrow/pandas renderer hashes it as float64 ("913.0" vs
the engine's "913" → hash mismatch). This test feeds check.py an
engine dump + a bare-sum oracle whose VALUES are identical and asserts
the lint REJECTS it, and that the CAST-ed form of the same oracle
passes.

Run: python3 tools/test_check_typelint.py  (exit 0 = lint works)
"""
import json
import os
import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402


def run_case(sql):
    tmp = tempfile.mkdtemp(prefix="typelint_")
    try:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        os.makedirs(os.path.join(out_dir, "tl_sum"))
        con = duckdb.connect()
        # minimal stand-ins for every table check.py registers
        for t in check.TABLES:
            con.execute(
                f"COPY (SELECT 1 AS doc_id, CAST(913 AS BIGINT) AS v) "
                f"TO '{sf_dir}/{t}.parquet' (FORMAT PARQUET)")
        # engine dump: the int64 the Spark side would write
        con.execute(
            f"COPY (SELECT CAST(913 AS BIGINT) AS s) TO "
            f"'{out_dir}/tl_sum/part-0.parquet' (FORMAT PARQUET)")
        json.dump({"tl_sum": sql},
                  open(os.path.join(out_dir, "oracle_sql.json"), "w"))
        return check.main(sf_dir, out_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    # bare sum(BIGINT) → HUGEINT: values identical, must STILL fail
    rc_bare = run_case("SELECT sum(v) AS s FROM documents")
    # the sanctioned fix passes
    rc_cast = run_case("SELECT CAST(sum(v) AS BIGINT) AS s FROM documents")
    # DECIMAL literal column: also driver-divergent, must fail
    rc_dec = run_case("SELECT 913.0 AS s FROM documents LIMIT 1")
    ok = rc_bare != 0 and rc_cast == 0 and rc_dec != 0
    print(f"typelint regression: bare-sum rc={rc_bare} (want !=0), "
          f"cast rc={rc_cast} (want 0), decimal rc={rc_dec} (want !=0) "
          f"→ {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
