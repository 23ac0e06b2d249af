#!/usr/bin/env python3
"""Regression test for check.py's oracle-side lowercasing canary
(r12/r13 judge item #6, oracle half).

Feeds check.py a documents table containing mixed-case Turkish and
Greek text whose Java-contextual lowercase diverges from DuckDB's
simple per-codepoint lower() (İstanbul → i+U+0307..., word-final
ΟΔΟΣ → ...ς) and asserts the gate fails LOUDLY up front; then proves
a pre-lowercased corpus passes.

Run: python3 tools/test_lower_canary.py  (exit 0 = canary works)
"""
import json
import os
import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402


def run_case(texts):
    tmp = tempfile.mkdtemp(prefix="lowercanary_")
    try:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        os.makedirs(os.path.join(out_dir, "lc_count"))
        con = duckdb.connect()
        vals = ", ".join(
            "({}, '{}')".format(i, t.replace("'", "''"))
            for i, t in enumerate(texts))
        for t in check.TABLES:
            con.execute(
                f"COPY (SELECT * FROM (VALUES {vals}) v(doc_id, text)) "
                f"TO '{sf_dir}/{t}.parquet' (FORMAT PARQUET)")
        con.execute(
            f"COPY (SELECT CAST({len(texts)} AS BIGINT) AS n) TO "
            f"'{out_dir}/lc_count/part-0.parquet' (FORMAT PARQUET)")
        json.dump({"lc_count": "SELECT count(*) AS n FROM documents"},
                  open(os.path.join(out_dir, "oracle_sql.json"), "w"))
        return check.main(sf_dir, out_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    # mixed-case Turkish dotted-I: contextual lower emits a combining
    # dot DuckDB's simple mapping does not — must trip the canary
    rc_tr = run_case(["I live in İstanbul", "plain ascii"])
    # word-final capital sigma: Java emits ς, DuckDB σ — must trip
    rc_gr = run_case(["ΟΔΟΣ ends words", "plain ascii"])
    # mid-word sigma and pre-lowercased Greek/Turkish both replay fine
    rc_ok = run_case(["ΣΩΜΑ leads fine? no: pre-lowercased σώμα και",
                      "istanbul'da yaşıyorum"])
    ok = rc_tr != 0 and rc_gr != 0 and rc_ok == 0
    print(f"lower-canary regression: turkish rc={rc_tr} (want !=0), "
          f"final-sigma rc={rc_gr} (want !=0), clean rc={rc_ok} "
          f"(want 0) → {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
