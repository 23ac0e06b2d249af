#!/usr/bin/env python3
"""Regression test for check.py's whitespace-class canary (review
r15): Java's regex \\s includes U+000B (vertical tab), RE2's does
not, so every '\\s+'-tokenizing oracle replay diverges on a corpus
containing VT. Feeds check.py a documents table carrying a VT and
asserts the gate fails LOUDLY up front; a VT-free corpus passes.

Run: python3 tools/test_ws_canary.py  (exit 0 = canary works)
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
    tmp = tempfile.mkdtemp(prefix="wscanary_")
    try:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        os.makedirs(os.path.join(out_dir, "ws_count"))
        con = duckdb.connect()
        vals = ", ".join(
            "({}, '{}' || chr({}))".format(i, t.replace("'", "''"), cp)
            for i, (t, cp) in enumerate(texts))
        for t in check.TABLES:
            con.execute(
                f"COPY (SELECT * FROM (VALUES {vals}) v(doc_id, text)) "
                f"TO '{sf_dir}/{t}.parquet' (FORMAT PARQUET)")
        con.execute(
            f"COPY (SELECT CAST({len(texts)} AS BIGINT) AS n) TO "
            f"'{out_dir}/ws_count/part-0.parquet' (FORMAT PARQUET)")
        json.dump({"ws_count": "SELECT count(*) AS n FROM documents"},
                  open(os.path.join(out_dir, "oracle_sql.json"), "w"))
        return check.main(sf_dir, out_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    # a vertical tab anywhere in the corpus must trip the canary
    rc_vt = run_case([("broken", 11), ("plain ascii", 33)])
    # ordinary whitespace (tab, newline) replays fine
    rc_ok = run_case([("tabbed", 9), ("newlined", 10)])
    ok = rc_vt != 0 and rc_ok == 0
    print(f"ws-canary regression: vt rc={rc_vt} (want !=0), clean "
          f"rc={rc_ok} (want 0) -> {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
