#!/usr/bin/env python3
"""Self-test for the pandas-semantics correctness mirror.

Seeds the two round-10 driver-failure signatures and asserts the gate now
CATCHES them (it used to pass both):

  1. HUGEINT leak: oracle `sum()` (HUGEINT -> float64 via fetchdf) vs a
     bit-identical int64 Spark output  -> must FAIL, not PASS.
  2. Array-typed gated output          -> must ERR (pandas sort_values
     throws), not PASS.
  3. A clean int64/int64 query         -> must PASS (no false alarms).

Run: python3 tools/test_check_correctness.py
"""
import io
import json
import os
import sys
import tempfile
from contextlib import redirect_stdout

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_correctness as cc  # noqa: E402


def run_gate(sf_dir, out_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cc.main(sf_dir, out_dir)
    return rc, buf.getvalue()


def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf")
        out = os.path.join(tmp, "out")
        os.makedirs(sf)
        # minimal table set for the mirror's CREATE VIEW preamble
        for t in cc.TABLES:
            pd.DataFrame({"doc_id": pd.array([1, 2, 3], dtype="int64")}) \
                .to_parquet(os.path.join(sf, f"{t}.parquet"))

        # 1. HUGEINT leak: DuckDB sum() over BIGINT yields HUGEINT;
        #    fetchdf() renders float64; Spark twin is int64.
        os.makedirs(os.path.join(out, "seed_hugeint"))
        pd.DataFrame({"doc_id": pd.array([1, 2, 3], dtype="int64"),
                      "n": pd.array([10, 20, 30], dtype="int64")}) \
            .to_parquet(os.path.join(out, "seed_hugeint", "p.parquet"))
        # 2. array column in the gated output.
        os.makedirs(os.path.join(out, "seed_array"))
        pd.DataFrame({"doc_id": pd.array([1, 2], dtype="int64"),
                      "idx": [[1, 2], [3]]}) \
            .to_parquet(os.path.join(out, "seed_array", "p.parquet"))
        # 3. clean control: both sides int64.
        os.makedirs(os.path.join(out, "seed_clean"))
        pd.DataFrame({"doc_id": pd.array([1, 2, 3], dtype="int64"),
                      "n": pd.array([5, 5, 5], dtype="int64")}) \
            .to_parquet(os.path.join(out, "seed_clean", "p.parquet"))

        json.dump({
            "seed_hugeint":
                "SELECT doc_id, sum(doc_id * 10) AS n FROM documents "
                "GROUP BY doc_id ORDER BY doc_id",
            "seed_array":
                "SELECT doc_id, [doc_id, doc_id + 1] AS idx FROM documents "
                "WHERE doc_id <= 2 ORDER BY doc_id",
            "seed_clean":
                "SELECT doc_id, CAST(sum(5) AS BIGINT) AS n FROM documents "
                "GROUP BY doc_id ORDER BY doc_id",
        }, open(os.path.join(out, "oracle_sql.json"), "w"))

        rc, log = run_gate(sf, out)
        ok = True
        if rc == 0:
            print("SELF-TEST FAIL: gate returned 0 on seeded failures")
            ok = False
        if "FAIL  seed_hugeint" not in log:
            print("SELF-TEST FAIL: HUGEINT leak not caught:\n" + log)
            ok = False
        if "ERR   seed_array" not in log and "FAIL  seed_array" not in log:
            print("SELF-TEST FAIL: array column not caught:\n" + log)
            ok = False
        if "PASS  seed_clean" not in log:
            print("SELF-TEST FAIL: clean control did not pass:\n" + log)
            ok = False
        if ok:
            print("SELF-TEST PASS: HUGEINT leak FAILs, array column ERRs, "
                  "clean control PASSes")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
