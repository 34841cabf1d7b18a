#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name and rows by all columns, and compares values
exactly (python ==). Reports per-query PASS/FAIL plus first differing cell.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    try:
        if a == b:
            return True
    except Exception:
        pass
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    # a query whose Verify run threw writes NO output dir — without this, a
    # crashed query silently shrinks the totals instead of failing the gate
    dumped = {q.rstrip("/").split("/")[-1] for q in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL  {name}: oracle declared but no Verify output (query threw?)")
        n_fail += 1
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        spark_files = glob.glob(f"{qdir}/*.parquet")
        if not spark_files:
            print(f"FAIL  {name}: no spark parquet output")
            n_fail += 1
            continue
        sres = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
        if name not in oracle:
            ok = len(srows) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: rows-only check, "
                  f"{len(srows)} rows")
            n_rowsonly += ok
            n_fail += (not ok)
            continue
        try:
            ores = con.execute(oracle[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} != {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: {len(sr)} rows vs oracle {len(orr)}")
            n_fail += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(sr, orr)):
            for j, (x, y) in enumerate(zip(ra, rb)):
                if not cells_equal(x, y):
                    bad = (i, sc[j], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL  {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n== {n_pass} hash-match PASS, {n_rowsonly} rows-only, "
          f"{n_fail} FAIL ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
