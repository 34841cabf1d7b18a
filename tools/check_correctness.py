#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate — PANDAS SEMANTICS.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Round-10 lesson: a fetchall()-based compare (python ints, tolerant) passed
90/90 while the driver failed 3 — the driver compares via pandas, where
DuckDB HUGEINT surfaces as float64 and ARRAY columns crash sort_values
("unhashable type: 'numpy.ndarray'", the driver's own tp09 traceback).
This mirror reproduces those semantics exactly so the local gate can no
longer pass what the driver fails:

  * Spark side: duckdb read_parquet(...).fetchdf() over the query's output
    dir — NOT pandas.read_parquet: the driver's date-typed queries (q02,
    cdc10, cdc13) pass while HUGEINT fails, which is only consistent with
    both sides flowing through fetchdf (date32 -> datetime64[us] on both;
    pandas.read_parquet would yield object-dtype datetime.date and FAIL).
  * Oracle side: duckdb .fetchdf()  (HUGEINT -> float64, the driver path).
  * Both sides: columns sorted by name, then df.sort_values(by=all columns)
    — which THROWS on array/object columns, mirrored as ERR.
  * Compare: pandas.util.hash_pandas_object per sorted row — dtype-kind
    sensitive, so int64 64709 vs float64 64709.0 FAILS like the driver.
  * Dtype audit: any integer/float kind mismatch between the two sides, or
    any object column holding ndarray/list values, is reported explicitly.

Self-test: tools/test_check_correctness.py seeds a HUGEINT oracle and an
array-typed output and asserts this gate FAILS them.
"""
import glob
import json
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canonize(df):
    """Driver-shaped canonicalization: sort columns by name, rows by all
    columns. Raises on unsortable (array-valued) columns, like the driver.
    """
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def dtype_audit(name, sdf, odf):
    """Report the two r10 failure signatures before the hash compare."""
    issues = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if {sk, ok} == {"i", "f"} or {sk, ok} == {"u", "f"}:
            issues.append(
                f"col {c}: integral-vs-float dtype ({sdf[c].dtype} vs "
                f"{odf[c].dtype}) — HUGEINT leak? CAST the oracle to BIGINT")
    for side, df in (("spark", sdf), ("oracle", odf)):
        for c in df.columns:
            if df[c].dtype.kind == "O":
                nn = df[c].dropna()
                if len(nn) and isinstance(nn.iloc[0], (np.ndarray, list)):
                    issues.append(
                        f"col {c} ({side}): array-valued object column — "
                        f"pandas sort_values will throw; flatten the gated "
                        f"output (array_join / explode)")
    for msg in issues:
        print(f"      dtype-audit {name}: {msg}")
    return issues


def row_hashes(df):
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = n_err = 0
    # a query whose Verify run threw writes NO output dir — without this, a
    # crashed query silently shrinks the totals instead of failing the gate
    dumped = {q.rstrip("/").split("/")[-1] for q in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL  {name}: oracle declared but no Verify output (query threw?)")
        n_fail += 1
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        spark_files = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not spark_files:
            print(f"FAIL  {name}: no spark parquet output")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracle:
            ok = len(sdf) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: rows-only check, "
                  f"{len(sdf)} rows")
            n_rowsonly += ok
            n_fail += (not ok)
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} != "
                  f"{sorted(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: {len(sdf)} rows vs oracle {len(odf)}")
            n_fail += 1
            continue
        audit = dtype_audit(name, sdf, odf)
        try:
            sc, oc = canonize(sdf), canonize(odf)
        except Exception:
            print(f"ERR   {name}: pandas canonicalization threw (driver "
                  f"would record err):")
            print("      " + traceback.format_exc().strip()
                  .splitlines()[-1])
            n_err += 1
            continue
        hs, ho = row_hashes(sc), row_hashes(oc)
        if (hs == ho).all():
            if audit:
                # values matched but dtypes diverged in a way the driver's
                # hash may not forgive — treat as FAIL, it's always a bug
                print(f"FAIL  {name}: values equal but dtype audit flagged "
                      f"{len(audit)} issue(s) above")
                n_fail += 1
            else:
                print(f"PASS  {name}: {len(sc)} rows")
                n_pass += 1
            continue
        bad = int(np.argmax(hs != ho))
        diffs = [c for c in sc.columns
                 if not _cell_eq(sc[c].iloc[bad], oc[c].iloc[bad])]
        if diffs:
            col = diffs[0]
            print(f"FAIL  {name}: row {bad} col {col}: "
                  f"spark={sc[col].iloc[bad]!r} ({sc[col].dtype}) "
                  f"oracle={oc[col].iloc[bad]!r} ({oc[col].dtype})")
        else:
            # values compare equal but the pandas hash disagrees — a pure
            # dtype/representation divergence; show the dtype table
            pairs = ", ".join(f"{c}: {sc[c].dtype}/{oc[c].dtype}"
                              for c in sc.columns
                              if str(sc[c].dtype) != str(oc[c].dtype))
            print(f"FAIL  {name}: row {bad}: values equal but hashes "
                  f"differ; dtype diffs: {pairs or 'none visible'}")
        n_fail += 1
    print(f"\n== {n_pass} hash-match PASS, {n_rowsonly} rows-only, "
          f"{n_fail} FAIL, {n_err} ERR ==")
    return 1 if (n_fail or n_err) else 0


def _cell_eq(x, y):
    try:
        if pd.isna(x) and pd.isna(y):
            return True
    except (TypeError, ValueError):
        pass
    # dtype-kind sensitive on purpose: np.int64(5) == np.float64(5.0) is
    # True in numpy but hashes differently in pandas — report it as a diff
    if isinstance(x, (np.integer, int)) != isinstance(y, (np.integer, int)):
        return False
    try:
        return bool(x == y)
    except Exception:
        return str(x) == str(y)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
