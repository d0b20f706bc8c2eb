#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [query...]

For each query in oracle_sql.json: run the SQL in DuckDB over the sf tables,
read the Spark parquet dump, sort columns by name + rows by all columns, and
compare exactly and with rounding. Reports PASS/PASS~ROUND/FAIL per query.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # duckdb returns float32 lists / decimals sometimes; unify
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except Exception:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df, verbose=False):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return "FAIL", f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return "FAIL", f"row counts differ: spark={len(a)} duck={len(b)}"
    exact = a.equals(b)
    if exact:
        return "PASS", f"{len(a)} rows exact"
    # approx compare for floats
    issues = []
    approx_ok = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype(float).to_numpy()
            bvf = bv.astype(float).to_numpy()
            both_nan = np.isnan(avf) & np.isnan(bvf)
            close = np.isclose(avf, bvf, rtol=1e-9, atol=1e-9) | both_nan
            if not close.all():
                approx_ok = False
                i = int(np.argmin(close))
                issues.append(f"col {c} row {i}: spark={avf[i]!r} duck={bvf[i]!r}")
            elif not (av.equals(bv)):
                issues.append(f"col {c}: only-approx equal (ulp drift)")
        else:
            if not av.equals(bv):
                neq = (av.astype(str) != bv.astype(str))
                i = int(np.argmax(neq.to_numpy()))
                approx_ok = False
                issues.append(f"col {c} row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    if approx_ok:
        return "PASS~ROUND", "; ".join(issues)[:300]
    return "FAIL", "; ".join(issues)[:500]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    dumped = {os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)}
    for name in sorted(dumped):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"{name:28s} FAIL  (no spark output)")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "FAIL"
            print(f"{name:28s} {status}  ({len(spark_df)} rows, no oracle)")
            n_pass += status == "ROWS-ONLY"
            n_fail += status == "FAIL"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name:28s} FAIL  oracle SQL error: {e}")
            n_fail += 1
            continue
        status, msg = compare(name, spark_df, duck_df)
        print(f"{name:28s} {status}  {msg}")
        if status == "FAIL":
            n_fail += 1
        else:
            n_pass += 1
    missing = set(oracle) - dumped
    for m in sorted(missing):
        print(f"{m:28s} FAIL  (oracle declared, no spark dump)")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
