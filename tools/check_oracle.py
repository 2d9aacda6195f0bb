#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name, compare row sets. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"  # pandas represents SQL NULL doubles as NaN
        return f"{round(v, 9):.9f}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        otypes = [str(odf[c].dtype) for c in ocols]
        stypes = [str(sdf[c].dtype) for c in ocols]
        if otypes != stypes:
            print(f"WARN {name}: dtypes differ {list(zip(ocols, otypes, stypes))}")
        orows = sorted(tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False))
        srows = sorted(tuple(norm(v) for v in r) for r in sdf[ocols].itertuples(index=False))
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        if orows != srows:
            bad = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    # rows-only queries
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"ROWS {d}: {n} rows {'(OK)' if n > 0 else '(EMPTY!)'}")
            except Exception as e:
                print(f"ROWS {d}: unreadable: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
