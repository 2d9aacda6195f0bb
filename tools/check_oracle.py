#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name, compare row sets. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Driver parity (round-9 hardening, after the round-8 incident — 10 queries
shipped gate-green locally and hash-red in the driver):

  * EXACT value comparison — floats by repr (full 17 digits), no
    round(v, 9); SQL NULL and float NaN are DISTINCT (native fetchall(),
    not pandas, so NaN is never coerced to NULL);
  * ASYMMETRIC type canonicalization, modeling the driver: the SPARK
    result parquet is read type-preserving (a DECIMAL(38,6) value hashes
    as '0.544500'), while the ORACLE side goes through a float-coercing
    frame (DECIMAL -> float64 -> '0.5445'). This is exactly why the 10
    round-8 cards failed: Spark parses `10000.0` as DECIMAL, so
    `floor(x*10000.0/y+0.5)/10000` emits DECIMAL(38,6) scale-6 strings,
    while DuckDB's floor() returns DOUBLE. A scale-preserving spark-side
    decimal only matches when its string form equals the float's repr.
  * RATCHET (UNIVERSAL since round 10): every query must
    emit NO float and NO fractional-scale decimal columns on the Spark
    side — BIGINT basis points / integer grids only (the q247
    threshold_bp / q261 ppm convention). The round-9
    grandfather clause is GONE: the whole surface was migrated to exact
    cents/basis-point integers in round 10, removing the last
    environment-sensitivity class (float repr and summation-order luck).
"""
import glob
import json
import os
import re
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries declared at/after this number fall under the strict
# output-typing contract (PLANS.md "cross-engine replay rules").
RATCHET_FROM = 1

FLOATY = ("DOUBLE", "FLOAT", "REAL")


def canon(v):
    """Canonical value string. Prefix-free across int/decimal/float so a
    DECIMAL(12,2) '123.45' matches a float 123.45 — but '0.544500'
    (scale 6) does NOT match '0.5445', which is the driver's behavior."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return repr(v)  # exact: repr round-trips IEEE754; NaN stays 'nan'
    if isinstance(v, Decimal):
        return str(v)  # scale-preserving: Decimal('0.500000') != 0.5
    return str(v)


def fetch(con, sql, coerce_decimal_to_float):
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    if coerce_decimal_to_float:  # the driver's oracle side is a
        # float-coercing frame: decimals lose their scale
        sel = ", ".join(
            f'CAST("{c}" AS DOUBLE) AS "{c}"' if t.startswith("DECIMAL")
            else f'"{c}"' for c, t in zip(cols, types))
        rel = rel.project(sel)
        types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(canon(r[i]) for i in order) for r in rows])


def qnum(name):
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 10**9  # unnumbered: treat as new


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # declared-surface hygiene: q-numbers must be unique (a duplicated
    # number means two queries silently share an identity in the docs;
    # missing result dirs / rows-only dirs are reported per-query below)
    nums = [qnum(n) for n in oracle if qnum(n) < 10**9]
    dup_nums = sorted({n for n in nums if nums.count(n) > 1})
    if dup_nums:
        print(f"FAIL <surface>: duplicated query numbers {dup_nums}")
        n_fail += 1
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result")
            n_fail += 1
            continue
        try:
            ocols, otypes, orows = fetch(con, sql,
                                         coerce_decimal_to_float=True)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        scols, stypes, srows = fetch(
            con, f"SELECT * FROM read_parquet('{res_dir}/*.parquet')",
            coerce_decimal_to_float=False)
        if ocols != scols:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        # Type IDENTITY (round-11 hardening, after the round-10 incident —
        # 25 queries shipped value-identical but driver-hash-red because
        # DuckDB widens sum(BIGINT) to HUGEINT and the driver formats
        # HUGEINT differently from BIGINT). The round-8 DECIMAL-vs-DOUBLE
        # incident was the same class. Close the CLASS: the oracle's
        # declared output types must equal the Spark parquet's types
        # column-for-column; any drift (HUGEINT, DECIMAL scale, INT32 vs
        # INT64) fails here instead of at the driver.
        if otypes != stypes:
            diff = [(c, o, s) for c, o, s in zip(ocols, otypes, stypes)
                    if o != s]
            print(f"FAIL {name}: oracle/spark type mismatch {diff} — "
                  "cast the oracle column (e.g. CAST(sum(..) AS BIGINT); "
                  "DuckDB widens integer sums to HUGEINT)")
            n_fail += 1
            continue
        if qnum(name) >= RATCHET_FROM:
            bad = [c for c, t in zip(scols, stypes)
                   if t in FLOATY or
                   (t.startswith("DECIMAL") and not t.endswith(",0)"))]
            if bad:
                print(f"FAIL {name}: output column(s) {bad} are float or "
                      "fractional decimal — queries >= q{0} must emit "
                      "BIGINT basis points / integer grids "
                      "(PLANS.md output-typing contract)".format(RATCHET_FROM))
                n_fail += 1
                continue
        # the round-8 failure class, caught structurally: a Spark-side
        # fractional decimal can only hash-match a float oracle column by
        # string luck — flag it loudly even on legacy queries
        risky = [c for c, st, ot in zip(scols, stypes, otypes)
                 if st.startswith("DECIMAL") and not st.endswith(",0)")
                 and ot in FLOATY]
        if risky:
            print(f"WARN {name}: spark DECIMAL vs oracle DOUBLE on {risky} "
                  "— scale-6 strings rarely replay; re-type to BIGINT bp")
        orows.sort()
        srows.sort()
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
