#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

NOT part of the shipped library (driver-side python tooling only): runs after
`graft.Verify` dumped each query's result parquet + oracle_sql.json, then
executes every oracle SQL in DuckDB over the same fixture tables and compares
row count, column names, and values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # comparison is EXACT (bit equality), matching the driver's value
        # hashing — a FAIL here can be last-ulp noise, which the engine-side
        # fix is deterministic decimal sums (graft.operators.Agg), not a
        # tolerance here
        return v
    return v


def rows_equal(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        cx, cy = canon(x), canon(y)
        if isinstance(cx, float) and isinstance(cy, float):
            if cx != cy:
                return False
        elif cx != cy:
            return False
    return True


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = got.columns
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns differ\n  spark: {sorted(got_cols)}\n  duck:  {sorted(exp_cols)}")
            n_fail += 1
            continue
        g = [tuple(r[i] for i in gi) for r in got_rows]
        e = [tuple(r[i] for i in ei) for r in exp_rows]
        # driver compare is order-sensitive post-sort; we sort rows to be safe
        g_s, e_s = sorted(g, key=repr), sorted(e, key=repr)
        if len(g) != len(e):
            print(f"FAIL {name}: row count spark={len(g)} duck={len(e)}")
            n_fail += 1
        elif not rows_equal(g_s, e_s):
            bad = [(x, y) for x, y in zip(g_s, e_s) if not rows_equal([x], [y])][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for x, y in bad:
                print(f"  spark: {x}\n  duck:  {y}")
            n_fail += 1
        else:
            ordered = "rows-ordered-match" if g == e else "ROW-ORDER-DIFFERS"
            print(f"PASS {name}: {len(g)} rows [{ordered}]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
