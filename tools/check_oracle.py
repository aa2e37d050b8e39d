#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark output) and runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
then compares: schema column names (sorted), row count, and exact values
after sorting columns by name and rows by all columns.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp cols to ns for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.reset_index(drop=True)


def eq_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # order-sensitive compare first; on mismatch retry with both
        # frames sorted by all columns (queries without a deterministic
        # total ORDER BY would otherwise fail nondeterministically)
        def mismatches(g, w):
            out = []
            for c in g.columns:
                gv, wv = g[c].tolist(), w[c].tolist()
                bad = [i for i in range(len(gv)) if not eq_cell(gv[i], wv[i])]
                if bad:
                    out.append((c, bad[:3], [(gv[i], wv[i]) for i in bad[:3]]))
            return out
        mism = mismatches(got, want)
        order_drift = False
        if mism:
            # object columns with None/mixed types can make sort_values
            # raise — fall through to the normal FAIL report then
            try:
                cols = list(got.columns)
                got_s = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
                want_s = want.sort_values(cols, kind="mergesort").reset_index(drop=True)
                if not mismatches(got_s, want_s):
                    mism = []
                    order_drift = True
            except TypeError:
                pass
        if not mism and order_drift:
            # rows match only after sorting: every query carries a
            # deterministic total ORDER BY, so drift means a broken sort
            # — a FAILURE, visible in the exit code, not just stdout
            print(f"FAIL {name}: ORDER DRIFT (rows match only after sorting)")
            n_fail += 1
        elif not mism:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: value mismatches {mism[:2]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
