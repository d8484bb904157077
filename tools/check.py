#!/usr/bin/env python3
"""Dev-only local correctness harness (mirrors the driver's DuckDB
oracle compare). NOT part of the shipped library — uses the
driver-side python stack (duckdb/pyarrow/pandas) to iterate fast
before each round's official verify.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
  <outDir> must contain <name>/ parquet dirs written by graft.Verify
  plus oracle_sql.json.
"""
import sys, json, glob, math, struct
import duckdb
import pandas as pd

def load_spark_result(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).fetchdf()

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a is b:
        return True
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            if pd.isna(a) != pd.isna(b):
                return False
            # Bit-faithful compare, mirroring the driver's hash layer:
            # -0.0 != +0.0 (r11's ml_corr_pairs failure class).
            return struct.pack("<d", float(a)) == struct.pack("<d", float(b))
        except (TypeError, ValueError):
            return False
    return a == b


def selftest():
    """Gate self-test: the compare must distinguish -0.0 from +0.0."""
    assert values_equal(0.0, 0.0)
    assert values_equal(-0.0, -0.0)
    assert not values_equal(-0.0, 0.0), "gate is blind to sign of zero"
    assert not values_equal(0.0, -0.0), "gate is blind to sign of zero"
    assert values_equal(float("nan"), float("nan"))
    assert not values_equal(1.0, 1.0000000000000002)
    assert values_equal(1, 1.0)
    assert values_equal(None, None)
    print("selftest OK: -0.0 != +0.0, nan==nan, exact-bits floats")

def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
        return
    selftest()  # always run: a blind gate is worse than a slow one
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got = load_spark_result(f"{out_dir}/{name}")
        if got is None:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns differ spark={list(g.columns)} duckdb={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} duckdb={len(e)}")
            n_fail += 1
            continue
        mismatch = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not values_equal(x, y):
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col={c} row={i} spark={x!r} duckdb={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
