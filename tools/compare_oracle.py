#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB correctness gate.

NOT part of the engine (the Scala/Spark library never imports this) — it
mirrors what the driver does each round: run graft.Verify, execute each
oracle_sql.json entry in DuckDB over the same parquet tables, and compare
per query: schema (column names, sorted), row count, and values.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to naive pandas datetimes
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) \
                if getattr(df[c].dt, "tz", None) is not None else pd.to_datetime(df[c])
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, na_position="last").reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df

def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            if pd.isna(a) or pd.isna(b):
                return False
            return a == b or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except Exception:
            return False
    return a == b

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pq.read_table(files[0]).to_pandas())
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not values_equal(g, e):
                    bad = (c, i, g, e)
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: value mismatch col={c} row={i}: spark={g!r} oracle={e!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracled queries pass; "
          f"{len(glob.glob(out_dir + '/q*')) - len(oracle)} rows-only")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
