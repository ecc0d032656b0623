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
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_class(t: pa.DataType) -> str:
    """Collapse an arrow type to the class the driver's typed hash keys on.

    The round-2 blind spot: DuckDB SUM(BIGINT) -> HUGEINT arrives as
    decimal128(38,0); pandas coerces Decimal(774) == int 774 so values_equal
    passed locally while the driver's typed hash failed. Distinguish the
    classes (int vs decimal vs float vs ...) but not widths within a class
    (int32 vs int64 both render as plain ints driver-side).
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    # date and timestamp are ONE class: q49/q50 ship spark timestamp vs
    # duckdb date and were hash-green in CORRECTNESS_r02 — the driver
    # normalizes datetimes before hashing, so the local gate must too.
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{dtype_class(t.value_type)}>"
    return str(t)


def dtype_mismatches(spark_tbl: pa.Table, oracle_tbl: pa.Table):
    """Compare arrow column type classes by (sorted) column name."""
    s = {f.name: dtype_class(f.type) for f in spark_tbl.schema}
    o = {f.name: dtype_class(f.type) for f in oracle_tbl.schema}
    return [(c, s[c], o[c]) for c in sorted(set(s) & set(o)) if s[c] != o[c]]

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
    import numpy as np
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        if not (isinstance(a, (list, tuple, np.ndarray)) and
                isinstance(b, (list, tuple, np.ndarray))):
            return False
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
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
        got_tbl = pq.read_table(files[0])
        got = canon(got_tbl.to_pandas(date_as_object=False))
        try:
            exp_tbl = con.execute(oracle[name]).arrow()
            exp = canon(exp_tbl.to_pandas(date_as_object=False))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        dt_bad = dtype_mismatches(got_tbl, exp_tbl)
        if dt_bad:
            c, sg, og = dt_bad[0]
            print(f"FAIL {name}: dtype mismatch col={c}: spark={sg} oracle={og} "
                  f"(driver's typed hash would diverge)")
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
