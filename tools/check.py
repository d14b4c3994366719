#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (graft.Verify output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same fixture
tables, and compares: schema (sorted column names), row count, and values
(rows sorted by all columns, compared exactly; timestamps normalized to
microseconds). Dev-only tool — mirrors what the driver does each round.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.floor("us")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, spark_df, duck_df):
    # dtype parity first: the driver hashes typed values, so int32 vs int64
    # or datetime64[ns] vs [us] can fail even when values are equal
    for c in sorted(spark_df.columns):
        if c in duck_df.columns and str(spark_df[c].dtype) != str(duck_df[c].dtype):
            return (f"DTYPE col={c} spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
    a, b = norm_df(spark_df), norm_df(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float); bv = bv.astype(float)
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        if bad.any():
            i = bad.idxmax()
            return (f"VALUE col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r} "
                    f"({int(bad.sum())} mismatched rows)")
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracles):
        pdir = Path(out_dir, name)
        if not pdir.exists():
            results[name] = "MISSING spark output"
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in sorted(pdir.glob("*.parquet"))],
                ignore_index=True)
        except Exception as e:
            results[name] = f"READ-ERR {e}"
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERR {type(e).__name__}: {e}"
            continue
        results[name] = compare(name, spark_df, duck_df) or "OK"
    # rows-only queries (no oracle): check non-empty
    for pdir in sorted(Path(out_dir).iterdir()):
        if pdir.is_dir() and pdir.name not in oracles:
            try:
                n = sum(len(pd.read_parquet(p)) for p in pdir.glob("*.parquet"))
                results[pdir.name] = f"OK (rows-only, {n} rows)" if n > 0 else "EMPTY (rows-only)"
            except Exception as e:
                results[pdir.name] = f"READ-ERR {e}"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} OK")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
