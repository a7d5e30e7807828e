#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet tables
and diff the results (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = pd.to_datetime(col).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif col.dtype == object:
            df[c] = col.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS: spark={len(a)} oracle={len(b)}"
    # dtype-KIND strictness: the driver hashes values, so int64 vs float64
    # ("123" vs "123.0") is a real mismatch even when numerically equal.
    # DuckDB sum(INTEGER/BIGINT) returns HUGEINT -> pandas float64; oracle
    # SQL must CAST such sums to BIGINT to match Spark's LongType.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
            return f"DTYPE[{c}]: spark={a[c].dtype} oracle={b[c].dtype} (int-vs-float hashes differently)"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
            exact_bad = ~((av == bv) | (av.isna() & bv.isna()))
            if exact_bad.any():
                i = exact_bad.idxmax()
                return (f"VALUE[{c}] row {i}: spark={av[i]!r} oracle={bv[i]!r} "
                        f"(float, diff={abs(av[i]-bv[i]) if pd.notna(av[i]) and pd.notna(bv[i]) else 'nan'})")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                return f"VALUE[{c}] row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        pq_dir = os.path.join(out_dir, name)
        if not os.path.isdir(pq_dir):
            results[name] = "MISSING spark output"
            continue
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        try:
            results[name] = compare(name, spark_df, oracle_df)
        except Exception as e:
            results[name] = f"COMPARE ERROR: {e}"
    n_ok = sum(1 for v in results.values() if v is None)
    for name, v in results.items():
        print(f"{'OK  ' if v is None else 'FAIL'} {name}" + (f"  -> {v}" if v else ""))
    print(f"\n{n_ok}/{len(results)} queries match")
    # queries without oracle
    dumped = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "q*")) if os.path.isdir(d)}
    no_oracle = dumped - set(oracles)
    if no_oracle:
        print(f"rows-only (no oracle): {sorted(no_oracle)}")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
