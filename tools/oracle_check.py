#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet produced by graft.Verify plus
<out>/oracle_sql.json, runs each oracle SQL in DuckDB against the fixture
parquet tables, and hash-compares (columns sorted by name, values rounded
like the driver). Exit 1 if any query mismatches.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats rounded, timestamps -> iso us
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.floor("us").astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            # The driver's comparator crashes on list cells (pandas can't
            # sort/hash ndarray values). Mirror that strictness: reject any
            # array-typed output column instead of silently tolerating it.
            if s.apply(lambda v: isinstance(v, (np.ndarray, list))).any():
                raise TypeError(
                    f"array-typed output column '{c}' — driver comparator "
                    "would fail; serialize it to a scalar (array_join/to_json)")
            out[c] = s
        else:
            out[c] = s
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return pd.util.hash_pandas_object(out.astype(str), index=False).sum()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures, passes, skipped = [], [], []
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            failures.append((name, "no parquet emitted"))
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            skipped.append((name, len(spark_df)))
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            failures.append((name, f"schema mismatch spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"))
            continue
        if len(spark_df) != len(duck_df):
            failures.append((name, f"rowcount spark={len(spark_df)} duck={len(duck_df)}"))
            continue
        try:
            if canon(spark_df) != canon(duck_df):
                failures.append((name, "hash mismatch"))
                continue
        except TypeError as e:
            failures.append((name, str(e)))
            continue
        passes.append(name)
    print(f"PASS {len(passes)}: {passes}")
    print(f"SKIP (no oracle) {len(skipped)}: {skipped}")
    if failures:
        print(f"FAIL {len(failures)}:")
        for n, why in failures:
            print(f"  {n}: {why}")
        sys.exit(1)

if __name__ == "__main__":
    main()
