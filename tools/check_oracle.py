#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the corresponding oracle SQL in
DuckDB over the same parquet tables, then compares the two results as sets:
columns sorted by name, rows sorted by all values, exact value equality
(floats compared exactly — queries are designed to be bit-stable via
rounding / integer arithmetic).
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC so Spark/DuckDB timestamps compare equal
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else
                (tuple(v) if isinstance(v, list) else v))
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = normalize(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = normalize(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = False
        # The driver's hash is dtype-sensitive (r7: DuckDB HUGEINT sums
        # reach pandas as float64 and hash-mismatch int64 Spark columns
        # even when every value is equal) and its comparator cannot sort
        # list/array columns. Mirror both gates here so the class is
        # caught locally, not by the round artifact.
        # Kind-level drift only: r7 showed int64-vs-float64 breaks the
        # driver's hash (HUGEINT→float64 coercion) while int32-vs-int64
        # and ns-vs-us datetimes hash equal — so compare dtype KIND
        # (int/uint unified), not width.
        def kind(d):
            return {"u": "i"}.get(d.kind, d.kind)
        dtype_mism = [
            (c, str(spark_df[c].dtype), str(duck_df[c].dtype))
            for c in spark_df.columns if c in duck_df.columns
            and kind(spark_df[c].dtype) != kind(duck_df[c].dtype)]
        arr_cols = [c for c in spark_df.columns
                    if spark_df[c].map(lambda v: isinstance(v, tuple)).any()]
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        elif dtype_mism:
            print(f"FAIL {name}: dtype drift (driver hash would mismatch): {dtype_mism}")
        elif arr_cols:
            print(f"FAIL {name}: array-typed output columns {arr_cols} "
                  f"(driver's pandas sort_values cannot order them)")
        else:
            try:
                pd.testing.assert_frame_equal(
                    spark_df, duck_df, check_dtype=False, check_exact=True)
                ok = True
            except AssertionError as e:
                print(f"FAIL {name}: {str(e).splitlines()[0]}")
                # NaN-aware mismatch mask: NaN == NaN for display purposes
                neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
                mism = neq.any(axis=1)
                print(spark_df[mism].head(3))
                print(duck_df[mism].head(3))
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    # queries with no oracle: rows-only check
    dumped = {d.rstrip("/").rsplit("/", 1)[-1]
              for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(dumped - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'ROWS' if n > 0 else 'FAIL'} {name}: {n} rows (no oracle)")
        if n == 0:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
