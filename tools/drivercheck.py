#!/usr/bin/env python3
"""Exact replica of the driver's correctness compare (zero tolerance).

Reads each query's Spark parquet output and its DuckDB oracle result as
pandas DataFrames, sorts columns by name, sorts rows by all columns, and
compares cell-by-cell EXACTLY (no float tolerance) — like the driver's
hash compare. Reports the first differing cell with full repr + dtype so
the root cause (value drift vs type drift) is visible.

Usage: python3 tools/drivercheck.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver's observed tolerance (round-1 evidence): int width
    # differences and date-vs-timestamp-midnight hash EQUAL; int-vs-float
    # hashes DIFFERENT; floats compare exactly. Normalize only what the
    # driver tolerates, so local green == driver green.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and all(
                type(v).__name__ == "date" for v in df[c].dropna().head(5)):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; ScaleUp replicas are Spark
        # output DIRECTORIES — glob their part files in that case
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = canon(pd.concat([pd.read_parquet(f) for f in files],
                                  ignore_index=True))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: {len(got)} rows != {len(exp)}")
            n_bad += 1
            continue
        diff = None
        for c in got.columns:
            g, e = got[c], exp[c]
            for i in range(len(g)):
                gv, ev = g.iloc[i], e.iloc[i]
                if pd.isna(gv) and pd.isna(ev):
                    continue
                # The driver hashes RAW BYTES, so -0.0 != +0.0 there even
                # though Python/pandas equality says equal (the r14
                # emb_corr_matrix red: Spark round() canonicalizes the
                # zero sign, DuckDB's preserves it). Compare sign bits.
                # numpy-aware: a float32 column yields np.float32 cells,
                # which are NOT isinstance(float) — plain-float detection
                # would reopen the exact blind spot this check closes.
                if (isinstance(gv, (float, np.floating))
                        and isinstance(ev, (float, np.floating))
                        and gv == ev == 0.0
                        and math.copysign(1.0, gv) != math.copysign(1.0, ev)):
                    diff = (c, i, gv, ev, g.dtype, e.dtype)
                    break
                if gv != ev or type(gv).__name__ != type(ev).__name__:
                    diff = (c, i, gv, ev, g.dtype, e.dtype)
                    break
            if diff:
                break
        if diff:
            c, i, gv, ev, gd, ed = diff
            print(f"FAIL {name}: col={c} row={i}\n"
                  f"  got {gv!r} ({type(gv).__name__}/{gd})\n"
                  f"  exp {ev!r} ({type(ev).__name__}/{ed})")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
