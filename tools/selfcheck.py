#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: for each query output
written by graft.Verify, run the corresponding oracle SQL in DuckDB over the
same sf directory and compare (schema-insensitive: columns sorted by name,
rows compared in full, doubles to 1e-9 relative or exact string match).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rel.fetchall():
        out.append(tuple(norm(row[i]) for i in order))
    return [cols[i] for i in order], out


def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got = rows_of(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            exp_cols, exp = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: {len(got)} rows != {len(exp)}")
            n_bad += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if not all(approx_eq(x, y) for x, y in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got {bad[1]}\n  exp {bad[2]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
