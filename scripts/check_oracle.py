#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir tables,
and compares: schema (column names, sorted), row count, and values (rows
sorted, columns sorted by name). Exact match required; floats reported with
max abs diff when close-but-not-equal.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in
                                  sorted(glob.glob(f"{pdir}/*.parquet"))])
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
        d = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        bad = []
        for c in s_cols:
            sv, dv = s[c], d[c]
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                diff = (sv.astype(float) - dv.astype(float)).abs()
                if not ((sv.isna() == dv.isna()).all() and
                        (diff.fillna(0) == 0).all()):
                    bad.append(f"{c} (maxdiff={diff.max():.3e})")
            else:
                svs, dvs = sv.astype(str), dv.astype(str)
                if not (svs == dvs).all():
                    ex = svs[svs != dvs].index[0]
                    bad.append(f"{c} (e.g. row {ex}: {sv[ex]!r} vs {dv[ex]!r})")
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracles total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
