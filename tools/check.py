#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (graft.Verify output), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
sfDir tables, sorts columns by name + rows by all columns, and compares
values exactly (floats: exact bits, with near-miss diagnostics).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob, os
    produced = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)
    )
    for name in produced:
        if name not in oracles:
            print(f"[rows-only] {name}: no oracle")
            continue
        try:
            mine = norm(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            ref = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        ok = True
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            ok = False
        elif len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            ok = False
        else:
            for c in mine.columns:
                a, b = mine[c], ref[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    # BITWISE equality, like the driver's byte-level hash:
                    # `a == b` would call -0.0 equal to +0.0 (exactly the
                    # r10 q205 escape). NaNs compare equal to each other
                    # (parquet normalizes the payload), nulls to nulls.
                    import numpy as np
                    av = a.astype("float64").to_numpy()
                    bv = b.astype("float64").to_numpy()
                    same_bits = av.view("int64") == bv.view("int64")
                    both_nan = np.isnan(av) & np.isnan(bv)
                    both_null = (a.isna() & b.isna()).to_numpy()
                    bad = ~(same_bits | both_nan | both_null)
                    if bad.any():
                        i = int(np.argmax(bad))
                        d = np.nanmax(np.abs(av - bv))
                        print(f"FAIL {name}: col {c} float BITWISE mismatch "
                              f"row {i}: {av[i]!r} vs {bv[i]!r} (maxdiff={d})")
                        ok = False
                else:
                    eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
                    if not eq.all():
                        i = (~eq).idxmax()
                        print(f"FAIL {name}: col {c} row {i}: {a[i]!r} vs {b[i]!r}")
                        ok = False
        if ok:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    missing = sorted(set(oracles) - set(produced))
    for name in missing:
        print(f"FAIL {name}: no parquet output produced")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(missing)} missing")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
