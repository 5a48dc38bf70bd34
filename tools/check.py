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
                    bad = ~((a == b) | (a.isna() & b.isna()))
                    if bad.any():
                        d = (a - b).abs().max()
                        print(f"FAIL {name}: col {c} float mismatch maxdiff={d}")
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
