#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
       python3 tools/check.py --selftest

Reads each <outDir>/<name> parquet (graft.Verify output), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
sfDir tables, sorts columns by name + rows by all columns, and compares
values exactly:

- floats: exact BITS (r10 incident: pandas `==` called -0.0 equal to
  +0.0 while the driver's byte hash did not), NaN==NaN, null==null
- timestamps/dates: canonicalized to int64 epoch MICROseconds before
  comparing (r9 incident class: engines render the same instant with
  different unit/precision/format — datetime64[ns] vs [us], trailing
  fractional zeros, pre-1970 negatives — so string compare drifts even
  when the instants are identical), NaT==NaT
- everything else: string compare with null==null

`--selftest` pins both known drift families with fixtures.
"""
import json
import sys

import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _canon_ts(s):
    """Series of timestamps/dates -> (int64 epoch values, unit, isna).
    Normalizes unit (ns/us/ms), tz (to UTC instants), and object-dtype
    datetime.date/datetime values. Prefers epoch-NS (full fidelity: a
    sub-microsecond difference must FAIL the gate) and falls back to
    epoch-US only when the values overflow the ns range (year 2262+,
    where sub-us components cannot exist in the source). NaT lands on
    int64 min in BOTH outputs, so NaT==NaT holds in the int compare."""
    v = pd.to_datetime(s)
    if getattr(v.dtype, "tz", None) is not None:
        v = v.dt.tz_convert("UTC").dt.tz_localize(None)
    na = v.isna().to_numpy()
    try:
        iv = v.astype("datetime64[ns]").to_numpy().view("int64")
        unit = "ns"
    except (OverflowError, ValueError, pd.errors.OutOfBoundsDatetime):
        iv = v.astype("datetime64[us]").to_numpy().view("int64")
        unit = "us"
    iv = np.where(na, np.iinfo("int64").min, iv)
    return iv, unit, na


def _is_dtlike(series):
    if series.dtype.kind == "M":
        return True
    if series.dtype == object:
        import datetime
        probe = series.dropna()
        if len(probe):
            return isinstance(probe.iloc[0], (datetime.date, datetime.datetime))
    return False


def col_equal(name, c, a, b):
    """Compare one column pair; returns (ok, message-or-None)."""
    if a.dtype.kind == "f" or b.dtype.kind == "f":
        # BITWISE equality, like the driver's byte-level hash: `a == b`
        # would call -0.0 equal to +0.0 (exactly the r10 q205 escape).
        # NaNs compare equal to each other (parquet normalizes the
        # payload), nulls to nulls.
        av = a.astype("float64").to_numpy()
        bv = b.astype("float64").to_numpy()
        same_bits = av.view("int64") == bv.view("int64")
        both_nan = np.isnan(av) & np.isnan(bv)
        both_null = (a.isna() & b.isna()).to_numpy()
        bad = ~(same_bits | both_nan | both_null)
        if bad.any():
            i = int(np.argmax(bad))
            d = np.nanmax(np.abs(av - bv))
            return False, (f"FAIL {name}: col {c} float BITWISE mismatch "
                           f"row {i}: {av[i]!r} vs {bv[i]!r} (maxdiff={d})")
        return True, None
    if _is_dtlike(a) or _is_dtlike(b):
        # canonical epoch-us compare: unit/precision/format/tz drift
        # between engines must not mask (or fake) a value difference
        try:
            av, ua, _ = _canon_ts(a)
            bv, ub, _ = _canon_ts(b)
        except Exception as e:
            return False, f"FAIL {name}: col {c} timestamp canon error {e}"
        if ua != ub:
            # one side overflows ns (so it is us-or-coarser precision):
            # compare at us — exact for it, and an in-ns-range vs
            # out-of-range instant can never differ by less than a us,
            # so the coarsening cannot fake an equality
            sent = np.iinfo("int64").min
            if ua == "ns":
                av = np.where(av == sent, av, av // 1000)
            else:
                bv = np.where(bv == sent, bv, bv // 1000)
        bad = av != bv
        if bad.any():
            i = int(np.argmax(bad))
            return False, (f"FAIL {name}: col {c} timestamp mismatch row {i}: "
                           f"{a.iloc[i]!r} vs {b.iloc[i]!r} (epoch-us {av[i]} vs {bv[i]})")
        return True, None
    eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
    if not eq.all():
        i = (~eq).idxmax()
        return False, f"FAIL {name}: col {c} row {i}: {a[i]!r} vs {b[i]!r}"
    return True, None


def main(sf_dir, out_dir):
    import duckdb
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
                c_ok, msg = col_equal(name, c, mine[c], ref[c])
                if not c_ok:
                    print(msg)
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


def selftest():
    """Pin the two known cross-engine drift families."""
    import datetime
    fails = []
    n = 0

    def expect(label, want_ok, a, b):
        nonlocal n
        n += 1
        ok, _ = col_equal("selftest", label, pd.Series(a), pd.Series(b))
        if ok != want_ok:
            fails.append(f"{label}: expected ok={want_ok}, got ok={ok}")

    # float family: -0.0 is NOT +0.0 (byte hash), NaN==NaN, null==null
    expect("neg-zero", False, [-0.0], [0.0])
    expect("same-bits", True, [1.5, float("nan"), None], [1.5, float("nan"), None])
    expect("low-bit", False, [1.0], [1.0 + 2**-52])
    # timestamp family: identical instants across unit/precision/object
    # representations must PASS; different instants must FAIL — incl.
    # pre-1970 (negative epoch, the classic formatting trap)
    pre = datetime.datetime(1965, 3, 1, 12, 0, 0)
    expect("pre-1970-units", True,
           pd.Series([pre]).astype("datetime64[ns]"),
           pd.Series([pre]).astype("datetime64[us]"))
    expect("pre-1970-object", True,
           pd.Series([pre]).astype("datetime64[us]"),
           pd.Series([pre], dtype=object))
    expect("instant-diff", False,
           pd.Series([pre]).astype("datetime64[us]"),
           pd.Series([pre + datetime.timedelta(microseconds=1)]).astype("datetime64[us]"))
    expect("date-vs-midnight", True,
           pd.Series([datetime.date(1965, 3, 1)], dtype=object),
           pd.Series([datetime.datetime(1965, 3, 1)]).astype("datetime64[ns]"))
    expect("nat-nat", True,
           pd.Series([pd.NaT]).astype("datetime64[us]"),
           pd.Series([pd.NaT]).astype("datetime64[ns]"))
    expect("nat-value", False,
           pd.Series([pd.NaT]).astype("datetime64[us]"),
           pd.Series([pre]).astype("datetime64[us]"))
    expect("tz-instant", True,
           pd.Series([pd.Timestamp("2020-01-01 05:00:00+05:00")]),
           pd.Series([pd.Timestamp("2020-01-01 00:00:00")]))
    # ns fidelity: a sub-microsecond difference must FAIL (the old
    # us truncation compared these equal)
    expect("sub-us-diff", False,
           pd.Series([pd.Timestamp("2020-01-01 00:00:00.000000001")]),
           pd.Series([pd.Timestamp("2020-01-01 00:00:00")]))
    expect("sub-us-same", True,
           pd.Series([pd.Timestamp("2020-01-01 00:00:00.000000001")]),
           pd.Series([pd.Timestamp("2020-01-01 00:00:00.000000001")]))
    # beyond the ns range (year 2500): the us fallback engages on one
    # or both sides without faking or masking a difference
    far = np.array(["2500-01-01T00:00:00"], dtype="datetime64[us]")
    expect("beyond-ns-same", True, pd.Series(far), pd.Series(far.copy()))
    expect("beyond-ns-diff", False, pd.Series(far),
           pd.Series(far + np.timedelta64(1, "us")))
    expect("beyond-ns-vs-inrange", False, pd.Series(far),
           pd.Series([pd.Timestamp("2020-01-01")]))
    expect("beyond-ns-nat", True,
           pd.Series(np.array(["NaT"], dtype="datetime64[us]")),
           pd.Series([pd.NaT]).astype("datetime64[ns]"))
    if fails:
        print("SELFTEST FAIL:\n  " + "\n  ".join(fails))
        return 1
    print(f"SELFTEST PASS ({n} fixtures)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
