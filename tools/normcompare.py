#!/usr/bin/env python3
"""Host-normalized per-query bench comparison (VERDICT r18 item 2).

Usage: python3 tools/normcompare.py OLD.json NEW.json [topN]

Each query's seconds are divided by the calibration probe NEAREST to it
in run order (the `calibration_samples` array Bench emits since r19:
{"after": <queries completed>, "sec": <probe wall>}). Artifacts that
predate calibration_samples (r18 and earlier) fall back to the run's
single `host_calibration_sec`. Prints the worst normalized regressions
and best improvements, plus totals raw and normalized.

The per-query map may be either {name: sec} (stdout line) or
{name: {"sec": s, "ok": bool, ...}} (file artifact) — both load; failed
queries are skipped. Query order in the JSON map is the run order
(Bench writes results in iteration order), which is what maps a query
to its nearest probe.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    qs = d.get("queries", {})
    out = {}
    for i, (name, v) in enumerate(qs.items()):
        if isinstance(v, dict):
            if not v.get("ok", True):
                continue
            out[name] = (i, float(v["sec"]))
        else:
            out[name] = (i, float(v))
    samples = d.get("calibration_samples")
    base = d.get("host_calibration_sec")
    return d, out, samples, base


def nearest_cal(idx, samples, base):
    if samples:
        return min(samples, key=lambda s: abs(s["after"] - idx))["sec"]
    return base if base else 1.0


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    do, qo, so, bo = load(old_path)
    dn, qn, sn, bn = load(new_path)
    rows = []
    for name, (ni, ns) in qn.items():
        if name not in qo:
            continue
        oi, os_ = qo[name]
        on = os_ / nearest_cal(oi, so, bo)
        nn = ns / nearest_cal(ni, sn, bn)
        rows.append((name, os_, ns, on, nn, nn / on if on > 0 else float("inf")))
    if not rows:
        print("no common successful queries between the two artifacts")
        return
    rows.sort(key=lambda r: -r[5])
    hdr = f"{'query':38s} {'old_s':>7s} {'new_s':>7s} {'old_n':>7s} {'new_n':>7s} {'ratio':>6s}"
    print(f"== worst normalized regressions (new/old > 1) ==\n{hdr}")
    for r in rows[:topn]:
        print(f"{r[0]:38s} {r[1]:7.2f} {r[2]:7.2f} {r[3]:7.2f} {r[4]:7.2f} {r[5]:6.2f}")
    print(f"\n== best normalized improvements ==\n{hdr}")
    for r in rows[::-1][:topn]:
        print(f"{r[0]:38s} {r[1]:7.2f} {r[2]:7.2f} {r[3]:7.2f} {r[4]:7.2f} {r[5]:6.2f}")
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    norm_o = sum(r[3] for r in rows)
    norm_n = sum(r[4] for r in rows)
    med = sorted(r[5] for r in rows)[len(rows) // 2]
    print(f"\ncommon queries: {len(rows)}")
    print(f"raw totals:        old {tot_o:.1f}s  new {tot_n:.1f}s  ratio {tot_n/tot_o:.3f}")
    print(f"normalized totals: old {norm_o:.1f}   new {norm_n:.1f}   ratio {norm_n/norm_o:.3f}")
    print(f"median per-query normalized ratio: {med:.3f}")


if __name__ == "__main__":
    main()
