#!/usr/bin/env python3
"""Plan-fingerprint diff (BASELINE.md "Plan-fingerprint gate").

Usage: python3 tools/plandiff.py OLD_plans.json NEW_plans.json

Compares the per-query fingerprints graft.Plans emits and prints one
line per changed query: which counters moved (shuffle/broadcast/cached/
sorts), scans added/removed, and any scan whose ReadSchema column set
or pushed-filter string changed. Exit 0 when identical, 1 when any
query differs, 2 when the query sets differ (added/removed queries are
listed but may be intentional surface changes).
"""
import json
import sys
from collections import Counter


def load(path):
    d = json.load(open(path))
    return {p["name"]: p for p in d["plans"]}


def scankey(s):
    return (tuple(s["columns"]), s["pushedFilters"],
            s["partitionFilters"], s["dataFilters"])


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    changed = 0
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        msgs = []
        for k in ("shuffleExchanges", "broadcastExchanges", "cachedScans", "sorts"):
            if o[k] != n[k]:
                msgs.append(f"{k} {o[k]}->{n[k]}")
        # multiset compare (ADVICE r20): sorted-list membership missed
        # multiplicity-only drift (e.g. a duplicated scan [A,A] -> [A] —
        # a self-join collapsing to one read, or a scan duplicating) —
        # count deltas per distinct fingerprint so those flag as changed.
        oc, nc = Counter(map(scankey, o["scans"])), Counter(map(scankey, n["scans"]))
        if oc != nc:
            for s in sorted(set(oc) | set(nc)):
                if oc[s] != nc[s]:
                    msgs.append(f"scan count {oc[s]}->{nc[s]} cols={list(s[0])} pushed={s[1]}")
        if msgs:
            changed += 1
            print(f"{name}: " + "; ".join(msgs))
    if added:
        print(f"added queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")
    print(f"common: {len(set(old) & set(new))}, changed: {changed}, "
          f"added: {len(added)}, removed: {len(removed)}")
    if added or removed:
        sys.exit(2)
    sys.exit(1 if changed else 0)


if __name__ == "__main__":
    main()
