#!/usr/bin/env python3
"""Diff two Bench JSON lines: per-query deltas sorted by regression.
Usage: bench_compare.py old.json new.json [threshold_pct]"""
import json, sys

def load(p):
    with open(p) as f:
        return json.loads([l for l in f if l.strip().startswith("{")][-1])

def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    rows = []
    for q in sorted(set(old["queries"]) | set(new["queries"])):
        o, n = old["queries"].get(q), new["queries"].get(q)
        if o is None or n is None or o <= 0 or n <= 0:
            rows.append((float("inf"), q, o, n, "added/removed/failed"))
            continue
        pct = (n - o) / o * 100
        rows.append((pct, q, o, n, ""))
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s")
    for pct, q, o, n, note in sorted(rows, reverse=True):
        if note or abs(pct) >= thr:
            mark = note or f"{pct:+.0f}%"
            print(f"  {q}: {o if o is not None else '-'} -> "
                  f"{n if n is not None else '-'}  {mark}")

if __name__ == "__main__":
    main()
