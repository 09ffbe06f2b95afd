#!/usr/bin/env python3
"""Mechanical round-over-round correctness diff (VERDICT r13 task 2):
exit nonzero on any green→red transition between two correctness
artifacts. Usage: correctness_compare.py old.json new.json

Accepts all three artifact shapes:
 - the driver's CORRECTNESS_rN.json      {q: {hash_match, err, ...}}
 - the r14+ GATE_JSON (driver schema + detail + _meta)
 - the legacy r13 GATE_JSON              {"results": {q: "OK(6)"}}

Transitions and their treatment:
 - green→red   (hash_match true → false/err)        FAIL (exit 1)
 - ANY→gone    (query disappeared from the new run)  FAIL (exit 1) —
   a vanished query silently shrinks the denominator (the q70 lesson),
   whatever its prior state (code-review r14)
 - rows_only→red (err beyond no_oracle)              FAIL (exit 1)
 - red→green / added / rows-only↔rows-only           reported, exit 0
"""
import json, sys

def load(p):
    raw = json.load(open(p))
    if "results" in raw and isinstance(raw["results"], dict) and \
            all(isinstance(v, str) for v in raw["results"].values()):
        # legacy r13 GATE_JSON: compact strings
        out = {}
        for q, s in raw["results"].items():
            if s.startswith("OK"):
                out[q] = {"hash_match": True, "err": None}
            elif s.startswith("ROWS_ONLY"):
                out[q] = {"hash_match": None, "err": "no_oracle"}
            else:
                out[q] = {"hash_match": False, "err": s[:120]}
        return out
    return {q: v for q, v in raw.items() if not q.startswith("_")}

def state(v):
    if v.get("hash_match") is True:
        return "green"
    if v.get("err") == "no_oracle":
        return "rows_only"
    return "red"

def main():
    if len(sys.argv) != 3:
        sys.exit(f"usage: {sys.argv[0]} old.json new.json")
    old, new = load(sys.argv[1]), load(sys.argv[2])
    if not old or not new:
        sys.exit("error: empty artifact — nothing to compare")
    failures, infos = [], []
    for q in sorted(old):
        os_, nv = state(old[q]), new.get(q)
        if nv is None:
            failures.append(f"{q}: {os_} -> GONE (missing from new run)")
            continue
        ns = state(nv)
        if os_ == "green" and ns != "green":
            failures.append(f"{q}: green -> {ns} "
                            f"({nv.get('err') or nv.get('detail', '')})")
        elif os_ == "rows_only" and ns == "red":
            failures.append(f"{q}: rows_only -> red ({nv.get('err')})")
        elif os_ != ns:
            infos.append(f"{q}: {os_} -> {ns}")
    for q in sorted(set(new) - set(old)):
        infos.append(f"{q}: ADDED ({state(new[q])})")
    for m in infos:
        print(f"[info] {m}")
    for m in failures:
        print(f"[FAIL] {m}")
    ng = sum(1 for v in new.values() if state(v) == "green")
    og = sum(1 for v in old.values() if state(v) == "green")
    print(f"green: {og}/{len(old)} -> {ng}/{len(new)}; "
          f"regressions: {len(failures)}")
    if failures:
        sys.exit(1)

if __name__ == "__main__":
    main()
