#!/usr/bin/env python3
"""Diff two Bench JSON lines: per-query deltas sorted by regression.
Usage: bench_compare.py old.json new.json [threshold_pct]
       bench_compare.py --soak old new [threshold_pct]
--soak (VERDICT r12 task 5): diff the streaming soak_throughput phases
instead — the inputs are either ClusterGate artifacts (soak.throughput)
or raw soak.sh logs carrying `soak_throughput {...}` lines. Reports
per-phase wall_sec and per-query rows_per_sec plus the r13 latency keys
(batch_ms_p50/p95, e2e_ms_p50/p95) when both sides carry them."""
import json, sys

def load(p):
    with open(p) as f:
        return json.loads([l for l in f if l.strip().startswith("{")][-1])

def load_phases(p):
    """Phases from a ClusterGate artifact OR a soak.sh/ClusterGate log."""
    phases = []
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("soak_throughput "):
                phases.append(json.loads(line[len("soak_throughput "):]))
            elif line.startswith("{"):
                d = json.loads(line)
                for t in (d.get("soak", {}).get("throughput"),
                          d.get("chaos", {}).get("streaming", {})
                           .get("throughput")):
                    if t:
                        phases.extend(t)
    return {ph["phase"]: ph for ph in phases}

def soak_main():
    old, new = load_phases(sys.argv[2]), load_phases(sys.argv[3])
    thr = float(sys.argv[4]) if len(sys.argv) > 4 else 20.0
    # an input with no phases is a usage error, not a clean pass —
    # printing 'worst regression: +0%' over zero data would green-light
    # anything (code-review r13)
    for side, d in (("old", old), ("new", new)):
        if not d:
            sys.exit(f"error: no soak_throughput phases found in the "
                     f"{side} input")
    worst = 0.0
    for phase in sorted(set(old) | set(new)):
        o, n = old.get(phase), new.get(phase)
        if o is None or n is None:
            print(f"{phase}: only in {'new' if o is None else 'old'}")
            continue
        print(f"{phase}: wall {o['wall_sec']:.1f}s -> {n['wall_sec']:.1f}s")
        for q in sorted(set(o["queries"]) | set(n["queries"])):
            oq, nq = o["queries"].get(q, {}), n["queries"].get(q, {})
            cells = []
            for k in ("rows_per_sec", "batch_ms_p50", "batch_ms_p95",
                      "e2e_ms_p50", "e2e_ms_p95"):
                ov, nv = oq.get(k), nq.get(k)
                if ov is None or nv is None or not ov:
                    continue
                pct = (nv - ov) / ov * 100
                # latency UP and throughput DOWN are the regressions
                reg = -pct if k == "rows_per_sec" else pct
                worst = max(worst, reg)
                if abs(pct) >= thr:
                    cells.append(f"{k} {ov} -> {nv} ({pct:+.0f}%)")
            if cells:
                print(f"  {q}: " + "; ".join(cells))
    print(f"worst regression: {worst:+.0f}%")

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
    if len(sys.argv) > 1 and sys.argv[1] == "--soak":
        soak_main()
    else:
        main()
