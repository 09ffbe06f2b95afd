#!/usr/bin/env python3
"""Diff Bench JSON lines / soak throughput artifacts, with exit-coded
gate modes (a nonzero exit is the regression signal — callers gate on it).

Usage:
  bench_compare.py old.json new.json [threshold_pct]
      Report-only per-query delta listing (no exit code semantics).
  bench_compare.py --gate old1[,old2] new1[,new2] [median_thr] [big_thr]
      VERDICT r13 task 4: best-of-two vs best-of-two per-query ratios.
      EXITS 1 when median ratio > median_thr (default 1.25) or any query
      with old best-of-two > 2 s regresses > big_thr (default 1.5x).
      Feed canary-clean series only (the drift brackets in NOTES).
  bench_compare.py --soak old new [threshold_pct]
      VERDICT r12 task 5 + ADVICE r13: diff the streaming
      soak_throughput phases (ClusterGate artifacts or soak.sh logs),
      phases namespaced by section (soak/ vs chaos/ — the two sections
      reuse phase names and must not overwrite each other). EXITS 1 when
      the worst THROUGHPUT (rows_per_sec) or WALL (wall_sec) regression
      >= threshold_pct (default 20). Latency percentiles are printed but
      NOT gated: on these tiny fixtures the batch-duration distribution
      is bimodal (empty ProcessingTime(0) ticks ~3 ms vs loaded batches
      ~seconds), so p50/p95 flip modes run-to-run — the r14 ladder's
      first firing of this gate was exactly that, at flat wall times."""
import json, sys

def load(p):
    with open(p) as f:
        return json.loads([l for l in f if l.strip().startswith("{")][-1])

def load_phases(p):
    """Section-namespaced phases from a ClusterGate artifact OR a
    soak.sh/ClusterGate log. Keys are 'soak/<phase>' / 'chaos/<phase>'
    ('log/<phase>' for raw soak_throughput lines) so an artifact carrying
    both sections never silently overwrites one with the other
    (ADVICE r13)."""
    phases = {}
    def put(section, ph):
        k = f"{section}/{ph['phase']}"
        if k in phases:
            sys.exit(f"error: duplicate phase '{k}' in {p}")
        phases[k] = ph
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("soak_throughput "):
                put("log", json.loads(line[len("soak_throughput "):]))
            elif line.startswith("{"):
                d = json.loads(line)
                for section, t in (
                        ("soak", d.get("soak", {}).get("throughput")),
                        ("chaos", d.get("chaos", {}).get("streaming", {})
                                   .get("throughput"))):
                    for ph in t or []:
                        put(section, ph)
    return phases

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
    # fail-closed on shape mismatches (code-review r14): disjoint key
    # sets (e.g. a raw log's 'log/' namespace vs an artifact's 'soak/')
    # would otherwise compare NOTHING and print +0%; and a phase that
    # ran in the old side but wrote nothing new is a regression, not a
    # footnote
    if not set(old) & set(new):
        sys.exit(f"error: no common phases (old: {sorted(old)}, "
                 f"new: {sorted(new)}) — compare like-shaped inputs "
                 f"(both artifacts or both logs)")
    gone = sorted(set(old) - set(new))
    gone_queries = []
    worst = 0.0
    for phase in sorted(set(old) | set(new)):
        o, n = old.get(phase), new.get(phase)
        if o is None or n is None:
            print(f"{phase}: only in {'new' if o is None else 'old'}" +
                  ("" if o is None else " [FAIL: phase vanished]"))
            continue
        ow, nw = o["wall_sec"], n["wall_sec"]
        if ow:
            worst = max(worst, (nw - ow) / ow * 100)
        print(f"{phase}: wall {ow:.1f}s -> {nw:.1f}s")
        for q in sorted(set(o["queries"]) | set(n["queries"])):
            # a query that reported throughput in the old run but wrote
            # nothing in the new one stopped reporting — gate it like a
            # vanished phase, don't let the ov/nv None-skip below pass
            # it silently (ADVICE r14)
            if q in o["queries"] and q not in n["queries"]:
                print(f"  {q}: [FAIL: query vanished from phase]")
                gone_queries.append(f"{phase}/{q}")
                continue
            oq, nq = o["queries"].get(q, {}), n["queries"].get(q, {})
            cells = []
            for k in ("rows_per_sec", "batch_ms_p50", "batch_ms_p95",
                      "e2e_ms_p50", "e2e_ms_p95"):
                ov, nv = oq.get(k), nq.get(k)
                if ov is None or nv is None or not ov:
                    continue
                pct = (nv - ov) / ov * 100
                # only throughput gates; latency percentiles are
                # bimodal on tiny fixtures (docstring) — report only
                if k == "rows_per_sec":
                    worst = max(worst, -pct)
                if abs(pct) >= thr:
                    cells.append(f"{k} {ov} -> {nv} ({pct:+.0f}%)" +
                                 ("" if k == "rows_per_sec" else " [info]"))
            if cells:
                print(f"  {q}: " + "; ".join(cells))
    print(f"worst gated regression (throughput/wall): {worst:+.0f}% "
          f"(threshold {thr:.0f}%)")
    # the threshold is a GATE, not a print filter: callers (the ladder)
    # rely on exit status (ADVICE r13)
    if gone:
        print(f"GATE FAIL: phases vanished from the new run: {gone}")
        sys.exit(1)
    if gone_queries:
        print(f"GATE FAIL: queries vanished from surviving phases: "
              f"{gone_queries}")
        sys.exit(1)
    if worst >= thr:
        print("GATE FAIL: worst soak regression exceeds threshold")
        sys.exit(1)

def best_of(paths):
    """Per-query min over one or two Bench series (best-of-two)."""
    series = [load(p) for p in paths.split(",")]
    out = {}
    for s in series:
        for q, v in s["queries"].items():
            if v and v > 0 and (q not in out or v < out[q]):
                out[q] = v
    if not out:
        sys.exit(f"error: no positive query times in {paths}")
    return out, min(s["value"] for s in series)

def gate_main():
    old, otot = best_of(sys.argv[2])
    new, ntot = best_of(sys.argv[3])
    median_thr = float(sys.argv[4]) if len(sys.argv) > 4 else 1.25
    big_thr = float(sys.argv[5]) if len(sys.argv) > 5 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        sys.exit("error: no common queries between the two sides")
    # a query that ran in the old series but failed/vanished in the new
    # one is the WORST regression, not an info line (code-review r14):
    # best_of drops zero/failed times, so old−new = broke-or-disappeared
    broke = sorted(set(old) - set(new))
    for q in broke:
        print(f"[FAIL] {q}: ran in old ({old[q]:.2f}s best) but failed "
              f"or vanished in new")
    for q in sorted(set(new) - set(old)):
        print(f"[info] {q}: only in new")
    ratios = sorted(new[q] / old[q] for q in common)
    # true median: average the two middle elements for even-length lists
    # (the upper-middle alone was slightly stricter near the threshold —
    # ADVICE r14)
    mid = len(ratios) // 2
    median = ratios[mid] if len(ratios) % 2 else \
        (ratios[mid - 1] + ratios[mid]) / 2
    p90 = ratios[int(len(ratios) * 0.9)]
    big_regressions = [(q, old[q], new[q]) for q in common
                       if old[q] > 2.0 and new[q] / old[q] > big_thr]
    print(f"total (best): {otot:.1f}s -> {ntot:.1f}s | per-query "
          f"best-of-N ratio median {median:.3f}, p90 {p90:.3f}, "
          f"max {ratios[-1]:.3f} over {len(common)} queries")
    for q, o, n in sorted(big_regressions, key=lambda r: -r[2] / r[1]):
        print(f"[FAIL] {q}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x, "
              f">{big_thr}x on a >2s query)")
    fail = median > median_thr or big_regressions or broke
    if median > median_thr:
        print(f"[FAIL] median ratio {median:.3f} > {median_thr}")
    if fail:
        print("GATE FAIL")
        sys.exit(1)
    print(f"GATE OK (median<= {median_thr}, no >2s query regressed "
          f">{big_thr}x)")

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
    elif len(sys.argv) > 1 and sys.argv[1] == "--gate":
        gate_main()
    else:
        main()
