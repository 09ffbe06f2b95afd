#!/usr/bin/env python3
"""Cross-check COVERAGE.md's hand-maintained q## citations against the
query registry and the latest correctness artifact (VERDICT r14 task 7).

COVERAGE.md is the line-by-line SURVEY §2 → implementation map; its
citations rot silently when queries are renamed, renumbered, or go red.
This gate makes the rot loud:

  1. every cited q## (ranges like `q83–q87` expanded) must resolve to
     exactly one registry key in the correctness artifact;
  2. every cited query must be GREEN there — exact (hash_match) or the
     adjudicated rows-only class (err == 'no_oracle');
  3. every registry key must be cited somewhere in COVERAGE.md — an
     uncited query is capability the coverage map doesn't know about.

Usage: coverage_check.py [COVERAGE.md] [CORRECTNESS.json]   (exit 1 on
any stale citation / red citation / uncited registry key)"""
import json, re, sys


def cited_numbers(path):
    """All q-numbers cited in the markdown, with en-dash/hyphen ranges
    `q83–q87` expanded inclusive. Returns the set of digit strings
    exactly as written (keys zero-pad to two digits, so `q05` is the
    literal prefix of `q05_join_snowflake`)."""
    text = open(path).read()
    nums = set()
    for a, b in re.findall(r"q(\d+)\s*[–—-]\s*q(\d+)", text):
        if int(b) < int(a) or int(b) - int(a) > 200:
            sys.exit(f"error: implausible range q{a}..q{b} in {path}")
        width = len(a)
        nums.update(str(n).zfill(width) for n in range(int(a), int(b) + 1))
    nums.update(re.findall(r"q(\d+)", text))
    return nums


def registry(path):
    """query-name → green?  from a correctness artifact (driver schema
    or GATE_JSON; `_meta` skipped). Green = exact hash match or the
    adjudicated rows-only class."""
    art = json.load(open(path))
    out = {}
    for k, v in art.items():
        if k.startswith("_") or not isinstance(v, dict):
            continue
        out[k] = bool(v.get("hash_match")) or v.get("err") == "no_oracle"
    if not out:
        sys.exit(f"error: no query rows in {path}")
    return out


def main():
    cov = sys.argv[1] if len(sys.argv) > 1 else "COVERAGE.md"
    art = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_r14.json"
    nums = cited_numbers(cov)
    reg = registry(art)
    by_num = {}
    for k in reg:
        m = re.match(r"q(\d+)_", k)
        if m:
            by_num.setdefault(m.group(1), []).append(k)

    fails = []
    for n in sorted(nums, key=int):
        keys = by_num.get(n, [])
        if not keys:
            fails.append(f"stale citation: q{n} cited in {cov} but no "
                         f"q{n}_* key exists in the registry")
        elif len(keys) > 1:
            fails.append(f"ambiguous citation: q{n} matches {keys}")
        elif not reg[keys[0]]:
            fails.append(f"red citation: q{n} -> {keys[0]} is not green "
                         f"in {art}")
    uncited = sorted((k for num, ks in by_num.items() for k in ks
                      if num not in nums), key=str)
    for k in uncited:
        fails.append(f"uncited registry key: {k} has no q## citation "
                     f"in {cov}")

    print(f"cited q-numbers: {len(nums)}; registry keys: {len(reg)}; "
          f"green: {sum(reg.values())}")
    for f in fails:
        print(f"[FAIL] {f}")
    if fails:
        print(f"COVERAGE GATE FAIL ({len(fails)} findings)")
        sys.exit(1)
    print("COVERAGE GATE OK (every citation resolves green, every "
          "registry key cited)")


if __name__ == "__main__":
    main()
