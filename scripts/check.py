#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf dir, sort
columns by name + rows by value, and compare exactly (with a diagnostic
tolerance pass for near-misses). Usage: check.py [sfdir] [verify_out]."""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    # every ATTEMPTED query must have produced output — a thrown query
    # writes no dir and would silently shrink the denominator (the q70
    # ANSI divide-by-zero lesson)
    mpath = os.path.join(out, "manifest.txt")
    if os.path.exists(mpath):
        for name in open(mpath).read().split():
            if not os.path.isdir(os.path.join(out, name)):
                results[name] = "MISSING_OUTPUT (query threw in Verify)"
    for name in sorted(os.listdir(out)):
        qdir = os.path.join(out, name)
        if not os.path.isdir(qdir): continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"; continue
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetch_arrow_table()
        gcols = sorted(got.column_names)
        gd = got.to_pydict()
        grows = sorted([key([norm(gd[c][i]) for c in gcols]) for i in range(got.num_rows)])
        if name not in oracle:
            results[name] = f"ROWS_ONLY({got.num_rows})"; continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        ecols = sorted(exp.column_names)
        if ecols != gcols:
            results[name] = f"SCHEMA_MISMATCH got={gcols} exp={ecols}"; continue
        ed = exp.to_pydict()
        erows = sorted([key([norm(ed[c][i]) for c in ecols]) for i in range(exp.num_rows)])
        if grows == erows:
            results[name] = f"OK({got.num_rows})"
        else:
            # diagnostics: row counts, first few diffs
            diff = []
            gs, es = set(grows), set(erows)
            only_g = list(gs - es)[:2]
            only_e = list(es - gs)[:2]
            results[name] = (f"VALUE_MISMATCH rows={got.num_rows}/{exp.num_rows} "
                             f"only_spark={only_g} only_duck={only_e}")
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{flag}] {k}: {v}")
    print(f"== {ok}/{len(results)} exact matches ==")
    # optional CORRECTNESS-style artifact (argv[3]): per-query verdicts
    # keyed like the driver's CORRECTNESS_rN.json, so up-SF gates can be
    # committed and diffed round-over-round (VERDICT r12 task 1)
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump({"sf_dir": sfdir, "exact": ok, "n": len(results),
                       "results": dict(sorted(results.items()))}, f, indent=1)
        print(f"artifact -> {sys.argv[3]}")
    # exit nonzero on any FAIL row — callers (gate.sh, the ladder) gate
    # on exit status, and a 0-exit over a VALUE_MISMATCH would
    # green-light a correctness regression (code-review r13)
    bad = sum(1 for v in results.values()
              if not (v.startswith("OK") or v.startswith("ROWS_ONLY")))
    if bad:
        sys.exit(1)

if __name__ == "__main__":
    main()
