#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf dir, sort
columns by name + rows by value, and compare exactly (with a diagnostic
tolerance pass for near-misses). Usage: check.py [sfdir] [verify_out] [artifact]

The optional artifact (argv[3], also via gate.sh's GATE_JSON) is written in
the DRIVER's CORRECTNESS schema — per-query {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err} — with the compact status string
kept as a `detail` field and a `_meta` summary key (VERDICT r13 task 2), so
up-SF gates can be committed and mechanically diffed round-over-round with
scripts/correctness_compare.py."""
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

def entry(detail, rows_match=None, schema_match=None, hash_match=None,
          spark_rows=None, oracle_rows=None, err=None):
    return {"rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err, "detail": detail}

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
                results[name] = entry(
                    "MISSING_OUTPUT (query threw in Verify)",
                    err="missing_output")
    for name in sorted(os.listdir(out)):
        qdir = os.path.join(out, name)
        if not os.path.isdir(qdir): continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = entry("NO_OUTPUT", err="no_output"); continue
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetch_arrow_table()
        gcols = sorted(got.column_names)
        gd = got.to_pydict()
        grows = sorted([key([norm(gd[c][i]) for c in gcols]) for i in range(got.num_rows)])
        if name not in oracle:
            results[name] = entry(f"ROWS_ONLY({got.num_rows})",
                                  spark_rows=got.num_rows, err="no_oracle")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = entry(f"ORACLE_SQL_ERROR: {e}",
                                  spark_rows=got.num_rows,
                                  err=f"oracle_sql_error: {e}")
            continue
        ecols = sorted(exp.column_names)
        if ecols != gcols:
            results[name] = entry(
                f"SCHEMA_MISMATCH got={gcols} exp={ecols}",
                rows_match=(got.num_rows == exp.num_rows),
                schema_match=False, hash_match=False,
                spark_rows=got.num_rows, oracle_rows=exp.num_rows)
            continue
        ed = exp.to_pydict()
        erows = sorted([key([norm(ed[c][i]) for c in ecols]) for i in range(exp.num_rows)])
        if grows == erows:
            results[name] = entry(f"OK({got.num_rows})", rows_match=True,
                                  schema_match=True, hash_match=True,
                                  spark_rows=got.num_rows,
                                  oracle_rows=exp.num_rows)
        else:
            # diagnostics: row counts, first few diffs
            gs, es = set(grows), set(erows)
            only_g = list(gs - es)[:2]
            only_e = list(es - gs)[:2]
            results[name] = entry(
                f"VALUE_MISMATCH rows={got.num_rows}/{exp.num_rows} "
                f"only_spark={only_g} only_duck={only_e}",
                rows_match=(got.num_rows == exp.num_rows),
                schema_match=True, hash_match=False,
                spark_rows=got.num_rows, oracle_rows=exp.num_rows)
    ok = sum(1 for v in results.values() if v["hash_match"] is True)
    for k, v in sorted(results.items()):
        d = v["detail"]
        flag = "PASS" if d.startswith("OK") else ("INFO" if d.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{flag}] {k}: {d}")
    print(f"== {ok}/{len(results)} exact matches ==")
    if len(sys.argv) > 3:
        art = dict(sorted(results.items()))
        art["_meta"] = {"sf_dir": sfdir, "exact": ok, "n": len(results)}
        with open(sys.argv[3], "w") as f:
            json.dump(art, f, indent=1)
        print(f"artifact -> {sys.argv[3]}")
    # fail closed: a 0-exit must mean "every compared query matched, and
    # something was actually compared". Zero results is a zero-data
    # green-light (ADVICE r13), same fail-open family as the
    # VALUE_MISMATCH exit fixed in r13.
    if not results:
        print("error: no Verify outputs found — nothing was checked")
        sys.exit(2)
    bad = sum(1 for v in results.values()
              if not (v["detail"].startswith("OK")
                      or v["detail"].startswith("ROWS_ONLY")))
    if bad:
        sys.exit(1)

if __name__ == "__main__":
    main()
