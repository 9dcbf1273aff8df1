#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/check.py [--sf /root/testdata/sf0.01] [--out /tmp/verify_out]
                         [--skip-run] [--only name1,name2]

Runs graft.Verify (unless --skip-run), then for every query in
oracle_sql.json: executes the oracle SQL in DuckDB over the same parquet
tables, loads the Spark result parquet, sorts columns by name and rows by
value, and compares cell-by-cell. Exact match -> OK. Reports near-miss float
diffs so unstable queries are caught before the driver sees them.
"""
import argparse, glob, json, math, os, subprocess, sys, time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, decimals stay as objects
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
        except (TypeError, ValueError):
            return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cmp_cell(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/verify_out")
    ap.add_argument("--skip-run", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    if not args.skip_run:
        cmd = ["sbt", f'runMain graft.Verify {args.sf} {args.out}']
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                                   if "[verify]" in l or "error" in l.lower()) + "\n")
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)

    with open(os.path.join(args.out, "oracle_sql.json")) as f:
        oracles = json.load(f)
    only = set(args.only.split(",")) if args.only else None

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_bad = 0
    results = {}
    def record(name, status, rows=None, cols=None):
        # tri-state per comparison stage: True/False only when that stage
        # actually RAN; None = never compared (a failed query must not
        # read as "rows matched" downstream)
        compared_schema = status in ("ok", "column-mismatch",
                                     "row-count-mismatch", "value-mismatch")
        compared_rows = status in ("ok", "row-count-mismatch",
                                   "value-mismatch")
        compared_values = status in ("ok", "value-mismatch")
        results[name] = {
            "ok": status == "ok", "status": status,
            "rows": rows, "cols": cols,
            "schema_match": (status != "column-mismatch")
                            if compared_schema else None,
            "rows_match": (status != "row-count-mismatch")
                          if compared_rows else None,
            "values_match": (status == "ok") if compared_values else None}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        outdir = os.path.join(args.out, name)
        parts = glob.glob(os.path.join(outdir, "*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output at {outdir}")
            n_bad += 1
            record(name, "missing-spark-output")
            continue
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet({parts!r})").df())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_bad += 1
            record(name, "unreadable-spark-output")
            continue
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_bad += 1
            record(name, "oracle-error")
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
            record(name, "column-mismatch")
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_bad += 1
            record(name, "row-count-mismatch", len(got), len(got.columns))
            continue
        bad = []
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c].tolist(), want[c].tolist())):
                if not cmp_cell(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g. {bad[:3]}")
            n_bad += 1
            record(name, "value-mismatch", len(got), len(got.columns))
        else:
            print(f"OK   {name} ({len(got)} rows x {len(got.columns)} cols)")
            n_ok += 1
            record(name, "ok", len(got), len(got.columns))
    # the in-tree audit record (CORRECTNESS_BUILDER_r{N}.json is a copy of
    # this file): per-query verdicts + run metadata, written even on failure
    report = {"n_ok": n_ok, "n_failed": n_bad, "sf": args.sf,
              "only": args.only,
              "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
              "queries": results}
    # a targeted --only run writes a SEPARATE file so it can never
    # clobber the full-run audit record the builder artifact copies
    report_name = "report_only.json" if only else "report.json"
    with open(os.path.join(args.out, report_name), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
