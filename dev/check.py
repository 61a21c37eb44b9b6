#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, executes the oracle SQL in DuckDB over views of the
sfDir parquet tables and compares against the Spark parquet output
(columns sorted by name, rows sorted, exact value equality).

Usage: python3 dev/check.py [sfDir] [outDir]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    # per-query ORACLE wall (DuckDB execute+fetch) — the missing half of
    # the sweep-cost decomposition: VERIFY_TIMES.json holds the Spark
    # side, this holds the mirror-replay side, so a query whose cost is
    # mirror ceremony (e.g. an over-unrolled CTE chain) is attributable
    oracle_times = {}
    for name, sql in sorted(oracle.items()):
        try:
            t0 = time.monotonic()
            exp = con.execute(sql).fetchdf()
            oracle_times[name] = round(time.monotonic() - t0, 3)
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp, got = norm(exp), norm(got)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != "
                      f"{list(exp.columns)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                n_fail += 1
                continue
            diff_cols = []
            for c in exp.columns:
                if not exp[c].equals(got[c]):
                    ne = (exp[c].astype(str) != got[c].astype(str))
                    diff_cols.append((c, int(ne.sum())))
            if diff_cols:
                print(f"FAIL {name}: value mismatch {diff_cols}")
                for c, _ in diff_cols[:2]:
                    ne = exp[c].astype(str) != got[c].astype(str)
                    print("  expect:", exp[c][ne].head(3).tolist())
                    print("  actual:", got[c][ne].head(3).tolist())
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    oracle_times["oracle_total_sec"] = round(sum(oracle_times.values()), 3)
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump(oracle_times, f)
    top = sorted((x for x in oracle_times.items()
                  if x[0] != "oracle_total_sec"),
                 key=lambda x: -x[1])[:8]
    print(f"\noracle total {oracle_times['oracle_total_sec']:.1f} s; top: "
          + ", ".join(f"{k} {v:.1f}s" for k, v in top))
    print(f"{n_pass} passed, {n_fail} failed / {len(oracle)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
