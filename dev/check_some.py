#!/usr/bin/env python3
"""dev/check.py restricted to named queries: check_some.py sfDir outDir q1 q2 ..."""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in names:
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
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
                    # dtype-only mismatches (0 string diffs) count too:
                    # the driver's hash compare is type-sensitive
                    diff_cols.append((c, int(ne.sum())))
            if diff_cols:
                print(f"FAIL {name}: value mismatch {diff_cols}")
                for c, _ in diff_cols[:2]:
                    ne = exp[c].astype(str) != got[c].astype(str)
                    print("  expect:", exp[c][ne].head(3).tolist())
                    print("  got:   ", got[c][ne].head(3).tolist())
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"{n_pass} pass / {n_fail} fail")


if __name__ == "__main__":
    main()
