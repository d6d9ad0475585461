#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare the parquet
outputs of `graft.Verify` against DuckDB running the oracle SQL on the
same tables. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/verify_local.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.read_parquet(spark_path)
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], e[c]
            bad = None
            for i in range(len(a)):
                av, bv = a.iloc[i], b.iloc[i]
                if pd.isna(av) and pd.isna(bv):
                    continue
                if pd.isna(av) or pd.isna(bv) or av != bv:
                    bad = (i, av, bv); break
            if bad is not None:
                mismatch = c
                print(f"FAIL {name}: col {c} differs, first diff {bad}")
                break
        if mismatch: n_fail += 1
        else: print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
