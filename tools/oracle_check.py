#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sfDir parquet
tables, compares with the Spark result parquet (columns sorted by name,
rows sorted), prints per-query PASS/FAIL.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchdf()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            w, g = normalize(want), normalize(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(w.columns)}")
                n_fail += 1
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
                n_fail += 1
                continue
            diffs = []
            for c in w.columns:
                wc, gc = w[c], g[c]
                if wc.dtype.kind == "f" or gc.dtype.kind == "f":
                    eq = (wc.astype(float).fillna(-9e99) - gc.astype(float).fillna(-9e99)).abs() == 0.0
                else:
                    eq = wc.fillna("__n__").astype(str) == gc.fillna("__n__").astype(str)
                if not eq.all():
                    i = (~eq).idxmax()
                    diffs.append(f"{c}[row{i}]: spark={g[c][i]!r} oracle={w[c][i]!r} (n={int((~eq).sum())})")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(w)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: EXC {str(ex)[:200]}")
            n_fail += 1

    print(f"\n{n_pass} pass / {n_fail} fail (oracled); rows-only queries not checked here")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
