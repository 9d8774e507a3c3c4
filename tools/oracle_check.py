"""Local replay of the driver's DuckDB oracle gate (rows/schema/dtype/values).

Driver-faithful since round 7: both sides materialize as pandas frames
(`fetchdf`, like the driver) instead of `fetchall` (native Python values).
The distinction matters for two failure classes the old tool was blind to:
  * DuckDB HUGEINT (any `sum(BIGINT)`) lands in pandas as float64, so an
    uncast oracle sum hashes `58.0` against Spark's int64 `58` → dtype-KIND
    mismatch here, hash mismatch at the driver (d18/d19, round 6).
  * An array-typed output column crashes the driver's `sort_values`
    ("unhashable type: numpy.ndarray", e5/e6/e12b/e14b, round 6) — rejected
    here explicitly on EITHER side before sorting.

Run Verify first:  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
Then:              python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"create view {name} as select * from '{t}'")

# dtype KINDS that must agree between Spark output and oracle output;
# integer width (int32 vs int64) is tolerated — the driver stringifies
# values, so 58 == 58 across widths, but float 58.0 != int 58.
KIND = {"i": "int", "u": "int", "f": "float", "b": "bool",
        "O": "obj", "M": "ts", "m": "td"}


def frame(cur):
    df = cur.fetchdf()
    df = df[sorted(df.columns)]
    arrayish = [
        c for c in df.columns
        if df[c].dtype.kind == "O" and df[c].map(
            lambda v: isinstance(v, (np.ndarray, list, tuple, dict))).any()
    ]
    return df, arrayish


def canon(df):
    # the driver's sort_values over every (name-sorted) column — the call
    # that dies on array cells, which `frame` rejects before we get here
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    out = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, (float, np.floating)):
                cells.append(repr(float(v)))
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return out


fails = []
checked = 0
for name in sorted(oracle):
    sql = oracle[name]
    if not glob.glob(f"{out_dir}/{name}/*.parquet"):
        continue  # filtered Verify dump (local iteration on a subset)
    checked += 1
    sp, sp_bad = frame(con.execute(f"select * from '{out_dir}/{name}/*.parquet'"))
    try:
        du, du_bad = frame(con.execute(sql))
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    if sp_bad or du_bad:
        fails.append((name, f"array-typed column (driver comparator crashes): "
                            f"spark={sp_bad} oracle={du_bad} — stringify with "
                            f"array_join/array_to_string (w24 list policy)"))
        continue
    if len(sp) != len(du):
        fails.append((name, f"rows {len(sp)} vs {len(du)}")); continue
    if list(sp.columns) != list(du.columns):
        fails.append((name, f"schema {list(sp.columns)} vs {list(du.columns)}")); continue
    kinds_sp = [KIND.get(sp[c].dtype.kind, sp[c].dtype.kind) for c in sp.columns]
    kinds_du = [KIND.get(du[c].dtype.kind, du[c].dtype.kind) for c in du.columns]
    if kinds_sp != kinds_du:
        bad = [(c, str(sp[c].dtype), str(du[c].dtype))
               for c, a, b in zip(sp.columns, kinds_sp, kinds_du) if a != b]
        fails.append((name, f"dtype mismatch (driver hashes dtype-sensitively; "
                            f"HUGEINT→float64 needs CAST AS BIGINT): {bad}"))
        continue
    a, b = canon(sp), canon(du)
    if a != b:
        diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), -1)
        fails.append((name, f"value mismatch at sorted row {diff}: "
                            f"{a[diff] if diff >= 0 else ''} vs {b[diff] if diff >= 0 else ''}"))
        continue
print(f"{checked-len(fails)} pass / {len(fails)} fail"
      + (f" ({len(oracle)-checked} not dumped)" if checked < len(oracle) else ""))
for n, why in fails: print("FAIL", n, why[:300])
sys.exit(1 if fails else 0)
