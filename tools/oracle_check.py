"""Local replay of the driver's DuckDB oracle gate (rows/schema/values).

Run Verify first:  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
Then:              python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"create view {name} as select * from '{t}'")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float): return f"{v!r}"
        return str(v)
    return sorted(tuple(cell(r[i]) for i in order) for r in rows)

fails, rows_only = [], []
checked = 0
for name in sorted(json.load(open(f"{out_dir}/oracle_sql.json"))):
    sql = oracle[name]
    if not glob.glob(f"{out_dir}/{name}/*.parquet"):
        continue  # filtered Verify dump (local iteration on a subset)
    checked += 1
    sp = con.execute(f"select * from '{out_dir}/{name}/*.parquet'")
    sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
    try:
        du = con.execute(sql)
        du_rows, du_cols = du.fetchall(), [d[0] for d in du.description]
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    if len(sp_rows) != len(du_rows):
        fails.append((name, f"rows {len(sp_rows)} vs {len(du_rows)}")); continue
    if sorted(sp_cols) != sorted(du_cols):
        fails.append((name, f"schema {sorted(sp_cols)} vs {sorted(du_cols)}")); continue
    if canon(sp_rows, sp_cols) != canon(du_rows, du_cols):
        a, b = canon(sp_rows, sp_cols), canon(du_rows, du_cols)
        diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), -1)
        fails.append((name, f"value mismatch at sorted row {diff}: {a[diff] if diff>=0 else ''} vs {b[diff] if diff>=0 else ''}"))
        continue
print(f"{checked-len(fails)} pass / {len(fails)} fail"
      + (f" ({len(oracle)-checked} not dumped)" if checked < len(oracle) else ""))
for n, why in fails: print("FAIL", n, why[:300])
sys.exit(1 if fails else 0)
