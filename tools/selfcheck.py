#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle
SQL in DuckDB over the sf tables and compare against the parquet the
Verify main dumped. Columns sorted by name, rows compared exactly."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"

# The oracle engine version IS part of the contract: round 8's only
# red gate was a DuckDB-version rounding delta invisible locally.
# Rounding-free emit edges (integer micro-units) are the durable fix;
# this line makes any residual version skew diagnosable.
print(f"oracle: duckdb {duckdb.__version__} / pandas {pd.__version__}")

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver tables are single files; ScaleGen tables are directories
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    sel = f"SELECT * FROM read_parquet('{pat}')"
    if name == "events":
        # ScaleGen writes ts as epoch-ns BIGINT (Spark cannot write
        # TIMESTAMP(NANOS)); the oracle SQL reads ts only at µs
        # timestamp column — normalize in the view
        t = con.execute(f"SELECT typeof(ts) FROM ({sel}) LIMIT 1").fetchone()[0]
        if t == "BIGINT":
            sel = (f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                   f"FROM read_parquet('{pat}')")
    con.execute(f"CREATE VIEW {name} AS {sel}")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"SQL ERROR: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"SCHEMA {list(got.columns)} vs {list(exp.columns)}")); continue
    # the driver hashes raw cell values, so a dtype skew (e.g. DuckDB
    # HUGEINT -> float64 vs Spark int64) is a real failure even when
    # values compare numerically equal
    dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(exp[c].dtype)]
    if dt:
        fails.append((name, f"DTYPE {dt}")); continue
    if len(got) != len(exp):
        fails.append((name, f"ROWS {len(got)} vs {len(exp)}")); continue
    diffs = []
    for c in got.columns:
        a, b = got[c], exp[c]
        if a.dtype == object or b.dtype == object:
            eq = [str(x) == str(y) or (pd.isna(x) and pd.isna(y))
                  if not isinstance(x, (list, tuple)) and not hasattr(x, "__len__") or isinstance(x, str)
                  else list(x) == list(y) for x, y in zip(a, b)]
            if not all(eq):
                i = eq.index(False)
                diffs.append(f"{c}[{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r}")
        else:
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"{c}[{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r}")
    if diffs:
        fails.append((name, "; ".join(diffs[:3])))
    else:
        passes.append(name)

for n in passes:
    print(f"PASS {n}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
