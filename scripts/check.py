#!/usr/bin/env python3
"""Local dev self-check mimicking the driver's correctness gate:
run Verify output (parquet per query) against DuckDB oracle SQL on the same
sf dir, compare row counts + sorted values. Dev-only tool (driver-side python
env); NOT part of the engine.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if v is None: return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes): return v.hex()
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failures += 1; continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}"); failures += 1; continue
        s_rows = sorted(tuple(norm(r[c]) for c in s_cols) for r in spark_tbl.to_pylist())
        d_rows = sorted(tuple(norm(r[c]) for c in s_cols) for r in duck.to_pylist())
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}"); failures += 1; continue
        if s_rows != d_rows:
            bad = next(i for i,(a,b) in enumerate(zip(s_rows,d_rows)) if a!=b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  spark: {s_rows[bad]}")
            print(f"  duck : {d_rows[bad]}")
            failures += 1; continue
        print(f"PASS {name} ({len(s_rows)} rows)")
    # queries without oracle = rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            n = sum(pq.read_table(f).num_rows for f in glob.glob(f"{d}/*.parquet"))
            print(f"INFO {name}: no oracle, {n} rows")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
