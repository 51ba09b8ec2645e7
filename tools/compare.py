#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify parquet
dumps against DuckDB oracle results (sorted columns, sorted rows)."""
import sys, json, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out, key=repr)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        orel = con.execute(sql)
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        if sc != oc:
            fails.append((name, f"schema mismatch spark={sc} oracle={oc}"))
        elif len(sr) != len(orr):
            fails.append((name, f"rowcount spark={len(sr)} oracle={len(orr)}"))
        elif sr != orr:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(sr, orr)) if a != b)
            fails.append((name, f"value mismatch at sorted row {diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}"))
        else:
            passes.append((name, len(sr)))
    except Exception as e:
        fails.append((name, f"error: {e}"))

for n, c in passes:
    print(f"PASS {n} ({c} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} pass / {len(fails)} fail (of {len(oracle)} oracled)")
sys.exit(1 if fails else 0)
