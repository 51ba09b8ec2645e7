#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify parquet
dumps against DuckDB oracle results the way the driver does — pandas frames,
sorted columns, sorted rows — and DTYPE-STRICT, so type artifacts that fail
the driver (int64 vs float64 from HUGEINT sums, unsortable ARRAY cells,
datetime64 overflow) fail here too instead of slipping through."""
import sys, json, math
import duckdb
import numpy as np
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def kind(dtype):
    """Collapse dtypes into comparison classes the driver distinguishes:
    int vs float vs bool vs datetime vs object. datetime64[us] and [ns]
    compare equal value-wise in the driver, so they share a class."""
    k = dtype.kind  # i/u -> int, f -> float, b -> bool, M -> datetime, O -> object
    return {"u": "i"}.get(k, k)


def norm_cell(v):
    if isinstance(v, (np.ndarray, list, tuple)):
        # the driver's sort crashes on array cells — flag them, don't hide them
        raise TypeError("unsortable ARRAY cell in result (driver would err)")
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return round(float(v), 9)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return list(df.columns), [str(k(d)) for d in df.dtypes for k in (kind,)], sorted(rows, key=repr)


fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        sdf = pd.read_parquet(f"{out_dir}/{name}")
        odf = con.execute(sql).df()
        sc, sk, sr = canon(sdf)
        oc, ok, orr = canon(odf)
        if sc != oc:
            fails.append((name, f"schema mismatch spark={sc} oracle={oc}"))
        elif sk != ok:
            fails.append((name, f"DTYPE mismatch (driver hash would differ): "
                          f"spark={list(zip(sc, sk))} oracle={list(zip(oc, ok))}"))
        elif len(sr) != len(orr):
            fails.append((name, f"rowcount spark={len(sr)} oracle={len(orr)}"))
        elif sr != orr:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(sr, orr)) if a != b)
            fails.append((name, "value mismatch at sorted row "
                          f"{diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}"))
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
