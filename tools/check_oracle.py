#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs the Verify parquet dumps,
mimicking the driver's DuckDB compare (sort columns by name, sort rows,
hash values). Usage: check_oracle.py <sfdir> <verify_out>.
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}"))
        continue
    # driver-style canonicalization: sort columns by name, then rows
    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        # stringify with rounding for floats
        out = []
        for _, row in df.iterrows():
            cells = []
            for v in row:
                if isinstance(v, float):
                    cells.append(f"{v:.6g}")
                else:
                    cells.append(str(v))
            out.append("|".join(cells))
        return out
    a, b = canon(spark_df), canon(duck_df)
    if list(spark_df.columns.sort_values()) != list(duck_df.columns.sort_values()):
        fails.append((name, f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"))
    elif len(a) != len(b):
        fails.append((name, f"rowcount: spark={len(a)} duck={len(b)}"))
    elif a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        fails.append((name, f"values differ, first diffs: {diff}"))
    else:
        print(f"OK   {name} ({len(a)} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
