#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfdir> <verify_out_dir>

Registers each parquet table in <sfdir> as a DuckDB view, runs every
oracle SQL from <verify_out_dir>/oracle_sql.json, and compares against
the Spark-written parquet under <verify_out_dir>/<query>/ with columns
sorted by name and rows sorted, value-hash style (exact equality after
the queries' own rounding).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
# guard against comparing stale outputs: a Verify crash leaves old
# parquet + json behind and this script would happily pass against them
qdirs = [d for d in os.listdir(outdir)
         if os.path.isdir(os.path.join(outdir, d))]
missing_dirs = sorted(set(oracles) - set(qdirs))
if missing_dirs:
    print(f"WARNING: {len(missing_dirs)} oracled queries have no spark "
          f"output dir (stale outputs / crashed Verify?): {missing_dirs[:5]}")
print(f"comparing {len(oracles)} oracles against {len(qdirs)} query outputs")
fails = 0
for q, sql in sorted(oracles.items()):
    spark_files = glob.glob(os.path.join(outdir, q, "*.parquet"))
    if not spark_files:
        print(f"MISSING {q}: no spark output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in spark_files])
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"SQL-ERR {q}: {e}")
        fails += 1
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"SCHEMA  {q}: spark={gcols} oracle={ecols}")
        fails += 1
        continue
    got = got[gcols].sort_values(gcols).reset_index(drop=True)
    exp = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"ROWS    {q}: spark={len(got)} oracle={len(exp)}")
        fails += 1
        continue
    # dtype harmonization: int32 vs int64 etc.
    mism = []
    for c in gcols:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            eq = (a == b) | (pd.isna(a) & pd.isna(b))
        else:
            eq = a == b
        if not eq.all():
            bad = int((~eq).sum())
            i = int(np.argmax(~eq))
            mism.append(f"{c}: {bad} diffs, first row {i}: spark={a[i]!r} oracle={b[i]!r}")
    if mism:
        print(f"VALUES  {q}: " + "; ".join(mism[:3]))
        fails += 1
    else:
        print(f"OK      {q} ({len(got)} rows)")
print(f"\n{len(oracles) - fails}/{len(oracles)} oracle queries match")
sys.exit(1 if fails else 0)
