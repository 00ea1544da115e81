#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
same parquet tables, loads the Spark result parquet, sorts columns by
name and rows by all columns, and diffs values. Mirrors (our best guess
of) the driver's compare so oracle mistakes surface before round end.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r1
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pathlib

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = pathlib.Path(outdir) / name
    files = list(spark_dir.glob("*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fail += 1; continue
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fail += 1; continue
    spark = pq.read_table(files[0])
    # sort columns by name
    dcols, scols = sorted(duck.column_names), sorted(spark.column_names)
    if dcols != scols:
        print(f"FAIL {name}: columns differ duck={dcols} spark={scols}"); fail += 1; continue
    def norm(tbl):
        rows = []
        for row in tbl.select(dcols).to_pylist():
            vals = []
            for c in dcols:
                v = row[c]
                if isinstance(v, float):
                    v = round(v, 6)
                vals.append(str(v))
            rows.append("|".join(vals))
        return sorted(rows)
    d, s = norm(duck), norm(spark)
    if len(d) != len(s):
        print(f"FAIL {name}: row counts duck={len(d)} spark={len(s)}"); fail += 1; continue
    bad = [(a, b) for a, b in zip(d, s) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(d)} rows differ; first: duck={bad[0][0]!r} spark={bad[0][1]!r}")
        fail += 1
    else:
        print(f"OK   {name}: {len(d)} rows match")
# queries without oracle: rows-only
import os
for name in sorted(os.listdir(outdir)):
    p = pathlib.Path(outdir) / name
    if p.is_dir() and name not in oracle:
        n = sum(f.stat().st_size for f in p.glob("*.parquet"))
        print(f"INFO {name}: no oracle (rows-only check), parquet bytes={n}")
sys.exit(1 if fail else 0)
