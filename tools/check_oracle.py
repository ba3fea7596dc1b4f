#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare to the Spark parquet dump
(columns sorted by name, rows sorted, values hashed)."""
import sys, os, json, duckdb, math

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1; continue
    dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(exp[c].dtype)]
    if dt:
        print(f"WARN {name}: dtype mismatches {dt}")
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = 0
    for c in gs.columns:
        for a, b in zip(gs[c].tolist(), es[c].tolist()):
            an = isinstance(a, float) and math.isnan(a) or a is None
            bn = isinstance(b, float) and math.isnan(b) or b is None
            if an and bn: continue
            if an != bn or a != b:
                if bad == 0:
                    print(f"FAIL {name}: col {c}: {a!r} != {b!r}")
                bad += 1
    if bad: fails += 1
    else: print(f"PASS {name} ({len(got)} rows)")
print("RESULT:", "ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
