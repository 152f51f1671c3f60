#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables. Dev tool only (the
shipped library is pure Scala/Spark)."""
import duckdb, json, math, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    rdir = f"{out}/{name}"
    if not os.path.isdir(rdir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{rdir}/*.parquet')").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns {sc} vs {dc}"); fails += 1; continue
    a = spark_df[sc]; b = duck_df[sc]
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fails += 1; continue
    def norm(df):
        rows = []
        for t in df.itertuples(index=False):
            r = []
            for v in t:
                if isinstance(v, float):
                    r.append(round(v, 6))
                else:
                    r.append(str(v))
            rows.append(tuple(r))
        return sorted(rows)
    ra, rb = norm(a), norm(b)
    if ra != rb:
        bad = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y][:3]
        print(f"FAIL {name}: value mismatch at sorted rows {bad}")
        for i in bad[:2]:
            print(f"  spark: {ra[i]}")
            print(f"  duck : {rb[i]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(a)} rows)")
print(f"{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
