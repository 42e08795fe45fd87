#!/usr/bin/env python3
"""Local oracle self-check (mirrors the driver's t2 gate): read each
outDir/<name> parquet produced by graft.Verify, run the matching SQL from
oracle_sql.json in DuckDB over the same testdata parquet, and compare
row-count / schema(names) / values (sorted by all columns, columns sorted
by name). Floats compared exactly first, then with 1e-9 rel tolerance so
we can see HOW wrong a mismatch is."""
import json, sys, math, glob, os
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output")); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        fails.append((name, f"schema: spark={gcols} duck={wcols}")); continue
    got, want = got[gcols], want[wcols]
    if len(got) != len(want):
        fails.append((name, f"rows: spark={len(got)} duck={len(want)}")); continue
    def sortable(df):
        if len(df) == 0: return df
        key = df.astype(str).apply(lambda r: "\x01".join(r), axis=1)
        return df.iloc[key.sort_values().index].reset_index(drop=True)
    gs, ws = sortable(got), sortable(want)
    bad = None
    for c in gcols:
        gv, wv = gs[c].tolist(), ws[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a is None and b is None: continue
            try:
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b): continue
                    if a != b and abs(a-b) > 1e-9*max(1, abs(a), abs(b)):
                        bad = f"col {c} row {i}: {a!r} != {b!r}"; break
                    if a != b:
                        bad = bad or f"FUZZY col {c} row {i}: {a!r} ~ {b!r}"
                elif str(a) != str(b):
                    bad = f"col {c} row {i}: {a!r} != {b!r}"; break
            except Exception as e:
                bad = f"col {c} row {i}: cmp error {e}"; break
        if bad and not bad.startswith("FUZZY"): break
    if bad and not bad.startswith("FUZZY"):
        fails.append((name, bad))
    else:
        passes.append((name, bad or "exact"))

for n, m in passes: print(f"PASS {n} ({m})")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail / oracle total {len(oracle)}")
sys.exit(1 if fails else 0)
