#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run graft.Verify
at a scale factor, then execute each oracle SQL in DuckDB over the
same parquet tables and compare row sets (column-name-sorted, value
comparison with exact match after both engines' own rounding).

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    spark_tbl = pq.read_table(files[0])
    try:
        duck = con.execute(sql).arrow()
    except Exception as e:
        results[name] = f"ORACLE_ERROR: {e}"
        continue
    scols = sorted(spark_tbl.column_names)
    dcols = sorted(duck.column_names)
    if scols != dcols:
        results[name] = f"SCHEMA_MISMATCH spark={scols} duck={dcols}"
        continue
    # Arrow-TYPE parity (VERDICT r11 #1/#2): the driver's compare hashes
    # serialized values, so a type divergence (e.g. DuckDB promoting
    # integer sum() to HUGEINT -> decimal128(38,0) vs Spark's int64)
    # fails the driver even when every value matches. The local gate
    # must be at least as strict: any per-column Arrow type difference
    # is a hard failure here, so this class can never reach the driver.
    tdiffs = [
        f"{c}: spark={spark_tbl.schema.field(c).type} duck={duck.schema.field(c).type}"
        for c in scols
        if str(spark_tbl.schema.field(c).type) != str(duck.schema.field(c).type)
    ]
    if tdiffs:
        results[name] = f"TYPE_MISMATCH {'; '.join(tdiffs)}"
        continue
    def norm(tbl):
        rows = []
        for row in zip(*[tbl.column(c).to_pylist() for c in sorted(tbl.column_names)]):
            rows.append(tuple(
                round(v, 9) if isinstance(v, float) else v for v in row))
        return sorted(rows, key=lambda r: tuple(str(x) for x in r))
    s, d = norm(spark_tbl), norm(duck)
    retried = ""
    if s != d or len(s) != len(d):
        # DuckDB's parallel float aggregation is order-nondeterministic and
        # can land on a rounding boundary (one observed flake in ~16 full
        # catalog runs). Retry the oracle single-threaded before flagging —
        # but SURFACE the pre-retry difference either way: a retry that
        # flips the verdict to OK is a boundary-straddling convention that
        # should be fixed, not silently masked (ADVICE r10).
        pre = next(((i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b),
                   ("rowcount", len(s), len(d)))
        try:
            con.execute("SET threads=1")
            duck = con.execute(sql).arrow()
            d = norm(duck)
            retried = ", single-thread retry"
            if s == d:
                print(f"[retry-flip] {name}: parallel-oracle run differed at "
                      f"sorted row {pre[0]}: spark={pre[1]} duck={pre[2]} "
                      f"(single-threaded rerun matches — boundary-straddling "
                      f"rounding in the oracle SQL; fix the convention)")
        finally:
            con.execute("RESET threads")
    if len(s) != len(d):
        results[name] = f"ROWCOUNT {len(s)} vs {len(d)}"
    elif s != d:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b)
        results[name] = f"VALUE_MISMATCH at sorted row {diff[0]}: spark={diff[1]} duck={diff[2]}"
        # full-rowset dump: a mismatch must be self-explaining after the
        # fact (VERDICT r10 #1) — both engines' sorted rows side by side
        dump = f"{outdir}/{name}.mismatch.txt"
        with open(dump, "w") as f:
            f.write(f"columns (sorted): {scols}\n")
            nd = max(len(s), len(d))
            for i in range(nd):
                a = s[i] if i < len(s) else "<absent>"
                b = d[i] if i < len(d) else "<absent>"
                tag = "  " if a == b else "!!"
                f.write(f"{tag} row {i}: spark={a} duck={b}\n")
        print(f"[mismatch-dump] {name}: engine/oracle rowsets -> {dump}")
    else:
        results[name] = f"OK ({len(s)} rows{retried})"

width = max(len(n) for n in results)
ok = sum(1 for v in results.values() if v.startswith("OK"))
for name, v in sorted(results.items()):
    print(f"{name:<{width}}  {v[:200]}")
print(f"\n{ok}/{len(results)} queries match")
sys.exit(0 if ok == len(results) else 1)
