#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row count, column names, and values (sorted columns by name,
rows in result order; floats compared both exactly and with tolerance so we
can see WHICH kind of mismatch we have).
"""
import json, math, os, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        print(f"[MISS] {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"[SCHEMA] {name}: spark={gcols} oracle={ecols}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"[ROWS] {name}: spark={len(got)} oracle={len(exp)}"); fails += 1; continue
    got, exp = got[gcols], exp[ecols]
    exact = True; approx = True; detail = None
    for c in gcols:
        for i, (a, b) in enumerate(zip(got[c].tolist(), exp[c].tolist())):
            af, bf = isinstance(a, float), isinstance(b, float)
            if af and bf:
                if math.isnan(a) and math.isnan(b): continue
                if a != b:
                    exact = False
                    if not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
                        approx = False; detail = detail or (c, i, a, b)
            else:
                if str(a) != str(b):
                    exact = False; approx = False
                    detail = detail or (c, i, a, b)
    if exact:
        print(f"[OK  ] {name}: {len(got)} rows exact")
    elif approx:
        print(f"[~OK ] {name}: {len(got)} rows, float-only ulp diffs (HASH RISK)")
        fails += 1
    else:
        c, i, a, b = detail
        print(f"[FAIL] {name}: col={c} row={i} spark={a!r} oracle={b!r}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
