#!/usr/bin/env python3
"""Mimic the driver's correctness gate: for each query parquet dumped by
graft.Verify, run the oracle SQL in DuckDB over the same sf dir and compare
schema + sorted values."""
import sys, json, glob, duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted([p.split('/')[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith('.json')])
fails = []
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name:28s} NO-OUTPUT"); fails.append(name); continue
    got = pq.read_table(files).to_pandas()
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(got)} rows " + ("OK" if len(got)>0 else "EMPTY!"))
        if len(got)==0: fails.append(name)
        continue
    try:
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE-SQL-ERROR: {e}"); fails.append(name); continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"{name:28s} SCHEMA-MISMATCH spark={gcols} duck={wcols}"); fails.append(name); continue
    g = got[gcols].reset_index(drop=True); w = want[wcols].reset_index(drop=True)
    if len(g) != len(w):
        print(f"{name:28s} ROWCOUNT spark={len(g)} duck={len(w)}"); fails.append(name); continue
    gs = g.astype(str).apply(lambda r: '|'.join(r), axis=1).sort_values().reset_index(drop=True) if len(g) else None
    ws = w.astype(str).apply(lambda r: '|'.join(r), axis=1).sort_values().reset_index(drop=True) if len(w) else None
    eq = bool((gs == ws).all()) if len(g) else True
    if eq:
        print(f"{name:28s} MATCH ({len(g)} rows)")
    else:
        bad = (gs != ws)
        i = int(bad.idxmax())
        print(f"{name:28s} VALUE-MISMATCH at sorted row {i}:\n  spark={gs[i]}\n  duck ={ws[i]}")
        fails.append(name)
print(("\nFAILED: " + ", ".join(fails)) if fails else "\nALL MATCH")
sys.exit(1 if fails else 0)
