#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and compare (columns sorted by name,
values compared after row-sort). Usage: check_oracle.py <sfDir> <outDir>."""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def _same(x, y):
    if pd.isna(x) and pd.isna(y): return True
    return x == y

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
    if got.dtypes.tolist() != exp.dtypes.tolist():
        print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {exp.dtypes.tolist()}")
    gs = got.sort_values(by=list(got.columns), ignore_index=True) if len(got) else got
    es = exp.sort_values(by=list(exp.columns), ignore_index=True) if len(exp) else exp
    if len(gs) != len(es):
        print(f"FAIL {name}: rows {len(gs)} vs {len(es)}"); fail += 1; continue
    ok = True
    for c in gs.columns:
        a, b = gs[c].values, es[c].values
        if np.issubdtype(gs[c].dtype, np.floating):
            eq = np.array_equal(a, b, equal_nan=True)
        else:
            eq = (pd.Series(a).fillna("\x00") == pd.Series(b).fillna("\x00")).all()
        if not eq:
            idx = next(i for i in range(len(a)) if not _same(a[i], b[i]))
            print(f"FAIL {name}: col {c} differs at row {idx}: {a[idx]!r} vs {b[idx]!r}")
            ok = False; fail += 1
            break
    if ok:
        print(f"OK   {name}: {len(gs)} rows")

print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
