#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and compare per query.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]
(Verify must already have written <outDir>/<name>/ parquet + oracle_sql.json.)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
tables = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
for t in tables:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        want = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); fails += 1; continue
    # driver hashes raw values incl. type: int64 20100 != float64 20100.0.
    # DuckDB HUGEINT (SUM of BIGINT) fetches as float64 — flag kind mismatches.
    kind_bad = [c for c in got.columns
                if got[c].dtype.kind != want[c].dtype.kind]
    if kind_bad:
        print(f"FAIL {name}: dtype-kind mismatch {[(c, str(got[c].dtype), str(want[c].dtype)) for c in kind_bad]}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    bad = None
    for c in got.columns:
        g, w = got[c].values, want[c].values
        if np.issubdtype(g.dtype, np.floating):
            both_nan = pd.isna(g) & pd.isna(w)
            neq = ~(both_nan | np.isclose(g.astype(float), w.astype(float),
                                          rtol=0, atol=1e-9, equal_nan=True))
        else:
            neq = ~((pd.isna(g) & pd.isna(w)) | (g == w))
        if neq.any():
            i = int(np.argmax(neq))
            bad = f"col {c} row {i}: spark={g[i]!r} oracle={w[i]!r} ({int(neq.sum())} diffs)"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); fails += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")
print(f"== {fails} failures / {len([n for n in oracle if not only or n in only])} checked")
sys.exit(1 if fails else 0)
