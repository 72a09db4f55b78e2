#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare (dev tool only; the
shipped engine is pure Scala/Spark). Usage:
  python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]
Compares each <name>.parquet (Spark output) against the DuckDB result of
oracle_sql.json[name] over the same parquet tables, value-by-value."""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def _eq(x, y):
    if x is None and y is None: return True
    if isinstance(x, (list, np.ndarray)) or isinstance(y, (list, np.ndarray)):
        xl, yl = list(x), list(y)
        return len(xl) == len(yl) and all(_eq(a, b) for a, b in zip(xl, yl))
    if isinstance(x, float) or isinstance(y, float):
        try: return float(x) == float(y) or (pd.isna(x) and pd.isna(y))
        except Exception: return False
    try:
        return bool(x == y)
    except Exception:
        return str(x) == str(y)

fails, passes, missing = [], [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        missing.append(name); continue
    got = norm(pq.ParquetDataset(os.path.join(out_dir, name)).read().to_pandas())
    try:
        want = norm(con.execute(sql).df())
    except Exception as e:
        fails.append((name, f"DuckDB error: {e}")); continue
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} duck={list(want.columns)}")); continue
    if len(got) != len(want):
        fails.append((name, f"rowcount differ: spark={len(got)} duck={len(want)}")); continue
    bad = None
    # Dtype parity: the driver's hash compare is TYPE-sensitive where this
    # value compare is not. The classic trap: DuckDB SUM(BIGINT) returns
    # HUGEINT (int128 -> pandas object-of-int or float128-ish), which
    # hash-mismatches Spark's int64 even when every value is identical.
    # Flag it here so the builder sees the red before the driver does.
    for c in got.columns:
        a, b = got[c], want[c]
        if b.dtype == object and a.dtype.kind in 'iu':
            nn = b.dropna()
            if len(nn) and all(isinstance(v, int) or type(v).__name__ == 'Decimal'
                               for v in nn):
                bad = (f"col {c}: dtype mismatch spark={a.dtype} duck=object "
                       f"(likely uncast HUGEINT/DECIMAL aggregate — add "
                       f"CAST(... AS BIGINT) in the oracle SQL)")
                break
        if (a.dtype.kind in 'iu' and b.dtype.kind == 'f') or \
           (a.dtype.kind == 'f' and b.dtype.kind in 'iu'):
            bad = (f"col {c}: dtype mismatch spark={a.dtype} duck={b.dtype} "
                   f"(driver hash is type-sensitive — CAST the oracle column)")
            break
    if bad:
        fails.append((name, bad)); continue
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                a2 = pd.to_numeric(a, errors='coerce'); b2 = pd.to_numeric(b, errors='coerce')
                eq = (a2.values == b2.values) | (a2.isna().values & b2.isna().values)
                exact_eq = eq
                if not exact_eq.all():
                    i = int(np.argmin(exact_eq))
                    bad = f"col {c}: row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                    break
            else:
                av = a.astype(object).where(pd.notna(a), None)
                bv = b.astype(object).where(pd.notna(b), None)
                neq = [i for i in range(len(av)) if not _eq(av.iloc[i], bv.iloc[i])]
                if neq:
                    i = neq[0]
                    bad = f"col {c} ({a.dtype}/{b.dtype}): row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                    break
        except Exception as e:
            bad = f"col {c}: compare error {e}"; break
    if bad: fails.append((name, bad))
    else: passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
if missing: print(f"MISSING-OUTPUT {len(missing)}: {' '.join(missing)}")
for n, why in fails: print(f"FAIL {n}: {why}")
sys.exit(1 if fails or missing else 0)
