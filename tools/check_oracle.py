#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
read each query's parquet dump (written by graft.Verify), run the
corresponding oracle SQL in DuckDB over the same fixture tables, and
compare order-insensitively (sort columns by name, sort rows, compare
values). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
import os as _os
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    # driver fixtures are single files; Spark-built scale dirs (Sf1Build)
    # are directories of part files — glob those
    if _os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, decimals/objects to stable strings
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            s = s.astype("datetime64[ns]")
        out[c] = s.map(lambda v: repr(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, str) else v)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def cell_eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

fails = []
import os
for name, sql in sorted(oracle.items()):
    pq_path = f"{outdir}/{name}"
    if not os.path.isdir(pq_path):
        print(f"MISSING  {name} (no parquet dump)")
        fails.append(name); continue
    try:
        tbl = pq.read_table(pq_path)
        # the DRIVER's comparator dies on nested top-level columns
        # (pandas sort_values -> unhashable numpy.ndarray), so fail here too
        nested = [f.name for f in tbl.schema if pa.types.is_nested(f.type)]
        if nested:
            print(f"NESTED   {name}: driver comparator cannot hash {nested}")
            fails.append(name); continue
        mine = tbl.to_pandas()
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails.append(name); continue
    if sorted(mine.columns) != sorted(ref.columns):
        print(f"SCHEMA   {name}: mine={sorted(mine.columns)} ref={sorted(ref.columns)}")
        fails.append(name); continue
    if len(mine) != len(ref):
        print(f"ROWS     {name}: mine={len(mine)} ref={len(ref)}")
        fails.append(name); continue
    cm, cr = canon(mine), canon(ref)
    bad = None
    for c in cm.columns:
        a, b = cm[c].tolist(), cr[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if not cell_eq(x, y):
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        print(f"VALUE    {name}: col={c} row={i} mine={x!r} ref={y!r}")
        fails.append(name)
    else:
        print(f"OK       {name} ({len(mine)} rows)")

# rows-only queries (no oracle): report row counts. The driver dies on
# nested columns even on this path, so nested => fail here too (tracked
# separately so the oracled-query count stays honest).
rowsonly_fails = []
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        try:
            t = pq.read_table(p)
            nested = [f.name for f in t.schema if pa.types.is_nested(f.type)]
            if nested:
                print(f"ROWSONLY {d} NESTED: driver comparator cannot hash {nested}")
                rowsonly_fails.append(d)
            else:
                print(f"ROWSONLY {d} ({t.num_rows} rows)")
        except Exception as e:
            print(f"ROWSONLY {d} ERROR: {e}")
            rowsonly_fails.append(d)

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracled queries OK; fails: {fails}"
      + (f"; rows-only fails: {rowsonly_fails}" if rowsonly_fails else ""))
sys.exit(1 if fails or rowsonly_fails else 0)
