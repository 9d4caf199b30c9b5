#!/usr/bin/env python3
"""Planted-clique sf1 contract for the seven clustering-dependent /
sequential-fold near-dup queries (round-13 verdict task 1): their
brute-force oracles are quadratic in docs (infeasible at 50k) and naive
sample restriction is unsound for CLUSTER outputs (in-sample docs may
cluster through out-of-sample links). graft.Sf1CliqueBuild makes the
out-of-sample links impossible by construction — each planted clique has
its own token vocabulary, disjoint from every other clique and (asserted
below) absent from all organic text — so the restriction of each query's
output to planted ids (>= 9e8) must equal that query's OWN oracle SQL
(read verbatim from the Verify dump's oracle_sql.json, zero semantic
drift) evaluated over the planted documents ALONE (~250 docs: the
quadratic closure is trivial there).

Soundness preconditions, each asserted, not assumed:
  1. vocabulary disjointness: no organic doc contains a clique token;
  2. every planted near-dup pair is clique-internal, and all
     within-clique pairs sit at J >= 0.9 — the regime where
     16-bands-of-4 recall is 1 - (1 - J^4)^16 > 1 - 2e-9 (the same
     structural argument the sf0.01/0.1 fixture oracles rest on);
  3. no MIXED output row (one planted id, one organic) in any pair
     query — the direct witness that planted links stayed internal.

Usage: check_sf1_cliques.py <cliqueDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd

PLANT_MIN = 900000000

QUERIES = {
    # name -> (planted id columns, all other columns untouched)
    "q_dedup_cross": ["doc_id_a", "doc_id_b"],
    "q_dedup_clusters": ["doc_id", "cluster_id"],
    "q_cluster_canonical": ["doc_id", "cluster_id", "canonical_id"],
    "q_containment_canonical": ["doc_id", "container"],
    "q_stream_containment": ["doc_id", "container"],
    "q_stream_neardup_filter": ["doc_id"],
    "q_stream_neardup_grow": ["doc_id"],
}

cliquedir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
docs = f"{cliquedir}/documents.parquet/*.parquet"

# ---- precondition 1: organic text never carries clique vocabulary ----
n_leak = con.sql(f"""
  SELECT count(*) FROM read_parquet('{docs}')
  WHERE doc_id < {PLANT_MIN}
    AND regexp_matches(text, 'clq[0-9]+(tok|ext)[0-9]+')""").fetchone()[0]
if n_leak:
    print(f"FAIL  vocabulary leak: {n_leak} organic docs carry clique tokens")
    sys.exit(1)

n_planted = con.sql(f"""
  SELECT count(*) FROM read_parquet('{docs}')
  WHERE doc_id >= {PLANT_MIN}""").fetchone()[0]
if n_planted < 100:
    print(f"FAIL  only {n_planted} planted docs — wrong fixture?")
    sys.exit(1)

# ---- precondition 2: planted pairs are clique-internal and J >= 0.9 ----
# clique id is derivable from the text itself (first token = clq{c}tok0)
pairrows = con.sql(f"""
WITH p AS (
  SELECT doc_id, text,
    regexp_extract(text, 'clq([0-9]+)tok', 1) AS clique
  FROM read_parquet('{docs}') WHERE doc_id >= {PLANT_MIN}),
d AS (
  SELECT doc_id, clique,
    list_distinct(list_transform(range(1, len(w) - 1),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM (SELECT doc_id, clique,
          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        FROM p)
  WHERE len(w) >= 3)
SELECT a.clique = b.clique AS same_clique,
  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
    / len(list_distinct(list_concat(a.g, b.g))) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.g, b.g)) > 0 OR a.clique = b.clique
""").fetchall()
cross_clique = [j for same, j in pairrows if not same and j > 0]
low_j = [j for same, j in pairrows if same and j < 0.9]
if cross_clique:
    print(f"FAIL  {len(cross_clique)} cross-clique gram overlaps (max J="
          f"{max(cross_clique):.3f}) — vocabulary not disjoint")
    sys.exit(1)
if low_j:
    print(f"FAIL  {len(low_j)} within-clique pairs below the J>=0.9 recall "
          f"regime (min {min(low_j):.3f})")
    sys.exit(1)
n_intra = sum(1 for same, _ in pairrows if same)
print(f"planted: {n_planted} docs; within-clique pairs: {n_intra} "
      f"(all J >= 0.9); cross-clique overlaps: 0")

# ---- the planted-only oracle view ----
con.sql(f"""CREATE VIEW documents AS
  SELECT * FROM read_parquet('{docs}') WHERE doc_id >= {PLANT_MIN}""")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# comparator = tools/check_oracle.py's, verbatim semantics
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        out[c] = df[c]
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def cell_eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

fails = []
for name, idcols in sorted(QUERIES.items()):
    pq_path = f"{outdir}/{name}"
    if name not in oracle:
        print(f"MISSING  {name}: no oracle_sql.json entry"); fails.append(name); continue
    if not os.path.isdir(pq_path):
        print(f"MISSING  {name}: no parquet dump"); fails.append(name); continue
    full = pq.read_table(pq_path).to_pandas()
    # precondition 3: no mixed row — every id column of a row is on the
    # same side of the planted boundary
    flags = pd.concat([(full[c] >= PLANT_MIN) for c in idcols], axis=1)
    mixed = full[flags.any(axis=1) & ~flags.all(axis=1)]
    if len(mixed):
        print(f"MIXED    {name}: {len(mixed)} rows link planted to organic "
              f"(first: {mixed.iloc[0].to_dict()})")
        fails.append(name); continue
    mine = full[flags.all(axis=1)].reset_index(drop=True)
    ref = con.sql(oracle[name]).df()
    if sorted(mine.columns) != sorted(ref.columns):
        print(f"SCHEMA   {name}: mine={sorted(mine.columns)} ref={sorted(ref.columns)}")
        fails.append(name); continue
    if len(mine) != len(ref):
        print(f"ROWS     {name}: restricted mine={len(mine)} planted-oracle={len(ref)}")
        fails.append(name); continue
    if len(mine) == 0:
        print(f"VACUOUS  {name}: planted restriction is empty")
        fails.append(name); continue
    cm, cr = canon(mine), canon(ref)
    bad = None
    for c in cm.columns:
        for i, (x, y) in enumerate(zip(cm[c].tolist(), cr[c].tolist())):
            if not cell_eq(x, y):
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        print(f"VALUE    {name}: col={c} row={i} mine={x!r} ref={y!r}")
        fails.append(name)
    else:
        print(f"OK       {name} ({len(mine)} planted rows, exact)")

print(f"\n{len(QUERIES)-len(fails)}/{len(QUERIES)} planted-clique contracts OK"
      + (f"; fails: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
