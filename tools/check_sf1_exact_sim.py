#!/usr/bin/env python3
"""Sampled-slice sf1 contracts for the EXACT similarity joins
(q_simjoin_prefix, q_containment): their full brute-force DuckDB oracles
are quadratic in docs (infeasible at the sf1 corpus' 50k), but both
queries' verdicts are PER-PAIR exact predicates (the prefix machinery
only prunes candidates; the exact verify decides membership), so the
output restricted to sample x sample must EQUAL the brute force over the
sample — pairs AND values, both directions, no recall allowance (unlike
the banded minhash check, nothing here is probabilistic). Sample:
md5-bucket(doc_id) % 25 == 0, the repo's reingest-stable sampling idiom
(same slice as check_sf1_neardup.py).
Usage: check_sf1_exact_sim.py <sf1Dir> <verifyOutDir>
"""
import sys
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
docs = f"{sfdir}/documents.parquet/*.parquet"

GRAMS = f"""
WITH s0 AS (
  SELECT doc_id, text FROM read_parquet('{docs}')
  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 25 = 0),
d AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(w) - 1),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM (SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        FROM s0)
  WHERE len(w) >= 3),
s AS (SELECT doc_id, g, len(g) AS n FROM d)
"""

sample = set(r[0] for r in con.sql(f"""
  SELECT doc_id FROM read_parquet('{docs}')
  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 25 = 0""").fetchall())
print(f"sample docs: {len(sample)}")

fails = []


def check(name, truth_sql, got_rows, keycols):
    truth = {}
    for row in con.sql(truth_sql).fetchall():
        truth[tuple(row[:keycols])] = tuple(row[keycols:])
    got = {}
    for row in got_rows:
        ids = tuple(int(v) for v in row[:keycols])
        if all(i in sample for i in ids):
            got[ids] = tuple(row[keycols:])
    missing = set(truth) - set(got)
    extra = set(got) - set(truth)
    diffs = [(k, got[k], truth[k]) for k in set(got) & set(truth)
             if any(abs(a - b) > 1e-12 for a, b in zip(got[k], truth[k]))]
    print(f"{name}: exact sample pairs {len(truth)}; restricted output "
          f"{len(got)}")
    if missing or extra or diffs:
        print(f"FAIL  {name}: missing={sorted(missing)[:5]} "
              f"extra={sorted(extra)[:5]} value_diffs={diffs[:3]}")
        fails.append(name)
    elif not truth:
        print(f"FAIL  {name}: vacuous — no qualifying pair in the sample")
        fails.append(name)
    else:
        print(f"OK    {name}: restriction == brute force exactly "
              "(pairs and values, both directions)")


# q_simjoin_prefix: symmetric Jaccard >= 0.7, a < b
sj = pq.read_table(f"{outdir}/q_simjoin_prefix").to_pandas()
check("q_simjoin_prefix",
      GRAMS + """
  SELECT doc_id_a, doc_id_b, inter, jaccard FROM (
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
      len(list_intersect(a.g, b.g)) AS inter,
      CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        / (a.n + b.n - len(list_intersect(a.g, b.g))) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id)
  WHERE jaccard >= 0.7""",
      [(int(r.doc_id_a), int(r.doc_id_b), float(r.inter_cnt), float(r.jaccard))
       for r in sj.itertuples()],
      keycols=2)

# q_containment: one-sided containment >= 0.8, probe slice doc_id%3==0
ct = pq.read_table(f"{outdir}/q_containment").to_pandas()
check("q_containment",
      GRAMS + """
  SELECT doc_id, container, n_grams, inter, containment FROM (
    SELECT a.doc_id AS doc_id, b.doc_id AS container,
      a.n AS n_grams, len(list_intersect(a.g, b.g)) AS inter,
      CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / a.n AS containment
    FROM s a JOIN s b ON a.doc_id % 3 = 0 AND a.doc_id <> b.doc_id)
  WHERE containment >= 0.8""",
      [(int(r.doc_id), int(r.container), float(r.n_grams),
        float(r.inter_cnt), float(r.containment)) for r in ct.itertuples()],
      keycols=2)

if fails:
    sys.exit(1)
