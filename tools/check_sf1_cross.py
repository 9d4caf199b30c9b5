#!/usr/bin/env python3
"""Sampled-slice ORGANIC contract for q_dedup_cross at sf1 (round-13
verdict task 1, second half): the planted-clique contract
(check_sf1_cliques.py) proves the cross-corpus fold's semantics on
synthetic cliques; this check covers the ORGANIC sf1 content the cliques
don't touch. Restriction is sound here because q_dedup_cross is a PAIR
query (exact verify decides each pair independently — no transitive
links), so the banded output restricted to a deterministic ~2k-doc
sample must equal the exact brute-force even×odd pair set over that
sample: precision exact (every banded pair is exact-Jaccard-verified),
recall against the 16-bands-of-4 floor (the sf1 replica pairs sit near
J~0.7 where per-pair recall is ~0.99, not the fixtures' J>=0.9 regime).
Sample: md5-bucket(doc_id) % 25 == 0 over organic ids (< 9e8), the
check_sf1_neardup.py idiom.
Usage: check_sf1_cross.py <sf1OrCliqueDir> <verifyOutDir>
"""
import sys
import duckdb
import pyarrow.parquet as pq

PLANT_MIN = 900000000
sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
docs = f"{sfdir}/documents.parquet/*.parquet"

truth = con.sql(f"""
WITH s0 AS (
  SELECT doc_id, text FROM read_parquet('{docs}')
  WHERE doc_id < {PLANT_MIN}
    AND CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
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
SELECT doc_id_a, doc_id_b, jaccard FROM (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / (a.n + b.n - len(list_intersect(a.g, b.g))) AS jaccard
  FROM s a JOIN s b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7)
WHERE jaccard >= 0.7
""").fetchall()
truth_pairs = {(a, b): j for a, b, j in truth}

sample = set(r[0] for r in con.sql(f"""
  SELECT doc_id FROM read_parquet('{docs}')
  WHERE doc_id < {PLANT_MIN}
    AND CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 25 = 0""").fetchall())

banded = pq.read_table(f"{outdir}/q_dedup_cross").to_pandas()
got_pairs = {}
for _, r in banded.iterrows():
    a, b, j = int(r["doc_id_a"]), int(r["doc_id_b"]), float(r["jaccard"])
    if a in sample and b in sample:
        got_pairs[(a, b)] = j

missing = set(truth_pairs) - set(got_pairs)
extra = set(got_pairs) - set(truth_pairs)
value_diffs = [(k, got_pairs[k], truth_pairs[k])
               for k in set(got_pairs) & set(truth_pairs)
               if abs(got_pairs[k] - truth_pairs[k]) > 0]
recall = 1.0 - len(missing) / len(truth_pairs) if truth_pairs else 0.0
print(f"organic sample docs: {len(sample)}; exact cross pairs: "
      f"{len(truth_pairs)}; banded-restricted: {len(got_pairs)}; "
      f"recall={recall:.4f}")
if missing:
    js = sorted(truth_pairs[k] for k in missing)
    print(f"missed-pair jaccard values (should hug the 0.7 threshold): "
          f"{[round(j, 3) for j in js[:10]]}")
if extra or value_diffs:
    print(f"FAIL  precision must be exact: extra={sorted(extra)[:5]} "
          f"value_diffs={value_diffs[:5]}")
    sys.exit(1)
if not truth_pairs:
    print("FAIL  vacuous: the organic sample contains no cross pair")
    sys.exit(1)
if recall < 0.95:
    print(f"FAIL  recall {recall:.4f} below the 16-bands-of-4 floor")
    sys.exit(1)
print("OK    banded q_dedup_cross vs exact brute force on the sf1 organic "
      f"sample: precision exact, recall {recall:.4f} (>= 0.95 floor)")
