#!/usr/bin/env python3
"""Sampled-slice near-dup oracle at sf1 (SURVEY 7.7 item): the banded
MinHash families' full brute-force DuckDB oracles are quadratic in docs
(infeasible at the sf1 corpus' 50k), so verify them on a DETERMINISTIC
~2k-doc sample instead — brute-force the exact Jaccard pair set over the
sample in DuckDB and assert the banded q_dedup_minhash output (dumped by
graft.Verify at sf1) RESTRICTED to sample x sample equals it exactly
(pairs and jaccard values). Sample: md5-bucket(doc_id) % 25 == 0, the
repo's reingest-stable sampling idiom.
Usage: check_sf1_neardup.py <sf1Dir> <verifyOutDir>
"""
import sys
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
docs = f"{sfdir}/documents.parquet/*.parquet"

truth = con.sql(f"""
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
SELECT doc_id_a, doc_id_b, jaccard FROM (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / (a.n + b.n - len(list_intersect(a.g, b.g))) AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id
    AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7)
WHERE jaccard >= 0.7
""").fetchall()
truth_pairs = {(a, b): j for a, b, j in truth}

sample = set(r[0] for r in con.sql(f"""
  SELECT doc_id FROM read_parquet('{docs}')
  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 25 = 0""").fetchall())

banded = pq.read_table(f"{outdir}/q_dedup_minhash").to_pandas()
got_pairs = {}
for _, r in banded.iterrows():
    a, b, j = int(r["doc_id_a"]), int(r["doc_id_b"]), float(r["jaccard"])
    if a in sample and b in sample:
        got_pairs[(a, b)] = j

# Contract: PRECISION is exact by construction (the banded output is
# exact-Jaccard-verified, so every restricted pair must be a true pair
# with the identical jaccard value — hashed-gram counts equal string-gram
# counts up to 2^-64); RECALL is probabilistic because the sf1 replica
# pairs (" sftagN" suffixes) sit near J~0.7 where 16-bands-of-4 recall is
# ~0.99, not the fixture's J>=0.9 regime where it is 1-5e-8. Assert
# precision exactly and recall against the banding curve's floor.
missing = set(truth_pairs) - set(got_pairs)
extra = set(got_pairs) - set(truth_pairs)
value_diffs = [(k, got_pairs[k], truth_pairs[k])
               for k in set(got_pairs) & set(truth_pairs)
               if abs(got_pairs[k] - truth_pairs[k]) > 0]
recall = 1.0 - len(missing) / len(truth_pairs) if truth_pairs else 0.0
print(f"sample docs: {len(sample)}; exact sample pairs: {len(truth_pairs)}; "
      f"banded-restricted pairs: {len(got_pairs)}; recall={recall:.4f}")
if missing:
    js = sorted(truth_pairs[k] for k in missing)
    print(f"missed-pair jaccard values (should all hug the 0.7 threshold): "
          f"{[round(j, 3) for j in js[:10]]}")
if extra or value_diffs:
    print(f"FAIL  precision must be exact: extra={sorted(extra)[:5]} "
          f"value_diffs={value_diffs[:5]}")
    sys.exit(1)
if not truth_pairs:
    print("FAIL  vacuous: the sample contains no near-dup pair")
    sys.exit(1)
if recall < 0.95:
    print(f"FAIL  recall {recall:.4f} below the 16-bands-of-4 floor")
    sys.exit(1)
print("OK    banded q_dedup_minhash vs exact brute force on the sf1 sample: "
      f"precision exact, recall {recall:.4f} (>= 0.95 banding floor)")
