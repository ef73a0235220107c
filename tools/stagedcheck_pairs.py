#!/usr/bin/env python3
"""Staged oracle for q140's routed pair set above the gate SFs
(round-11 verdict #4): DuckDB replays the within-bucket exact pair
join over the ENGINE-exported top-2 multi-assignment (written by
graft.StagedVerifyPairs), with vectors re-read from the rung's own
embeddings parquet — so cosines come from DuckDB's
list_cosine_similarity, the same surface the gate oracle uses. The
assignment construction itself is oracle-verified at sf0.01/sf0.1
through the gate's `asg2` CTE chain; this check makes the blocked
pair kernel + cross-cell dedup independently verified at sf10+.

Both directions are checked, exactly (cos_r is the 4-dp rounded
cosine on both sides, no tolerance):
  - every DuckDB-mined pair must appear in the engine set with the
    same cos_r (completeness of the kernel);
  - every engine pair whose endpoints share an in-slice bucket must
    be minable from that slice (soundness — no fabricated pairs).
With the default modulus 1 the slice is the WHOLE corpus and the two
sides must be set-equal.

Usage: python3 tools/stagedcheck_pairs.py <sfDir> <stagedOutDir> \
           [sliceMod [sliceRem]]
  sliceMod/sliceRem restrict to buckets with bucket % mod == rem —
  the deterministic fallback when the full Σc² replay is too heavy.
"""
import os
import sys

import duckdb

THRESHOLD = 0.45  # q140's registered threshold


def glob_of(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main(sf_dir, out_dir, slice_mod=1, slice_rem=0):
    con = duckdb.connect()
    con.execute("PRAGMA memory_limit='80GB'")
    con.execute(f"PRAGMA temp_directory='{out_dir}/duck_tmp'")
    emb = glob_of(sf_dir, "embeddings")
    base = f"""
asg AS MATERIALIZED (
  SELECT a.bucket, a.vec_id, e.v
  FROM read_parquet('{out_dir}/asg2.parquet/*.parquet') a
  JOIN (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM read_parquet('{emb}')) e USING (vec_id)
  WHERE a.bucket % {slice_mod} = {slice_rem}),
mined AS MATERIALIZED (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_cosine_similarity(a.v, b.v), 4) AS cos_r
  FROM asg a JOIN asg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {THRESHOLD}),
eng AS MATERIALIZED (
  SELECT vec_a, vec_b, cos_r
  FROM read_parquet('{out_dir}/q140.parquet/*.parquet')),
eng_slice AS MATERIALIZED (
  SELECT DISTINCT p.vec_a, p.vec_b, p.cos_r
  FROM eng p
  WHERE EXISTS (SELECT 1 FROM asg x JOIN asg y ON x.bucket = y.bucket
                WHERE x.vec_id = p.vec_a AND y.vec_id = p.vec_b))"""
    missing, fabricated, n_mined, n_slice = con.execute(f"""WITH {base}
SELECT
  (SELECT count(*) FROM mined m WHERE NOT EXISTS (
     SELECT 1 FROM eng e WHERE e.vec_a = m.vec_a AND e.vec_b = m.vec_b
       AND e.cos_r = m.cos_r)),
  (SELECT count(*) FROM eng_slice s WHERE NOT EXISTS (
     SELECT 1 FROM mined m WHERE m.vec_a = s.vec_a AND m.vec_b = s.vec_b
       AND m.cos_r = s.cos_r)),
  (SELECT count(*) FROM mined),
  (SELECT count(*) FROM eng_slice)""").fetchone()
    n_eng = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/q140.parquet/*.parquet')"
    ).fetchone()[0]
    ok = missing == 0 and fabricated == 0 and n_mined > 0
    scope = ("full corpus" if slice_mod == 1
             else f"bucket slice %{slice_mod}=={slice_rem}")
    print(f"{'PASS' if ok else 'FAIL'} q140_pairs_auto_routed [{scope}] "
          f"(mined {n_mined}, engine-in-slice {n_slice}, engine total {n_eng}; "
          f"missing-from-engine {missing}, unminable-engine-pairs {fabricated})")
    return 0 if ok else 1


if __name__ == "__main__":
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    rem = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    sys.exit(main(sys.argv[1], sys.argv[2], mod, rem))
