#!/usr/bin/env python3
"""Staged oracle for the LSH+CC family above the full-replay ceiling
(round-10 verdict #2): DuckDB folds ONLY the connected-components
fixpoint + yield histogram over the ENGINE-exported pair set (written
by graft.StagedVerify), instead of re-mining pairs from the corpus —
the full replay spilled >58 GB at sf30. The pair construction itself is
full-oracle-verified at sf0.01/sf1 (gate) and sf10
(bench_history/r9_sf10_selfcheck.log); this check makes the CC fold and
the store-backed q134/q155 outputs independently verified at sf30+.

Usage: python3 tools/stagedcheck.py <sfDir> <stagedOutDir>
"""
import sys

import duckdb

from selfcheck import canon  # same row canonicalization as the gate


CC_SQL = """
WITH RECURSIVE
pairs AS MATERIALIZED (
  SELECT doc_a AS da, doc_b AS db FROM read_parquet('{out}/pairs.parquet/*.parquet')),
edges AS MATERIALIZED (SELECT da AS a, db AS b FROM pairs
          UNION ALL SELECT db, da FROM pairs),
reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
labeled AS (SELECT a AS doc_id, min(b) AS cluster_rep FROM reach GROUP BY a)
"""

Q134_SQL = CC_SQL + """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_rep AS BIGINT) AS cluster_rep
FROM labeled ORDER BY doc_id"""

Q155_SQL = CC_SQL + """,
dt AS (SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
       FROM read_parquet('{docs}')),
wl AS (SELECT dt.doc_id, dt.n_tok, coalesce(l.cluster_rep, dt.doc_id) AS rep
       FROM dt LEFT JOIN labeled l ON dt.doc_id = l.doc_id),
cl AS (SELECT rep, CAST(count(*) AS BIGINT) AS sz,
         CAST(sum(CASE WHEN doc_id <> rep THEN n_tok ELSE 0 END) AS BIGINT) AS rm_toks
       FROM wl GROUP BY rep),
tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tt FROM dt)
SELECT CASE WHEN sz = 1 THEN '1' WHEN sz <= 4 THEN '2-4' ELSE '5+' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(sum(sz - 1) AS BIGINT) AS n_removable_docs,
       CAST(sum(rm_toks) AS BIGINT) AS n_removable_toks,
       (1000 * CAST(sum(rm_toks) AS BIGINT)) // tt AS permille_removable_toks
FROM cl, tot GROUP BY 1, tt ORDER BY 1"""


# q129's verdicts are a single NON-RECURSIVE fold over the pair set
# (dedup-vs-ALL-priors is order-independent per doc; arrival is staged
# in doc_id order — MinHashDedupStream's Scaladoc), so the stream's
# cross-batch store state replays exactly at rungs the full MinHash
# re-mine can't reach.
Q129_SQL = """
WITH pairs AS MATERIALIZED (
  SELECT doc_a AS da, doc_b AS db FROM read_parquet('{out}/pairs.parquet/*.parquet')),
prior AS (SELECT db, count(*) AS nd FROM pairs GROUP BY db)
SELECT d.doc_id,
       CAST(coalesce(p.nd, 0) AS BIGINT) AS n_dup_prior,
       CAST(CASE WHEN p.nd IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM (SELECT doc_id FROM read_parquet('{docs}')) d
LEFT JOIN prior p ON d.doc_id = p.db
ORDER BY doc_id"""


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # driver fixtures are single files; ScaleUp rungs are directories
    import os
    docs = f"{sf_dir}/documents.parquet"
    if os.path.isdir(docs):
        docs = f"{docs}/*.parquet"
    failures = 0
    checks = [
        ("q134_incremental_cc_stream", "q134", Q134_SQL),
        ("q155_dedup_yield", "q155", Q155_SQL)]
    # q129 is checked when the export includes it (added round 12;
    # older staged dirs lack the file)
    if (os.path.isdir(f"{out_dir}/q129.parquet")
            or os.path.exists(f"{out_dir}/q129.parquet")):
        checks.append(("q129_minhash_dedup_stream", "q129", Q129_SQL))
    for name, fname, sql in checks:
        oracle = con.execute(sql.format(out=out_dir, docs=docs)).fetchdf()
        engine = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{fname}.parquet/*.parquet')"
        ).fetchdf()
        ocols, orows = canon(oracle)
        ecols, erows = canon(engine)
        ok = ocols == ecols and orows == erows
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"(engine {len(erows)} rows, oracle {len(orows)} rows)")
        if not ok and ocols != ecols:
            print(f"  cols: engine={ecols} oracle={ocols}")
        if not ok and orows and erows:
            diff = set(orows).symmetric_difference(set(erows))
            print(f"  first diffs: {sorted(diff)[:3]}")
    n_pairs = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/pairs.parquet/*.parquet')"
    ).fetchone()[0]
    print(f"{len(checks) - failures} passed, {failures} failed "
          f"(CC fold over {n_pairs} engine-exported pairs)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
