#!/usr/bin/env python3
"""Staged oracle for the span-dedup and corpus-prep families above the
full-replay ceiling (round-12 verdict #4): DuckDB folds the
first-occurrence election, span coverage, and per-doc reconstruction
hash over the ENGINE-exported gram frame (written by
graft.StagedVerifySpans) instead of re-mining w-token grams from text —
the gram strings alone are ~25 GB of intermediate at sf100 plus two
polynomial hashes per gram. The gram extraction itself is
full-oracle-verified at sf0.01/sf1 (gate) and sf10
(bench_history/r9_sf10_selfcheck.log); this check makes the global
election, the removal/reconstruction, and the cross-batch gram-store
state of the q101 stream independently verified at sf30+.

The corpus-prep pair (q98/q104) has a row-wise oracle (no mining join),
so it is replayed IN FULL from the documents parquet at any rung — the
engine ships its registered SQL verbatim in q98_oracle.sql.

Usage: python3 tools/stagedcheck_spans.py <sfDir> <stagedOutDir>
"""
import os
import sys

import duckdb

from selfcheck import canon  # same row canonicalization as the gate


W = 8

# The spanDedupSql tail (TrainingOps.spanDedupSql) with the gram mine
# replaced by the engine's exported (doc_id, pos, pack) frame. pack is
# an opaque identity — the fold needs only its equality. The
# first-occurrence election is a groupBy-min over the composite key
# doc_id * 2^20 + pos (positions are token indexes, far under 2^20)
# rather than a 500M-row window sort.
SPAN_SQL = """
WITH g AS (
  SELECT doc_id, pos, pack, doc_id * 1048576 + pos AS k
  FROM read_parquet('{out}/grams.parquet/*.parquet')),
f AS (SELECT pack, min(k) AS fk FROM g GROUP BY pack),
dup AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (pack) WHERE g.k > f.fk),
d AS (SELECT doc_id, list_sort(list(pos)) AS starts FROM dup GROUP BY doc_id),
cov AS (SELECT doc_id, starts,
          list_sort(list_distinct(flatten(
            list_transform(starts, s -> range(s, s + {w}))))) AS covered
        FROM d),
tok0 AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM read_parquet('{docs}')),
keep AS (
  SELECT t.doc_id,
         CAST(len(t.toks) AS BIGINT) AS n_tok,
         CAST(coalesce(len(c.starts), 0) AS BIGINT) AS n_dup_spans,
         CAST(coalesce(len(c.covered), 0) AS BIGINT) AS n_removed,
         CASE WHEN c.doc_id IS NULL THEN t.toks
              ELSE list_filter(t.toks, (t2, i) -> NOT list_contains(c.covered, i - 1))
         END AS kept
  FROM tok0 t LEFT JOIN cov c ON t.doc_id = c.doc_id)
SELECT doc_id, n_tok, n_dup_spans, n_removed,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(range(1, len(array_to_string(kept, ' ')) + 1),
      j -> CAST(unicode(array_to_string(kept, ' ')[j]) AS BIGINT))),
    (acc, x) -> (acc * 31 + x) % 1000000007) AS kept_hash
FROM keep ORDER BY doc_id"""


def main(sf_dir, out_dir):
    con = duckdb.connect()
    docs = f"{sf_dir}/documents.parquet"
    if os.path.isdir(docs):
        docs = f"{docs}/*.parquet"
    # the full row-wise corpus-prep replay needs the `documents` view
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{docs}'")
    span_oracle = SPAN_SQL.format(out=out_dir, docs=docs, w=W)
    prep_oracle = open(f"{out_dir}/q98_oracle.sql").read()
    # the election key doc_id*2^20+pos assumes pos < 2^20 per document;
    # a pathological doc would silently corrupt first-occurrence ordering
    # and make the ORACLE wrong — fail loudly instead (ADVICE r13)
    max_pos = con.execute(
        f"SELECT coalesce(max(pos), 0) FROM "
        f"read_parquet('{out_dir}/grams.parquet/*.parquet')").fetchone()[0]
    assert max_pos < 1048576, (
        f"election key overflow: max gram pos {max_pos} >= 2^20 — "
        f"widen the doc_id*1048576+pos key before trusting this oracle")
    checks = [
        ("q100_span_dedup", "q100", span_oracle),
        ("q101_span_dedup_stream", "q101", span_oracle),
        ("q98_corpus_prep_pipeline", "q98", prep_oracle),
        ("q104_corpus_prep_stream", "q104", prep_oracle)]
    failures = 0
    cached = {}
    for name, fname, sql in checks:
        if sql not in cached:
            cached[sql] = con.execute(sql).fetchdf()
        oracle = cached[sql]
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
    n_grams = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/grams.parquet/*.parquet')"
    ).fetchone()[0]
    print(f"{len(checks) - failures} passed, {failures} failed "
          f"(span fold over {n_grams} engine-exported grams)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
