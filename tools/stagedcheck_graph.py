#!/usr/bin/env python3
"""Staged oracle for the graph family above the full-replay ceiling
(round-11 verdict #1): DuckDB folds ONLY the unrolled integer
fixed-point PageRank rounds + top-20 election over the ENGINE-exported
trade-pair set (written by graft.StagedVerifyGraph), instead of
re-deriving pairs from 180M fact rows. The pair construction itself is
full-oracle-verified at sf0.01/sf0.1 (gate) and sf1 (full-gate
replay); this check makes the 8-round q130 fold, the 6-round weighted
personalized q132 fold, and both top-20 elections independently
verified at sf30+. Degrees / Σw are NOT taken from the engine — DuckDB
re-derives them from the exported pairs, so the denominators are
re-verified too.

Every quantity is a BIGINT and every division a floor division
(graft/ops/PageRank.scala:6-28), so the comparison is exact equality,
no tolerance.

Usage: python3 tools/stagedcheck_graph.py <sfDir> <stagedOutDir>
"""
import os
import sys

import duckdb

from selfcheck import canon  # same row canonicalization as the gate

MASS = 1000000000000  # graft.ops.PageRank.Mass
TELEPORT_NUM = 15 * MASS
ROUNDS = 8            # graft.queries.GraphOps.Rounds
PROUNDS = 6           # graft.queries.GraphOps.PRounds
SEED_SEGMENT = "BUILDING"


def q130_sql(out, supplier):
    iters = ",\n".join(f"""r{i} AS MATERIALIZED (
  SELECT n.node, ({TELEPORT_NUM} // (100 * nn.n)) + COALESCE(c.sc, 0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (SELECT e.dst AS node,
                    CAST(sum((85 * r.rank) // (100 * e.deg)) AS BIGINT) AS sc
             FROM ed e JOIN r{i - 1} r ON e.src = r.node
             GROUP BY e.dst) c ON n.node = c.node)""" for i in range(1, ROUNDS + 1))
    return f"""WITH pairs AS MATERIALIZED (
  SELECT c, sp FROM read_parquet('{out}/pairs.parquet/*.parquet')),
edges AS (SELECT c AS src, sp AS dst FROM pairs
          UNION ALL SELECT sp, c FROM pairs),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
ed AS MATERIALIZED (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, {MASS} // nn.n AS rank FROM nodes CROSS JOIN nn),
{iters}
SELECT s.s_suppkey, s.s_name, r.rank AS rank_units
FROM r{ROUNDS} r JOIN read_parquet('{supplier}') s
  ON (r.node - 1) // 2 = s.s_suppkey
WHERE r.node % 2 = 1
ORDER BY rank_units DESC, s_suppkey
LIMIT 20"""


def q132_sql(out, supplier, customer):
    iters = ",\n".join(f"""p{i} AS MATERIALIZED (
  SELECT n.node, n.seed * ({TELEPORT_NUM} // (100 * ns.n)) + COALESCE(c.sc, 0) AS rank
  FROM nodesS n CROSS JOIN ns
  LEFT JOIN (SELECT e.dst AS node,
                    CAST(sum((85 * r.rank * e.w) // (100 * e.tw)) AS BIGINT) AS sc
             FROM ed e JOIN p{i - 1} r ON e.src = r.node
             GROUP BY e.dst) c ON n.node = c.node)""" for i in range(1, PROUNDS + 1))
    return f"""WITH pw AS MATERIALIZED (
  SELECT c, sp, w FROM read_parquet('{out}/pw.parquet/*.parquet')),
edges AS (SELECT c AS src, sp AS dst, w FROM pw
          UNION ALL SELECT sp, c, w FROM pw),
wsum AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY src),
ed AS MATERIALIZED (
  SELECT e.src, e.dst, CAST(e.w AS BIGINT) AS w, s.tw
  FROM edges e JOIN wsum s ON e.src = s.src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
seeds AS (SELECT c_custkey * 2 AS node FROM read_parquet('{customer}')
          WHERE c_mktsegment = '{SEED_SEGMENT}'),
nodesS AS MATERIALIZED (
  SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS seed
  FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
ns AS (SELECT CAST(sum(seed) AS BIGINT) AS n FROM nodesS),
p0 AS MATERIALIZED (
  SELECT node, seed * ({MASS} // ns.n) AS rank FROM nodesS CROSS JOIN ns),
{iters}
SELECT s.s_suppkey, s.s_name, r.rank AS rank_units
FROM p{PROUNDS} r JOIN read_parquet('{supplier}') s
  ON (r.node - 1) // 2 = s.s_suppkey
WHERE r.node % 2 = 1
ORDER BY rank_units DESC, s_suppkey
LIMIT 20"""


def glob_of(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("PRAGMA memory_limit='80GB'")
    con.execute(f"PRAGMA temp_directory='{out_dir}/duck_tmp'")
    supplier = glob_of(sf_dir, "supplier")
    customer = glob_of(sf_dir, "customer")
    failures = 0
    for name, fname, sql in [
            ("q130_pagerank", "q130", q130_sql(out_dir, supplier)),
            ("q132_personalized_pagerank", "q132",
             q132_sql(out_dir, supplier, customer))]:
        oracle = con.execute(sql).fetchdf()
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
    print(f"{2 - failures} passed, {failures} failed "
          f"(integer fixed-point fold over {n_pairs} engine-exported pairs)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
