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

Execution shape: rounds fold SEQUENTIALLY through tables in an
ON-DISK DuckDB database, dropping each retired round — the one-shot
materialized-CTE chain held the edge set plus every round's join
state live at once and spilled past the box's free disk at 352M
edges; this form keeps peak state at (edge table + two node-sized
rank tables).

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


def glob_of(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def fold_q130(con, out, supplier):
    con.execute(f"""CREATE OR REPLACE TABLE ed AS
WITH pairs AS (SELECT c, sp FROM read_parquet('{out}/pairs.parquet/*.parquet')),
edges AS (SELECT c AS src, sp AS dst FROM pairs
          UNION ALL SELECT sp, c FROM pairs),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src""")
    # symmetrized edges: every node appears as a src, so the node spine
    # and per-node deg both come off the deg-annotated edge table
    con.execute("""CREATE OR REPLACE TABLE nodes AS
SELECT DISTINCT src AS node FROM ed""")
    n = con.execute("SELECT count(*) FROM nodes").fetchone()[0]
    con.execute(f"""CREATE OR REPLACE TABLE r0 AS
SELECT node, CAST({MASS // n} AS BIGINT) AS rank FROM nodes""")
    for i in range(1, ROUNDS + 1):
        con.execute(f"""CREATE TABLE r{i} AS
SELECT n.node, CAST({TELEPORT_NUM // (100 * n)} AS BIGINT) + COALESCE(c.sc, 0) AS rank
FROM nodes n
LEFT JOIN (SELECT e.dst AS node,
                  CAST(sum((85 * r.rank) // (100 * e.deg)) AS BIGINT) AS sc
           FROM ed e JOIN r{i - 1} r ON e.src = r.node
           GROUP BY e.dst) c ON n.node = c.node""")
        con.execute(f"DROP TABLE r{i - 1}")
    df = con.execute(f"""
SELECT s.s_suppkey, s.s_name, r.rank AS rank_units
FROM r{ROUNDS} r JOIN read_parquet('{supplier}') s
  ON (r.node - 1) // 2 = s.s_suppkey
WHERE r.node % 2 = 1
ORDER BY rank_units DESC, s_suppkey
LIMIT 20""").fetchdf()
    con.execute(f"DROP TABLE r{ROUNDS}")
    con.execute("DROP TABLE ed")
    con.execute("DROP TABLE nodes")
    return df


def fold_q132(con, out, supplier, customer):
    con.execute(f"""CREATE OR REPLACE TABLE ed AS
WITH pw AS (SELECT c, sp, w FROM read_parquet('{out}/pw.parquet/*.parquet')),
edges AS (SELECT c AS src, sp AS dst, w FROM pw
          UNION ALL SELECT sp, c, w FROM pw),
wsum AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY src)
SELECT e.src, e.dst, CAST(e.w AS BIGINT) AS w, s.tw
FROM edges e JOIN wsum s ON e.src = s.src""")
    con.execute(f"""CREATE OR REPLACE TABLE nodesS AS
WITH nodes AS (SELECT DISTINCT src AS node FROM ed),
seeds AS (SELECT c_custkey * 2 AS node FROM read_parquet('{customer}')
          WHERE c_mktsegment = '{SEED_SEGMENT}')
SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS seed
FROM nodes n LEFT JOIN seeds s ON n.node = s.node""")
    ns = con.execute("SELECT CAST(sum(seed) AS BIGINT) FROM nodesS").fetchone()[0]
    con.execute(f"""CREATE OR REPLACE TABLE p0 AS
SELECT node, CAST(seed AS BIGINT) * CAST({MASS // ns} AS BIGINT) AS rank FROM nodesS""")
    for i in range(1, PROUNDS + 1):
        con.execute(f"""CREATE TABLE p{i} AS
SELECT n.node, CAST(n.seed AS BIGINT) * CAST({TELEPORT_NUM // (100 * ns)} AS BIGINT) + COALESCE(c.sc, 0) AS rank
FROM nodesS n
LEFT JOIN (SELECT e.dst AS node,
                  CAST(sum((85 * r.rank * e.w) // (100 * e.tw)) AS BIGINT) AS sc
           FROM ed e JOIN p{i - 1} r ON e.src = r.node
           GROUP BY e.dst) c ON n.node = c.node""")
        con.execute(f"DROP TABLE p{i - 1}")
    df = con.execute(f"""
SELECT s.s_suppkey, s.s_name, r.rank AS rank_units
FROM p{PROUNDS} r JOIN read_parquet('{supplier}') s
  ON (r.node - 1) // 2 = s.s_suppkey
WHERE r.node % 2 = 1
ORDER BY rank_units DESC, s_suppkey
LIMIT 20""").fetchdf()
    con.execute(f"DROP TABLE p{PROUNDS}")
    con.execute("DROP TABLE ed")
    con.execute("DROP TABLE nodesS")
    return df


def main(sf_dir, out_dir):
    db = f"{out_dir}/stage.duckdb"
    if os.path.exists(db):
        os.remove(db)
    con = duckdb.connect(db)
    con.execute("PRAGMA memory_limit='48GB'")
    con.execute(f"PRAGMA temp_directory='{out_dir}/duck_tmp'")
    supplier = glob_of(sf_dir, "supplier")
    customer = glob_of(sf_dir, "customer")
    failures = 0
    for name, fname, fold in [
            ("q130_pagerank", "q130",
             lambda: fold_q130(con, out_dir, supplier)),
            ("q132_personalized_pagerank", "q132",
             lambda: fold_q132(con, out_dir, supplier, customer))]:
        oracle = fold()
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
