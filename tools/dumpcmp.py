#!/usr/bin/env python3
"""Hash-compare two Verify-style parquet dumps query by query — the
multi-process parity check (round-12 verdict #3): the same queries run
under `local[n]` and `local-cluster[n,c,m]` must produce identical row
sets (same canonicalization as the DuckDB gate).

Usage: python3 tools/dumpcmp.py <dumpA> <dumpB>
"""
import os
import sys

import duckdb

from selfcheck import canon


def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    failures = 0
    for name in names:
        if not os.path.isdir(os.path.join(b_dir, name)):
            print(f"FAIL {name}: missing from {b_dir}")
            failures += 1
            continue
        da = con.execute(
            f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')").fetchdf()
        db = con.execute(
            f"SELECT * FROM read_parquet('{b_dir}/{name}/*.parquet')").fetchdf()
        ca, ra = canon(da)
        cb, rb = canon(db)
        ok = ca == cb and ra == rb
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(ra)} vs {len(rb)} rows)")
        if not ok and ra and rb:
            diff = set(ra).symmetric_difference(set(rb))
            print(f"  first diffs: {sorted(diff)[:3]}")
    print(f"{len(names) - failures} passed, {failures} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
