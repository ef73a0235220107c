#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run DuckDB on each
oracle_sql.json query against the same parquet tables and compare with the
Spark result parquet written by graft.Verify.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # timestamps: strip tz, normalize to isoformat
    if hasattr(v, "isoformat"):
        try:
            v = v.tz_localize(None)
        except (AttributeError, TypeError):
            pass
        if hasattr(v, "to_pydatetime"):
            v = v.to_pydatetime()
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(x) for x in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; ScaleUp-derived rungs are
        # Spark-written directories of part files
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        dc, dr = canon(duck)
        sc, sr = canon(spark)
        if dc != sc:
            print(f"FAIL {name}: columns duck={dc} spark={sc}")
            n_fail += 1
        elif dr != sr:
            n_fail += 1
            print(f"FAIL {name}: rows duck={len(dr)} spark={len(sr)}")
            for i, (a, b) in enumerate(zip(dr, sr)):
                if a != b:
                    print(f"  first diff at row {i} (cols {dc}):")
                    print(f"    duck : {a}")
                    print(f"    spark: {b}")
                    break
            else:
                if len(dr) != len(sr):
                    longer = dr if len(dr) > len(sr) else sr
                    who = "duck" if len(dr) > len(sr) else "spark"
                    print(f"  extra rows in {who}: {longer[min(len(dr), len(sr)):][:3]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sr)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracle queries total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
