#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [q1,q2,...]

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name, and compares values row by row.
The optional third arg restricts the compare to a comma-separated query
subset (matching Verify's own subset arg for targeted runs).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        missing = names - set(oracle)
        if missing:
            print(f"FAIL unknown query names: {sorted(missing)}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        erows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first at {i}:")
            print(f"  spark:  {a}")
            print(f"  duckdb: {b}")
            # dtype hints
            print(f"  dtypes spark={dict(got.dtypes.astype(str))}")
            print(f"  dtypes duck ={dict(exp.dtypes.astype(str))}")
            n_fail += 1
        else:
            dt_note = ""
            if dict(got.dtypes.astype(str)) != dict(exp.dtypes.astype(str)):
                dt_note = f"  [dtype diff: {dict(got.dtypes.astype(str))} vs {dict(exp.dtypes.astype(str))}]"
            print(f"PASS {name} ({len(grows)} rows){dt_note}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
