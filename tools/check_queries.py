#!/usr/bin/env python3
"""Spot-check named queries against their DuckDB oracles.

Usage: python3 tools/check_queries.py <sfDir> <verifyOutDir> <q1,q2,...>

Same column-sorted value compare as tools/compare.py, but only for the
named queries — for iterating on a new operator without a full Verify run.
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


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in names:
        try:
            got_cur = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_cur.description]
            got = got_cur.fetchall()
            exp_cur = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_cur.description]
            exp = exp_cur.fetchall()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        schema_ok = sorted(got_cols) == sorted(exp_cols)
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        e = [tuple(norm(r[i]) for i in ei) for r in exp]
        ok = schema_ok and g == e
        print(f"{name}: rows {len(got)}/{len(exp)} schema={schema_ok} hash={g == e}")
        if not ok:
            bad += 1
            for a, b in list(zip(g, e))[:1000]:
                if a != b:
                    print(f"  got {a}\n  exp {b}")
                    break
            if not schema_ok:
                print(f"  got cols {sorted(got_cols)}\n  exp cols {sorted(exp_cols)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3].split(","))
