#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query parquet dumped by graft.Verify, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB (tables = views over the sfDir
parquet), then compares: column names (sorted), row count, and exact cell
values after sorting rows by all columns. Exact equality is the bar —
queries are designed for bit-identical results (see graft.ops.Num).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def fetch_sorted(rel, cols_order):
    cols = sorted(cols_order)
    rows = [tuple(norm(r[cols_order.index(c)]) for c in cols) for r in rel]
    rows.sort(key=key)
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ora = con.execute(sql)
            ora_cols = [d[0] for d in ora.description]
            ora_cols_s, ora_rows = fetch_sorted(ora.fetchall(), ora_cols)
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_cols_s, got_rows = fetch_sorted(got.fetchall(), got_cols)
        except Exception as e:
            failures.append((name, f"spark result error: {e}"))
            continue
        if ora_cols_s != got_cols_s:
            failures.append(
                (name, f"columns differ: oracle={ora_cols_s} got={got_cols_s}"))
            continue
        if len(ora_rows) != len(got_rows):
            failures.append(
                (name, f"row count: oracle={len(ora_rows)} got={len(got_rows)}"))
            continue
        bad = None
        for i, (a, b) in enumerate(zip(ora_rows, got_rows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append(
                (name, f"first diff at sorted row {bad[0]}:\n"
                       f"  cols  : {ora_cols_s}\n"
                       f"  oracle: {bad[1]}\n  spark : {bad[2]}"))
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")

    # queries with no oracle: rows-only check — driven off the manifest so a
    # query that THREW in Verify (no dump dir) is a failure, not an absence
    import os
    try:
        with open(f"{out_dir}/expected_queries.json") as f:
            expected = json.load(f)
    except FileNotFoundError:
        expected = sorted(n for n in os.listdir(out_dir)
                          if os.path.isdir(os.path.join(out_dir, n)))
    for name in expected:
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            failures.append((name, "expected query has no dumped parquet dir "
                                   "(threw during graft.Verify?)"))
        elif name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows")

    print()
    if failures:
        for name, msg in failures:
            print(f"FAIL {name}: {msg}")
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
