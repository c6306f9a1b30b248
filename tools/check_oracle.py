#!/usr/bin/env python3
"""Local replica of the round driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB with the
sfDir parquet tables registered by name, and compares against the parquet
the Spark side wrote to <outDir>/<query>/. Columns are sorted by name,
rows sorted, values compared exactly (with a tiny float tolerance knob to
diagnose near-misses — the real driver hashes, so aim for exact).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_of(rel):
    cols = rel.columns
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in rel.fetchall()]
    data.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], [types[i] for i in order], data


# Terminal types that historically drift at the round driver's typed-hash
# layer even when values are byte-equal (r1 postmortem): int128-backed
# aggregates, wide decimals, raw timestamps.
def risky(t):
    t = t.upper()
    if t == "HUGEINT" or t.startswith("TIMESTAMP"):
        return True
    # ALL terminal decimals are risky: the driver coerces the DuckDB side
    # to float64 ("123.4") while the Spark parquet side stays Decimal
    # ("123.40") — q_sort_limit passed r1 only because none of its 10
    # values had a trailing zero.
    return t.startswith("DECIMAL(")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got_types, got = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            want_cols, want_types, want = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        flagged = sorted({t for t in got_types + want_types if risky(t)})
        if got_types != want_types:
            drift = [(c, a, b) for c, a, b in
                     zip(got_cols, got_types, want_types) if a != b]
            print(f"WARN {name}: type drift {drift}")
        elif flagged:
            print(f"WARN {name}: hash-risky terminal types {flagged}")
        if got_cols != want_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={want_cols}")
            n_fail += 1
        elif got != want:
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows", end="")
            diffs = [(a, b) for a, b in zip(got, want) if a != b]
            print(f", first diffs: {diffs[:2]}" if diffs else
                  f", extra spark={got[len(want):][:1]} extra oracle={want[len(got):][:1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
