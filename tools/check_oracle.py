#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [verify_out_dir] [sf_dir]

Reads each <name>.parquet produced by graft.Verify plus oracle_sql.json,
runs each oracle SQL in DuckDB with views named after the test tables,
then compares: schema (column names), row count, and exact values after
sorting columns by name and rows by all columns (the driver's hash is
order-insensitive but value-exact).
"""
import json
import math
import sys

import duckdb
import pandas as pd

VERIFY_OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # list/array columns -> tuples so equality is unambiguous
    if hasattr(v, "tolist"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    with open(f"{VERIFY_OUT}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{VERIFY_OUT}/{name}/*.parquet'").fetchdf()
            want = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        # Representation audit mirroring the DRIVER's hash, which reads the
        # Spark parquet via pandas (NOT duckdb): an int64-vs-float64 pair
        # (e.g. a DuckDB HUGEINT sum) or a decimal128 Spark column (pandas
        # Decimal objects) hashes differently even when values are equal.
        # Tolerated (observed green): int-width and date-vs-datetime pairs.
        raw = pd.read_parquet(f"{VERIFY_OUT}/{name}")
        rep_bad = []
        for c in set(raw.columns) & set(want.columns):
            a, b = str(raw[c].dtype), str(want[c].dtype)
            ints = ("int8", "int16", "int32", "int64", "uint8", "uint16",
                    "uint32", "uint64")
            if (a in ints) != (b in ints) and "float" in a + b:
                rep_bad.append(f"{c}: spark={a} oracle={b}")
            if a == "object" and b != "object":
                import decimal
                # first NON-NULL value: a decimal column led by nulls
                # must not slip past the audit
                if any(isinstance(v, decimal.Decimal)
                       for v in raw[c].dropna().head(5)):
                    rep_bad.append(f"{c}: spark=decimal oracle={b}")
        if rep_bad:
            print(f"FAIL {name}: driver-hash representation mismatch: "
                  f"{'; '.join(rep_bad)}")
            failures += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        g = [tuple(norm(v) for v in row)
             for row in got[gcols].itertuples(index=False, name=None)]
        w = [tuple(norm(v) for v in row)
             for row in want[wcols].itertuples(index=False, name=None)]
        g.sort(key=repr)
        w.sort(key=repr)
        if g == w:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n"
                  f"  got  {bad[1]}\n  want {bad[2]}")
            failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} oracle queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
