"""Self-check harness replicating the driver's t2 gate: run every
__spark_entry__ query on Spark AND its oracle SQL on DuckDB, compare
row count, column names/types, and order-insensitive values.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """pandas DataFrame -> sorted tuple rows with normalized values."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(v))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from sparker_spark.session import get_spark

    spark = get_spark(app_name="check_entry", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error {str(ex)[:200]}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows={len(sdf)} ({t_spark:.1f}s) [no oracle: rows-only]")
            if len(sdf) == 0:
                failures.append((name, "no-oracle query returned 0 rows"))
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            continue
        issues = []
        if len(sdf) != len(odf):
            issues.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            issues.append(f"schema spark={scols} duck={ocols}")
        elif srows != orows:
            ndiff = sum(1 for a, b in zip(srows, orows) if a != b) + abs(
                len(srows) - len(orows)
            )
            example = next(
                ((a, b) for a, b in zip(srows, orows) if a != b), None
            )
            issues.append(f"values differ in ~{ndiff} rows; first: {example}")
        if issues:
            failures.append((name, "; ".join(issues)))
            print(f"FAIL  {name}: {'; '.join(issues)[:300]}")
        else:
            print(f"PASS  {name}: rows={len(sdf)} ({t_spark:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:300]}")
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
