#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every SPARK_QUERIES
entry and its SQL_ORACLES DuckDB twin at a given sf dir, canonicalize both
(columns sorted by name, rows sorted by all columns), and compare row count,
schema (column names), and exact values. Rows-only queries are just executed.

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            first = df[c].dropna().head(1)
            if len(first) and isinstance(first.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c])
            else:
                # stringify so map/array cells fail here exactly like the driver
                df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    from link_profiler_repo_spark.queries import (
        ROWS_ONLY_QUERIES,
        SPARK_QUERIES,
        SQL_ORACLES,
    )
    from link_profiler_repo_spark.session import get_spark

    spark = get_spark(app="check-gate", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name, fn in SPARK_QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        sdf = canon(fn(spark, SF_DIR).toPandas())
        odf = canon(con.execute(SQL_ORACLES[name]).df())
        rows = len(sdf) == len(odf)
        schema = list(sdf.columns) == list(odf.columns)
        if rows and schema:
            try:
                # dtype-KIND-strict: the driver's value hash stringifies, so
                # int32 vs int64 and datetime[ns] vs [us] pass it, but
                # int64 vs float64 does NOT ("5" != "5.0" — the DuckDB
                # SUM(int)->HUGEINT->float64 artifact that sat red through
                # rounds 1-2). Mirror exactly that: values exact, and the
                # numpy dtype KIND (i/u/f/b/M/O) must match per column.
                fam = lambda d: {"u": "i"}.get(d.kind, d.kind)  # noqa: E731
                kind_mismatch = [
                    (c, sdf[c].dtype, odf[c].dtype)
                    for c in sdf.columns
                    if fam(sdf[c].dtype) != fam(odf[c].dtype)
                ]
                if kind_mismatch:
                    raise AssertionError(f"dtype-kind mismatch: {kind_mismatch}")
                pd.testing.assert_frame_equal(
                    sdf, odf, check_dtype=False, check_exact=True
                )
                vals = True
            except AssertionError as e:
                vals = False
                detail = str(e).splitlines()[:6]
        else:
            vals = False
            detail = [f"spark cols {list(sdf.columns)} vs oracle {list(odf.columns)}"]
        ok = rows and schema and vals
        print(
            f"{name:24s} rows={len(sdf)}/{len(odf)} schema={schema} values={vals}"
        )
        if not ok:
            failures.append(name)
            for line in detail:
                print("   ", line)

    for name, fn in ROWS_ONLY_QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        try:
            pdf = fn(spark, SF_DIR).toPandas()
            # the driver sorts with pandas — unhashable cells must not exist
            canon(pdf)
            print(f"{name:24s} rows-only ran, {len(pdf)} rows")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} ERROR {type(e).__name__}: {e}")

    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL GREEN")


if __name__ == "__main__":
    main()
