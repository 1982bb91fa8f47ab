#!/usr/bin/env python
"""Driver-style DuckDB oracle differential for a subset (or all) of the
catalog: rows + schema + order-insensitive value equality, driver-style
session (own configs, hostile-TZ optional).

Usage: python scripts/verify_queries.py [sf_dir] [query ...]
       (no query args = every declared query)
Env:   VERIFY_TZ=America/New_York for the hostile-session probe.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    tz = os.environ.get("VERIFY_TZ", "UTC")
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    if not names:
        names = list(qs)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float32")
            elif pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        return df.sort_values(by=list(df.columns), na_position="first").reset_index(
            drop=True
        )

    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN CATALOG")
            n_fail += 1
            continue
        try:
            if name not in os_:
                n = qs[name](spark, sf_dir).count()
                print(f"{name}: rows-only ({n} rows)")
                continue
            s = norm(qs[name](spark, sf_dir).toPandas())
            d = norm(con.execute(os_[name]).df())
            ok = s.equals(d)
            if not ok:
                n_fail += 1
                print(f"{name}: MISMATCH spark={len(s)} oracle={len(d)}")
                if len(s) == len(d):
                    for c in s.columns:
                        if not s[c].equals(d[c]):
                            print(f"  col {c}:\n   spark {s[c].head(5).tolist()}\n   oracle {d[c].head(5).tolist()}")
            else:
                print(f"{name}: ok ({len(s)} rows)")
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
    print(f"\n{'FAIL' if n_fail else 'PASS'}: {n_fail} failures / {len(names)} queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
