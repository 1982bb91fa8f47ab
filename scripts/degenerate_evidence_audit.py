#!/usr/bin/env python
"""Degenerate-evidence audit over every oracle twin (VERDICT r9 #2).

Round 9 surfaced the q4 class of vacuous green: a twin whose Spark and
DuckDB sides agree on a DEGENERATE output (q4's 2024 date window sat
outside the fixture's 1995-2001 span, so eight rounds of hash-matched
driver rows verified an empty result and nothing about the operator).
This script sweeps the whole catalog for that class at the driver's
oracle scale (sf0.01):

For each oracle-paired query, run the DuckDB oracle (the hash-match
gate means the agreed output IS the oracle output, so the profile
needs no Spark session) and record the output's evidence profile —
row count, per-column distinct counts and null fractions — then flag:

- ``empty``            : 0 rows (the q4 shape);
- ``all_null_column``  : >0 rows but some column is entirely NULL;
- ``single_null_or_zero_row``: exactly 1 row whose every value is
  NULL or exactly 0 (a COUNT(*)=0 style vacuous aggregate);
- ``constant_output``  : >1 rows but every column holds a single
  distinct value (the query's grouping/join logic is unexercised).

Flags minus the documented INTENTIONALLY_DEGENERATE allowlist must be
empty; each allowlist entry names the planted-violation test that
proves the query CATCHES the condition it audits for
(tests/test_round10_ops.py), so "empty by fixture construction" is
never the only evidence again.

Writes ``.benchmarks/degenerate_evidence.json``; exits non-zero on any
unexplained flag. tests/test_degenerate_evidence.py pins the committed
artifact.

Usage: python scripts/degenerate_evidence_audit.py
       [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb
import pandas as pd

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from orca_ztbus_python_processor_spark.schemas import CORPUS_TABLES  # noqa: E402
from orca_ztbus_python_processor_spark.workloads.base import merged_catalog  # noqa: E402

# Queries whose degenerate output at the fixture is the POINT — each
# is an invariant audit asserting "this violation does not occur", and
# each carries a planted-violation twin that injects the violation
# into a fixture variant and asserts a non-empty catch (the treatment
# referential_integrity_audit shapes deserve, VERDICT r9 #2).
INTENTIONALLY_DEGENERATE = {
    "customers_without_orders": (
        "empty",
        "anti-join invariant audit: every fixture customer has orders; "
        "planted orphan caught in tests/test_round10_ops.py::"
        "test_customers_without_orders_catches_planted_orphan",
    ),
    "nations_without_suppliers": (
        "empty",
        "EXCEPT invariant audit: every customer nation has suppliers; "
        "planted supplier-less nation caught in tests/test_round10_ops.py::"
        "test_nations_without_suppliers_catches_planted_nation",
    ),
}


def profile(df: pd.DataFrame) -> dict:
    n = len(df)
    cols = {}
    for c in df.columns:
        s = df[c]
        nn = int(s.notna().sum())
        cols[str(c)] = {
            "distinct": int(s.nunique(dropna=True)),
            "nonnull": nn,
        }
    flags = []
    if n == 0:
        flags.append("empty")
    else:
        for c, p in cols.items():
            if p["nonnull"] == 0:
                flags.append(f"all_null_column:{c}")
        if n == 1:
            row = df.iloc[0]
            if all(pd.isna(v) or v == 0 for v in row):
                flags.append("single_null_or_zero_row")
        elif all(p["distinct"] <= 1 for p in cols.values()):
            flags.append("constant_output")
    return {"rows": n, "columns": cols, "flags": flags}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    con = duckdb.connect()
    for name in CORPUS_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{os.path.join(args.sf_dir, name + '.parquet')}'"
        )

    catalog = merged_catalog()
    out, unexplained = {}, []
    for name, sql in sorted(catalog.oracles.items()):
        prof = profile(con.execute(sql).df())
        if prof["flags"]:
            allow = INTENTIONALLY_DEGENERATE.get(name)
            if allow and allow[0] in prof["flags"]:
                prof["allowlisted"] = allow[1]
            else:
                unexplained.append(name)
        out[name] = prof

    artifact = {
        "sf_dir": args.sf_dir,
        "oracle_twins": len(out),
        "flagged": sorted(n for n, p in out.items() if p["flags"]),
        "unexplained": sorted(unexplained),
        "allowlist": {k: v[1] for k, v in INTENTIONALLY_DEGENERATE.items()},
        "profiles": out,
    }
    path = os.path.join(REPO_ROOT, ".benchmarks", "degenerate_evidence.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    n_flag = len(artifact["flagged"])
    print(
        f"wrote {path}: {len(out)} twins profiled, {n_flag} flagged, "
        f"{len(unexplained)} unexplained"
    )
    for name in unexplained:
        print(f"  UNEXPLAINED {name}: {out[name]['flags']} "
              f"rows={out[name]['rows']}")
    sys.exit(1 if unexplained else 0)


if __name__ == "__main__":
    main()
