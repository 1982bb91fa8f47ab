"""Round-10 operator tests.

Planted-violation fixtures for the intentionally-empty invariant
audits (VERDICT r9 #2): `customers_without_orders` and
`nations_without_suppliers` hash-match 0 rows by fixture construction
in every driver round, so a broken anti-join returning 0 rows for the
wrong reason would still pass. These tests inject the violation each
audit exists to detect into a fixture VARIANT (symlinked tables plus a
doctored parquet) and assert the query CATCHES it — non-empty output
naming exactly the planted row.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orca_ztbus_python_processor_spark.schemas import CORPUS_TABLES
from orca_ztbus_python_processor_spark.workloads.relational import CATALOG as RCAT

SF_DIR = "/root/testdata/sf0.001"

# Planted orphan: a customer with no orders (custkey far outside the
# fixture's o_custkey domain) in a nation with no suppliers (nationkey
# far outside the fixture's 0-24 nation domain). One doctored customer
# table plants BOTH violations.
ORPHAN_CUSTKEY = 99_999_999
ORPHAN_NATIONKEY = 999


@pytest.fixture(scope="module")
def violated_sf_dir(tmp_path_factory):
    """Fixture variant: every table symlinked from sf0.001 except
    customer, which gains one orphan row."""
    d = tmp_path_factory.mktemp("violated_sf")
    for name in CORPUS_TABLES:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        if name != "customer" and os.path.exists(src):
            os.symlink(src, d / f"{name}.parquet")
    t = pq.read_table(os.path.join(SF_DIR, "customer.parquet"))
    orphan = pa.table(
        {
            "c_custkey": pa.array([ORPHAN_CUSTKEY], type=t.schema.field("c_custkey").type),
            "c_name": pa.array(["Customer#orphan"], type=t.schema.field("c_name").type),
            "c_nationkey": pa.array([ORPHAN_NATIONKEY], type=t.schema.field("c_nationkey").type),
            "c_acctbal": pa.array([0.0], type=t.schema.field("c_acctbal").type),
            "c_mktsegment": pa.array(["BUILDING"], type=t.schema.field("c_mktsegment").type),
        }
    )
    pq.write_table(pa.concat_tables([t, orphan.select(t.column_names)]), d / "customer.parquet")
    return str(d)


def test_fixture_invariants_hold_on_clean_data(spark):
    """The planted rows are ABSENT from the pristine fixture's audit
    output (otherwise the planted tests below prove nothing). At the
    driver's sf0.01 both audits are fully empty
    (.benchmarks/degenerate_evidence.json); at this smoke scale the
    supplier table covers only a subset of nations, so the nations
    audit has legitimate baseline rows — the planted checks are
    delta-based for exactly that reason."""
    assert RCAT.queries["customers_without_orders"](spark, SF_DIR).count() == 0
    base = {
        r["nationkey"]
        for r in RCAT.queries["nations_without_suppliers"](spark, SF_DIR).collect()
    }
    assert ORPHAN_NATIONKEY not in base


def test_customers_without_orders_catches_planted_orphan(spark, violated_sf_dir):
    rows = RCAT.queries["customers_without_orders"](spark, violated_sf_dir).collect()
    assert [(r["c_custkey"], r["c_name"]) for r in rows] == [
        (ORPHAN_CUSTKEY, "Customer#orphan")
    ]


def test_nations_without_suppliers_catches_planted_nation(spark, violated_sf_dir):
    clean = {
        r["nationkey"]
        for r in RCAT.queries["nations_without_suppliers"](spark, SF_DIR).collect()
    }
    violated = {
        r["nationkey"]
        for r in RCAT.queries["nations_without_suppliers"](spark, violated_sf_dir).collect()
    }
    assert violated == clean | {ORPHAN_NATIONKEY}


def test_cross_source_span_width_matches_decontam_convention():
    """cross_source_dup_matrix documents its 13-token span width as the
    DECONTAM_N convention; pin them equal so one can't drift."""
    from orca_ztbus_python_processor_spark.workloads.textops import (
        CROSS_SOURCE_SPAN_K,
        DECONTAM_N,
    )

    assert CROSS_SOURCE_SPAN_K == DECONTAM_N


def test_degenerate_evidence_artifact_has_no_unexplained_flags():
    """Pin the committed audit artifact (VERDICT r9 #2): every oracle
    twin's sf0.01 output profile was swept; any degenerate output must
    be allowlisted with a planted-violation test, and the allowlist
    entries must exist in this file."""
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
        "degenerate_evidence.json",
    )
    with open(path) as f:
        art = json.load(f)
    assert art["unexplained"] == []
    assert set(art["flagged"]) <= set(art["allowlist"])
    for name in art["allowlist"]:
        assert name in art["profiles"]
