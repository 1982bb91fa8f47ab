from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from orca_ztbus_python_processor_spark.schemas import CORPUS_TABLES  # noqa: E402
from orca_ztbus_python_processor_spark.session import get_spark  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the corpus tables registered as views,
    mirroring the driver's oracle environment."""
    con = duckdb.connect()
    for name in CORPUS_TABLES:
        path = os.path.join(ORACLE_SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con
