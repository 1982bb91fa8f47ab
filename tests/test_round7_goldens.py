"""Seeded-fixture golden VALUES for the three rows-only catalog entries
that previously had only property/parity tests (VERDICT r6 "Next round"
#5): numeric drift in the PageRank iteration, the PCA power iteration,
or the winnowing fingerprint path must fail loudly here, the same
treatment `kmeans_embedding_profile` got in round 5
(test_clustering.py inertia golden).

All values were captured from the committed sf0.001 fixture under the
operators' deterministic contracts (fixed iteration budgets, seedless
deterministic inits, total-order tie-breaks) — they are exact
reproductions, not tolerance bands, except where float32 output
boundaries make pytest.approx(rel=1e-9) the honest statement.
"""

from __future__ import annotations

import numpy as np
import pytest

from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

from tests.conftest import SMOKE_SF_DIR

CAT = merged_catalog()


def test_pagerank_topk_golden(spark):
    rows = CAT.queries["copurchase_pagerank_topk"](spark, SMOKE_SF_DIR).collect()
    # top-20 identity AND order are pinned; rank mass double-checks the
    # numeric path (5 damped iterations, teleport floor).
    assert [r["l_partkey"] for r in rows] == [
        144, 80, 7, 44, 4, 23, 2, 179, 35, 109,
        121, 56, 104, 48, 140, 72, 163, 58, 127, 62,
    ]
    assert sum(r["rank"] for r in rows) == pytest.approx(
        0.1301656048744917, rel=1e-12
    )
    assert rows[0]["rank"] == pytest.approx(0.007756420411169529, rel=1e-12)


def test_pca_top_component_golden(spark):
    rows = sorted(
        CAT.queries["pca_top_component"](spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r["dim_idx"],
    )
    assert len(rows) == 64
    assert rows[0]["n_vectors"] == 500
    # eigenvalue and share are scalar invariants of the fixture
    assert rows[0]["eigenvalue"] == pytest.approx(0.025945287197828293, rel=1e-6)
    assert rows[0]["explained_var_share"] == pytest.approx(
        0.02598913386464119, rel=1e-6
    )
    lo = np.array([r["loading"] for r in rows], dtype=np.float64)
    # unit-norm eigenvector (float32 boundary), sign-canonicalized:
    # the first three loadings pin orientation and the numeric path
    assert float(np.sqrt((lo**2).sum())) == pytest.approx(1.0, abs=1e-6)
    assert lo[0] == pytest.approx(0.025267980992794037, rel=1e-6)
    assert lo[1] == pytest.approx(-0.04243673011660576, rel=1e-6)
    assert lo[2] == pytest.approx(0.10756798088550568, rel=1e-6)


def test_winnow_containment_pairs_golden(spark):
    # Golden re-captured in round 10: winnowing moved from byte-grain
    # rolling hashes to md5-derived token 3-grams (JVM-side,
    # oracle-paired — see operators/dedup.winnow_fingerprints). The
    # planted inclusion pairs are recovered identically; counts are at
    # the new fingerprint grain.
    rows = CAT.queries["winnow_containment_pairs"](spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 32
    assert sum(r["n_shared"] for r in rows) == 650
    pairs = sorted((r["id_a"], r["id_b"], r["n_shared"]) for r in rows)
    assert pairs[:6] == [
        (0, 50, 9), (0, 82, 9), (5, 450, 12),
        (8, 12, 29), (8, 120, 28), (8, 360, 29),
    ]
