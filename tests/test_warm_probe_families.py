"""Collision-safety of the warm-probe family assignment (VERDICT r9 #6).

scripts/warm_probe.py assigns every catalog query an operator family
and slope band by regex. Round 9's assignment was first-match-wins:
``image_decontam_phash`` matched both the pair-volume-law and
decontam-sweep patterns and silently took whichever was listed first.
family_of() now raises on ambiguous names unless they carry an
explicit FAMILY_OVERRIDES entry; this test sweeps the WHOLE catalog so
a new ambiguous query name fails here instead of silently probing
against the wrong band.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from warm_probe import FAMILY_BANDS, FAMILY_OVERRIDES, family_of  # noqa: E402

from orca_ztbus_python_processor_spark.workloads.base import merged_catalog  # noqa: E402


def test_every_catalog_name_resolves_to_exactly_one_family():
    for name in merged_catalog().queries:
        fam, band = family_of(name)  # raises on unlisted ambiguity
        assert band > 0


def test_overrides_are_live_and_point_at_real_families():
    families = {fam for fam, _, _ in FAMILY_BANDS}
    catalog = set(merged_catalog().queries)
    for name, fam in FAMILY_OVERRIDES.items():
        assert fam in families, f"override {name} names unknown family {fam}"
        assert name in catalog, f"override {name} is not a catalog query"


def test_known_ambiguous_name_is_pinned_to_pair_volume_law():
    # The r9 collision case: cost is the pHash banding join, so the
    # pair-volume band (8.5) is the documented choice — not the
    # decontam-sweep band (4.0) the substring 'decontam' also matches.
    fam, band = family_of("image_decontam_phash")
    assert fam == "pair-volume-law"
    assert band == 8.5


def test_ambiguous_name_without_override_raises():
    # A hypothetical name matching two patterns (stream_ + minhash)
    # must fail loudly rather than silently picking a band.
    with pytest.raises(ValueError, match="multiple family patterns"):
        family_of("stream_minhash_bogus")
