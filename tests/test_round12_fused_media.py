"""Round-12 fused media-signature parity: the single-Arrow-stage
synth+fingerprint paths must be row-identical to the composable
two-stage forms they replaced (the payload bytes they no longer ship
through the JVM are byte-identical by construction — same per-row
payload builders — so the signatures must match exactly)."""

from __future__ import annotations

import pytest

from orca_ztbus_python_processor_spark.operators.audiofp import (
    audiofp_signatures,
    audiofp_signatures_from_docs,
    synthesize_audio_media,
)
from orca_ztbus_python_processor_spark.operators.imagehash import (
    phash_signatures,
    phash_signatures_from_docs,
    synthesize_phash_media,
)
from orca_ztbus_python_processor_spark.workloads.pipelineops import _docs

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return _docs(spark, SF_DIR)


def _as_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_phash_fused_matches_two_stage(docs):
    fused = _as_map(phash_signatures_from_docs(docs), "media_id", "phash")
    staged = _as_map(
        phash_signatures(synthesize_phash_media(docs)), "media_id", "phash"
    )
    assert fused == staged
    assert len(fused) == docs.count()


def test_audiofp_fused_matches_two_stage(docs):
    fused = _as_map(audiofp_signatures_from_docs(docs), "media_id", "afp")
    staged = _as_map(
        audiofp_signatures(synthesize_audio_media(docs)), "media_id", "afp"
    )
    assert fused == staged
    assert len(fused) == docs.count()
