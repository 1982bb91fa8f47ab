"""Round-9 operator tests.

Covers the four ADVICE-r8 fixes first (decontam broadcast fence with
shuffle-join parity, semantic-decontam bench fence, JPEG malformed-
stream diagnostics), then the round-9 operator additions.
"""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# ADVICE r8 #1 — benchmark_decontam_13gram broadcast fence
# --------------------------------------------------------------------------
def test_decontam_shuffle_fallback_parity(spark, monkeypatch):
    """Above the gram fence the probe degrades to a shuffle join; the
    result must be bit-identical to the broadcast path."""
    from orca_ztbus_python_processor_spark.workloads import textops

    q = textops.CATALOG.queries["benchmark_decontam_13gram"]
    broadcast_rows = sorted(map(tuple, q(spark, SF_DIR).collect()))
    monkeypatch.setattr(textops, "DECONTAM_BROADCAST_GRAM_LIMIT", 0)
    shuffle_rows = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert broadcast_rows == shuffle_rows
    assert len(broadcast_rows) > 0


def test_semantic_decontam_bench_fence_raises(spark, monkeypatch):
    """The semantic sweep replicates the WHOLE bench matrix into every
    shard task, so an oversized bench slice must refuse loudly (the
    knn_label_accuracy_allpairs pattern), not OOM an executor."""
    from orca_ztbus_python_processor_spark.workloads import vectors

    monkeypatch.setattr(vectors, "SEM_DECONTAM_BENCH_LIMIT", 0)
    q = vectors.CATALOG.queries["semantic_decontam_embedding"]
    with pytest.raises(ValueError, match="per-task replica fence"):
        q(spark, SF_DIR)


# --------------------------------------------------------------------------
# ADVICE r8 #3 — JPEG malformed-stream diagnostics
# --------------------------------------------------------------------------
def test_jpeg_sos_before_sof_raises_valueerror():
    """A stream whose SOF segment was stripped must die on the
    decoder's contractual diagnostic, not a NameError on p_vmax."""
    from orca_ztbus_python_processor_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg_gray,
    )

    good = _encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8))
    i = good.index(b"\xff\xc0")
    seglen = int.from_bytes(good[i + 2 : i + 4], "big")
    maimed = good[:i] + good[i + 2 + seglen :]
    with pytest.raises(ValueError, match="SOS before SOF"):
        _decode_jpeg(maimed)


def test_jpeg_duplicate_scan_component_raises_valueerror():
    """An interleaved scan repeating one component id satisfies
    ns == len(comps) but must not decode silently into the wrong
    grids."""
    from orca_ztbus_python_processor_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg_color_420,
    )

    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    good = bytearray(_encode_jpeg_color_420(rgb))
    i = good.index(b"\xff\xda")
    ns = good[i + 4]
    assert ns == 3
    good[i + 7] = good[i + 5]  # second scan cid := first
    with pytest.raises(ValueError, match="distinct frame"):
        _decode_jpeg(bytes(good))


def test_jpeg_unknown_scan_component_raises_valueerror():
    """A scan referencing a component id absent from the frame must
    raise the same diagnostic (previously a StopIteration in the
    single-component branch)."""
    from orca_ztbus_python_processor_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg_gray,
    )

    good = bytearray(_encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = good.index(b"\xff\xda")
    good[i + 5] = 0x42  # scan cid not in frame
    with pytest.raises(ValueError, match="distinct frame"):
        _decode_jpeg(bytes(good))
