#!/usr/bin/env python
"""Three-point pair-volume law for the PERCEPTUAL hash families
(VERDICT r9 #7): SCALE.md asserted the pHash banding "rides the same
law" as text LSH by analogy; this measures it. Per scale point
(sf0.1 / sf1 / sf26) and per modality (image pHash, audio
fingerprint):

  - n_media          corpus size (images/clips synthesized per doc row)
  - banding_pairs    distinct pairs sharing >= 1 16-bit chunk (the
                     candidate volume the shuffle actually carries)
  - verified_pairs   exact bit_count(xor) <= 3 survivors
  - sec_signatures   decode + hash wall (map-only Arrow stage)
  - sec_pairs        banding + verify wall

If banding_pairs grows ~linearly in media count (the planted groups
are constant-size, so true pairs are exactly linear; chance 16-bit
chunk collisions add the super-linear tail the text law also has),
the image/audio slopes in the bench are pair-volume law, not a plan
defect. Results -> .benchmarks/image_pair_counts_3pt.json (committed;
cited in docs/SCALE.md).

Usage: python scripts/measure_image_pair_counts.py \
          [--sf-dirs /root/testdata/sf0.1 /tmp/sf1 /tmp/sf26]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from _bench_session import bench_spark, setup_bench_env  # noqa: E402


def measure(spark, sf_dir: str) -> dict:
    from orca_ztbus_python_processor_spark.operators.audiofp import (  # noqa: PLC0415
        audiofp_near_dups,
        audiofp_signatures,
        synthesize_audio_media,
    )
    from orca_ztbus_python_processor_spark.operators.imagehash import (  # noqa: PLC0415
        phash_near_dups,
        phash_signatures,
        synthesize_phash_media,
    )
    from orca_ztbus_python_processor_spark.sources.parquet import read_table  # noqa: PLC0415

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    out: dict = {}
    for modality, synth, sig_fn, pair_fn in (
        ("image", synthesize_phash_media, phash_signatures, phash_near_dups),
        ("audio", synthesize_audio_media, audiofp_signatures, audiofp_near_dups),
    ):
        t0 = time.perf_counter()
        sigs = sig_fn(synth(docs)).persist()
        n = sigs.count()
        sec_sig = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        # banding candidates = the hamming<=64 relaxation (every pair
        # sharing a chunk survives the verify predicate)
        cands = pair_fn(sigs, max_hamming=64).count()
        verified = pair_fn(sigs, max_hamming=3).count()
        sec_pairs = round(time.perf_counter() - t0, 3)
        sigs.unpersist()
        out[modality] = {
            "n_media": n,
            "banding_pairs": cands,
            "verified_pairs": verified,
            "sec_signatures": sec_sig,
            "sec_pairs": sec_pairs,
        }
        print(json.dumps({sf_dir: {modality: out[modality]}}), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs",
        nargs="+",
        default=["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf26"],
    )
    ap.add_argument("--out", default=".benchmarks/image_pair_counts_3pt.json")
    args = ap.parse_args()

    setup_bench_env()
    spark = bench_spark("image_pair_counts")
    results = {d: measure(spark, d) for d in args.sf_dirs}

    path = os.path.join(REPO_ROOT, args.out)
    with open(path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
