#!/usr/bin/env python
"""Three-point scale law for the round-10 BATCH additions (VERDICT r10
"Next round" #4).

The streaming, text-pair, and image-pair families have three-point
scale laws (.benchmarks/stream_3pt.json, jaccard_pair_counts_3pt.json,
image_pair_counts_3pt.json); the round-10 batch additions — the stats
battery, HITS/LPA, CM/KMV sketches, and the decontam quadriptych — had
only the sf0.1->sf1 leg. This generalizes measure_stream_3pt.py: every
selected query runs WARM (one untimed warming run, then min-of-N) at
sf0.1, sf1 (10x) and /tmp/sf26 (26x) in one bench-configured session;
the artifact records both leg slopes, the fitted log-log exponent, and
a per-query within-band verdict against its warm_probe.py family band
(band checked on the 10x first leg; the 2.6x second leg is compared to
its own family-law expectation: pair-volume family second legs follow
the measured pair counts, everything else must be ~linear or better).

Usage: python scripts/measure_batch_3pt.py [--reps 2]
       [--queries bipartite_hits_parts,...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the ~16 most expensive round-10 additions by committed sf0.1 wall
DEFAULT_QUERIES = [
    "copurchase_label_propagation",   # 3.34 s — iterative graph
    "bipartite_hits_parts",           # 3.20 s — integer matvec family
    "heaps_vocab_growth",             # 3.21 s — distributed-rank family
    "source_char_trigram_jsd",        # 2.96 s — vocab-grain stats
    "text_dedup_retention",           # 2.76 s — pair-volume family e2e
    "edit_distance_neardup_pairs",    # 2.36 s — blocked pair family
    "containment_dedup_retention",    # 2.22 s — winnow pair family
    "bpe_learn_merges",               # 2.20 s — iterative vocab rollup
    "minhash_jaccard_calibration",    # 2.12 s — pair-volume family
    "audio_fp_dedup",                 # 1.96 s — audio banding pairs
    "audio_decontam_fp",              # 1.70 s — audio banding pairs
    "winsorized_price_means",         # 1.56 s — holistic rank family
    "bootstrap_ci_price_by_priority", # 1.38 s — stats battery
    "source_cross_perplexity",        # 1.35 s — LM score matrix
    "kruskal_wallis_qty_by_priority", # 1.08 s — stats battery (ranks)
    "kmv_overlap_calibration",        # 0.91 s — sketch family
    "cm_sketch_heavy_hitters",        # 0.84 s — sketch family
]
POINTS = [
    ("sf0.1", "/root/testdata/sf0.1", 1.0),
    ("sf1", "/tmp/sf1", 10.0),
    ("sf26", "/tmp/sf26", 26.0),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--out", default="batch_3pt_r10.json",
                    help="artifact filename under .benchmarks/")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    for _, d, _ in POINTS:
        if not os.path.isdir(d):
            sys.exit(
                f"missing fixture {d} — build with "
                "scripts/make_scale_fixture.py (factor 10 / 26)"
            )

    from _bench_session import bench_spark, min_of_warm, setup_bench_env  # noqa: E402,PLC0415
    from warm_probe import family_of  # noqa: E402,PLC0415

    setup_bench_env()
    from orca_ztbus_python_processor_spark.workloads.base import (  # noqa: E402,PLC0415
        merged_catalog,
    )

    spark = bench_spark("batch_3pt")
    catalog = merged_catalog()

    results: dict[str, dict] = {}
    for name in names:
        fn = catalog.queries[name]
        fam, band = family_of(name)
        walls = {}
        for label, sf_dir, _scale in POINTS:
            walls[label] = min_of_warm(spark, fn, sf_dir, args.reps)
        s01, s1, s26 = walls["sf0.1"], walls["sf1"], walls["sf26"]
        xs = [math.log(s) for _, _, s in POINTS]
        ys = [math.log(max(w, 1e-6)) for w in (s01, s1, s26)]
        mx, my = sum(xs) / 3, sum(ys) / 3
        beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        leg2 = s26 / max(s1, 1e-9)
        # pair-volume family second legs follow the measured pair-count
        # law (pairs grew ~4.5x on the 2.6x leg in
        # jaccard_pair_counts_3pt.json — wall must stay under that);
        # everything else must be ~linear or better with min-of-2 slack
        leg2_ceiling = 4.5 if fam == "pair-volume-law" else 3.0
        results[name] = {
            "family": fam,
            "first_leg_band": band,
            "wall_sec": walls,
            "slope_sf0.1_to_sf1": round(s1 / max(s01, 1e-9), 2),
            "slope_sf1_to_sf26": round(leg2, 2),
            "loglog_exponent": round(beta, 3),
            "within_band": (s1 / max(s01, 1e-9) <= band)
            and (leg2 <= leg2_ceiling),
        }
        print(json.dumps({"q": name, **results[name]}), flush=True)

    out = {
        "method": (
            f"min-of-{args.reps} after one untimed warming run per point, "
            "single session, tmpfs local dirs; scales 1x/10x/26x of sf0.1; "
            "first leg checked against the warm_probe.py family band, "
            "second (2.6x) leg against 3.0 (amortizing) or 4.5 "
            "(pair-volume, per the measured pair-count law)"
        ),
        "points": {lbl: d for lbl, d, _ in POINTS},
        "queries": results,
    }
    path = os.path.join(REPO_ROOT, ".benchmarks", args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_ok = sum(1 for r in results.values() if r["within_band"])
    print(
        f"wrote .benchmarks/{args.out} — {n_ok}/{len(results)} "
        "within band"
    )


if __name__ == "__main__":
    main()
