#!/usr/bin/env python
"""Pin ANN recall at bench scale (VERDICT r4 "Next round" #5).

The pytest recall gate runs on the small fixture; quantizer quality can
drift as the corpus grows (train_centroids samples a fixed 2048 ids),
so this script measures recall@k of ``ann_cosine_topk`` against the
exact ``cosine_topk_bruteforce`` at the bench scale factors and writes
.benchmarks/ann_recall.json. The committed artifact is the in-repo
recall number; tests/test_pipeline_ops.py carries the small-fixture
gate and scripts/ carries this scale gate (exit 1 below threshold).

recall@k = mean over queries of |approx top-k ∩ exact top-k| / k.

Usage: python scripts/measure_ann_recall.py [--threshold 0.9]
       [--sf-dirs /root/testdata/sf0.1 /tmp/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def topk_sets(rows) -> dict[int, set[int]]:
    by_q = defaultdict(set)
    for r in rows:
        by_q[r["query_id"]].add(r["neighbor_id"])
    return by_q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument(
        "--sf-dirs", nargs="+", default=["/root/testdata/sf0.1", "/tmp/sf1"]
    )
    args = ap.parse_args()

    from orca_ztbus_python_processor_spark.session import get_spark
    from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

    spark = get_spark("ann-recall")
    cat = merged_catalog()
    out: dict[str, dict] = {}
    worst = 1.0
    for sf_dir in args.sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: missing")
            continue
        exact = topk_sets(cat.queries["cosine_topk_bruteforce"](spark, sf_dir).collect())
        approx = topk_sets(cat.queries["ann_cosine_topk"](spark, sf_dir).collect())
        k = max(len(v) for v in exact.values())
        per_q = [len(approx.get(q, set()) & hits) / k for q, hits in exact.items()]
        recall = sum(per_q) / len(per_q)
        worst = min(worst, recall)
        out[sf_dir] = {
            "recall_at_k": round(recall, 4),
            "k": k,
            "n_queries": len(exact),
            "min_per_query": round(min(per_q), 4),
        }
        print(f"{sf_dir}: recall@{k} = {recall:.4f} over {len(exact)} queries")

    path = os.path.join(REPO_ROOT, ".benchmarks", "ann_recall.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"threshold": args.threshold, "results": out}, f, indent=1, sort_keys=True)
    if worst < args.threshold:
        print(f"FAIL: recall {worst:.4f} < threshold {args.threshold}")
        sys.exit(1)
    print(f"OK: all recalls >= {args.threshold}")


if __name__ == "__main__":
    main()
