"""Same-process interleaved A/B for the ann_ivf bench reading (VERDICT
r3 "What's wrong #2": 3.18 s in r2 → 4.22 s in r3 at identical
sf0.1/local[32], with no plan change in ivf_topk itself).

Cross-session wall-clock comparisons are worthless on this VM (the
identical crawl has measured 284/390/360 s across sessions), so the
adjudication method is the one that settled ann_lsh in r2: ONE process,
arms alternating back-to-back, compare medians. ann_lsh rides along as
the stable reference arm — if ann_ivf's median lands near its r2 number
while ann_lsh matches its r3 number, the r3 reading was session noise;
if ann_ivf stays high in-process, something real regressed.

Usage: python scripts/ab_ann_ivf.py [reps]    (default 7)
Prints one JSON line with per-arm runs + medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from bench import _spark
    from osmospark.functions import ivf_topk, lsh_topk

    spark = _spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .repartition(64).cache())
    emb.count()
    qids = list(range(16))
    # warm codegen + python workers on both arms
    ivf_topk(emb, qids, k=10).count()
    lsh_topk(emb, qids, k=10).count()

    runs: dict[str, list[float]] = {"ann_ivf": [], "ann_lsh": []}
    for _ in range(reps):
        for name, fn in (("ann_ivf", ivf_topk), ("ann_lsh", lsh_topk)):
            t0 = time.perf_counter()
            fn(emb, qids, k=10).count()
            runs[name].append(round(time.perf_counter() - t0, 3))
    out = {name: {"runs": v, "median": round(statistics.median(v), 3)}
           for name, v in runs.items()}
    out["reference"] = {"ann_ivf_r2": 3.18, "ann_ivf_r3": 4.22,
                        "ann_lsh_r3": 2.77}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
