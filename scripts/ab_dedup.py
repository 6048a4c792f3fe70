"""Same-process A/B: capped (new one-pass guard) vs uncapped LSH
near-dup at sf0.1, plus repeated ann_lsh timings to settle the r2 +69%
reading. Alternating runs in ONE session — the only methodology that
isolates a change on this box (cross-session variance is ±20%+)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (SparkSession.builder.master("local[32]")
         .appName("ab-dedup")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from osmospark.functions.dedup import (  # noqa: E402
    lsh_candidate_pairs, ngram_jaccard,
)
from osmospark.functions.similarity import lsh_topk  # noqa: E402

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
    .repartition(64).cache()
docs.count()
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
    .repartition(64).cache()
emb.count()


def near_dup_count(cap):
    pairs = lsh_candidate_pairs(docs, max_bucket_size=cap)
    return (ngram_jaccard(docs, pairs)
            .filter(F.col("jaccard") >= 0.5).count())


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 3), n


# warm-up (codegen + python workers)
near_dup_count(2000)
lsh_topk(emb, list(range(16)), k=10).count()

out = {"capped": [], "uncapped": [], "ann_lsh": []}
for i in range(5):
    order = [("capped", 2000), ("uncapped", None)]
    if i % 2:                      # alternate which variant goes first
        order.reverse()
    ns = {}
    for name, cap in order:
        t, ns[name] = timed(lambda c=cap: near_dup_count(c))
        out[name].append(t)
    assert ns["capped"] == ns["uncapped"], ns
    t, _ = timed(lambda: lsh_topk(emb, list(range(16)), k=10).count())
    out["ann_lsh"].append(t)
out["min"] = {k: min(v) for k, v in out.items()}
print(json.dumps(out))
spark.stop()
