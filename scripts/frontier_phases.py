"""Per-round phase breakdown of the bench frontier crawl at sf0.1 —
where do crawl_frontier's seconds actually go (admission vs extract vs
commit)? The engine already records phase timings in visit_meta; this
just surfaces them under the exact bench configuration."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .appName("frontier-phases")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from osmospark.corpus import synth_corpus_df, synth_seed_urls  # noqa: E402
from osmospark.frontier import FrontierEngine  # noqa: E402

docs_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
n_urls, n_hosts = docs_n * 50, 64
pages = synth_corpus_df(spark, n_urls, n_hosts=n_hosts, intra_links=4,
                        cross_links=2, weight=60, partitions=128).cache()
pages.count()
seeds = synth_seed_urls(n_hosts, per_host=32)

# same warm-up as bench.py
warm = pages.sample(False, 0.02, seed=1)
FrontierEngine(spark, warm).extract_corpus({"w": "div"}).count()

eng = FrontierEngine(spark, pages, dedup=True, politeness=False,
                     broadcast_threshold=1_000_000)
t0 = time.perf_counter()
records, meta = eng.run_crawl(
    seeds, "li > a", extract_spec={"payload": "div", "links": ["a@href"]},
    max_depth=5, max_rounds=6)
n = records.count()
wall = round(time.perf_counter() - t0, 2)

totals: dict[str, float] = {}
for m in meta:
    for k, v in m["phases"].items():
        totals[k] = round(totals.get(k, 0.0) + v, 2)
print(json.dumps({"wall_s": wall, "records": n,
                  "rounds": [{k: m[k] for k in ("round", "admitted")}
                             | m["phases"] for m in meta],
                  "phase_totals": totals}))
spark.stop()
