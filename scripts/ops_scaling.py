"""N->4N (local[2] -> local[8]) scaling pairs for the r4 data operators.

Each arm runs in its OWN process (getOrCreate caches the master); this
driver interleaves arms (2,8 / 2,8 / ...) and reports per-rep pairs and
medians. Usage: python scripts/ops_scaling.py [reps]
"""
import json
import statistics
import subprocess
import sys

WORKER = r'''
import json, sys, time
from pyspark.sql import SparkSession, functions as F

cores = sys.argv[1]
spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .repartition(64).cache())
docs.count()
# probe sizing: each op must carry >> 100 core-seconds of real work or
# per-job fixed costs dominate both arms (see BENCH/BASELINE.md, the
# politeness-probe lesson). AMPLIFY=100 -> 500k docs / ~25M tokens;
# dust over 2.5M urls x 3 aliases; BFS over 1M nodes / 4M edges.
import os
AMP = int(os.environ.get("OSMO_SCALE_AMP", "100"))
n_pages = 250_000 * max(1, AMP // 25)
seed_n = 1_000_000 * max(1, AMP // 100)
rep20 = (docs.select(F.explode(F.sequence(F.lit(0), F.lit(AMP - 1)))
         .alias("r"), "doc_id", "text")
         .select((F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
                 "text"))

def t_para():
    from osmospark.functions.curation import paragraph_dedup
    d = rep20.select("doc_id", F.regexp_replace(
        "text", r"((?:\S+ ){7}\S+) ", "$1\n").alias("text"))
    return paragraph_dedup(d).count()

def t_inv():
    from osmospark.functions.textstats import inverted_index
    return inverted_index(rep20, min_df=2).count()

def t_dust():
    from osmospark.urlnorm import dust_rules
    i = F.col("id")
    host = F.pmod(i, F.lit(500))
    page = F.pmod(F.floor(i / 500), F.lit(7))
    log = (spark.range(n_pages)
           .select(F.explode(F.sequence(F.lit(0), F.lit(2))).alias("s"), "id")
           .select(F.format_string("http://h%03d.test/a?page=%d&sid=s%d",
                                   host, page, F.col("s")).alias("url"),
                   (host * 7 + page).cast("bigint").alias("fp")))
    return dust_rules(log, min_support=2).count()

def t_seed():
    from osmospark.functions.linkgraph import seed_distance
    i = F.col("id")
    ids = spark.range(seed_n)
    edges = ids.select(i.alias("src"), F.explode(F.array(
        *[(i * 4 + F.lit(k)) % seed_n for k in (1, 2, 3, 4)])).alias("dst"))
    seeds = ids.filter(i % 10007 == 0).select(i.alias("node_id"))
    return seed_distance(edges, seeds, max_hops=8).count()

out = {}
for name, fn in (("paragraph_dedup", t_para), ("inverted_index", t_inv),
                 ("dust_rules", t_dust), ("seed_distance", t_seed)):
    t0 = time.perf_counter()
    c = fn()
    out[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": c}
spark.stop()
print("RESULT " + json.dumps(out))
'''


def run_arm(cores):
    p = subprocess.run([sys.executable, "-c", WORKER, str(cores)],
                       capture_output=True, text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {2: [], 8: []}
    for rep in range(reps):
        for cores in (2, 8):
            res[cores].append(run_arm(cores))
            print(f"rep {rep} local[{cores}]: " + json.dumps(res[cores][-1]))
    names = list(res[2][0])
    print("\n| op | local[2] med s | local[8] med s | 2->8 eff |")
    print("|---|---|---|---|")
    for n in names:
        m2 = statistics.median(r[n]["sec"] for r in res[2])
        m8 = statistics.median(r[n]["sec"] for r in res[8])
        print(f"| {n} | {m2} | {m8} | {round(m2 / m8 / 4, 3)} |")
        rows = {r[n]["rows"] for r in res[2]} | {r[n]["rows"] for r in res[8]}
        assert len(rows) == 1, (n, rows)


if __name__ == "__main__":
    main()
