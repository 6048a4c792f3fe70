#!/bin/bash
# Politeness-capped packaged-job scaling at a scale where it CAN scale
# (BENCH/BASELINE.md r3: the 61k-page politeness probe reads ~0.29 at
# every partitioning because 4 rounds carry only ~77 core-seconds of
# extraction — fixed costs dominate both arms; VERDICT r3 Next #6).
#
# This probe keeps the politeness shape (per-host slots binding every
# round, salted two-phase admission) but sizes the work so UDF
# core-seconds dominate: 1M-page corpus, concurrency 2000 x 64 hosts,
# 6 rounds, depth 8 => several hundred thousand admitted pages
# (~10x the r3 probe's extraction work). Same discipline as
# submit_scaling.sh: packaged zip, interleaved local[2]/local[8] arms,
# AQE off, --warm, compare medians.
#
# Usage: scripts/submit_polite_big.sh [reps-per-arm]   (default 2)
set -e
cd "$(dirname "$0")/.."
REPS=${1:-2}
CORPUS=/tmp/osmospark_polite_big_corpus.parquet

python scripts/package.py

if [ ! -d "$CORPUS" ]; then
  python - <<'EOF'
import sys
sys.path.insert(0, ".")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from osmospark.corpus import synth_corpus_df
synth_corpus_df(spark, 1_000_000, n_hosts=64, intra_links=4,
                cross_links=2, weight=60, partitions=256) \
    .write.mode("overwrite") \
    .parquet("/tmp/osmospark_polite_big_corpus.parquet")
spark.stop()
EOF
fi

SEEDS=$(python -c "
import sys; sys.path.insert(0, '.')
from osmospark.corpus import synth_seed_urls
print(' '.join(synth_seed_urls(64, per_host=32)))")

ARMS=""
for _ in $(seq "$REPS"); do ARMS="$ARMS 2 8"; done
for arm in $ARMS; do
  out=$(spark-submit --master "local[$arm]" \
      --conf spark.ui.enabled=false \
      --conf spark.ui.showConsoleProgress=false \
      --conf spark.driver.memory=24g \
      --py-files dist/osmospark.zip \
      scripts/crawl_job.py \
      --corpus "$CORPUS" \
      --seeds $SEEDS \
      --follow "li > a" --extract '{"payload": "div", "links": ["a@href"]}' \
      --politeness --concurrency 2000 \
      --corpus-partitions 256 \
      --broadcast-threshold 1000000 --warm \
      --max-depth 8 --max-rounds 6 --aqe off 2>/dev/null | tail -1)
  echo "local[$arm] $out"
done
