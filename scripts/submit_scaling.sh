#!/bin/bash
# N-vs-4N scaling of the PACKAGED crawl job (the north rule's literal
# "ships via spark-submit --py-files ... at two cluster sizes" path).
#
# Generates a 250k-page bench-shaped corpus parquet once, then runs the
# identical job alternating local[2] / local[8] (interleaved to cancel
# machine drift — single runs on this VM vary up to 2x; compare MEDIANS,
# see BENCH/BASELINE.md). Bench discipline: --warm (steady-state), AQE
# off, fat rounds (2048 seeds, depth 5, 4 rounds), corpus cached.
#
# Usage: scripts/submit_scaling.sh [reps-per-arm]   (default 3)
set -e
cd "$(dirname "$0")/.."
REPS=${1:-3}
CORPUS=/tmp/osmospark_scale_corpus.parquet

python scripts/package.py

if [ ! -d "$CORPUS" ]; then
  python - <<'EOF'
import sys
sys.path.insert(0, ".")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from osmospark.corpus import synth_corpus_df
synth_corpus_df(spark, 250_000, n_hosts=64, intra_links=4, cross_links=2,
                weight=60, partitions=128) \
    .write.mode("overwrite").parquet("/tmp/osmospark_scale_corpus.parquet")
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
      --politeness --concurrency 500 \
      --broadcast-threshold 1000000 --warm \
      --max-depth 5 --max-rounds 4 --aqe off 2>/dev/null | tail -1)
  echo "local[$arm] $out"
done
