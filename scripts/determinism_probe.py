"""Partitioning-determinism probe for the query registry.

The driver's correctness gate runs each ``queries()`` entry under ITS
OWN Spark session config; the repo's sweeps run under local[32] with 32
shuffle partitions. A query whose output depends on partitioning — task
order feeding a ``collect_list``, float summation order, a tie broken by
``first()`` — can hash green in every repo sweep and still flip in the
driver's gate. This probe runs the registry under a deliberately HOSTILE
config (odd core count, prime shuffle-partition count, tiny default
parallelism) and compares every result's value hash against the
committed sweep ledger captured at local[32]/32:

    python scripts/determinism_probe.py \
        --ledger BENCH/oracle_sweep_r5_sf001.json \
        --sf /root/testdata/sf0.01 [--first N]

Exit 0 = every query's hash is identical under both configs (the
registry is partitioning-deterministic); any DIFF line is a bug to fix
before the driver finds it. The repo's operators keep this property by
construction — integer arithmetic everywhere an oracle compares values,
``array_sort`` before any ``concat_ws``/``collect_list`` consumption,
total ORDER BY keys on every ranked output — and this probe is the
regression check for that discipline.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osmospark.oraclecmp import digest, norm_rows  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--ledger", default=str(
        REPO / "BENCH" / "oracle_sweep_r5_sf001.json"))
    ap.add_argument("--first", type=int, default=None,
                    help="probe only the first N registry entries "
                         "(default: all)")
    ap.add_argument("--master", default="local[5]")
    ap.add_argument("--shuffle-partitions", default="7")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    ledger = json.load(open(args.ledger))
    expected = {k: v["value_hash"] for k, v in ledger["results"].items()
                if v.get("value_hash")}

    spark = (SparkSession.builder.master(args.master)
             .appName("determinism-probe")
             .config("spark.sql.shuffle.partitions",
                     args.shuffle_partitions)
             .config("spark.default.parallelism", "3")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    names = list(queries)
    if args.first is not None:
        names = names[:args.first]
    missing = [n for n in names if n not in expected]
    if missing:
        raise SystemExit(f"ledger has no value_hash for: {missing}")

    bad = []
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, args.sf)
            _, normed = norm_rows(sdf.columns,
                                  [tuple(r) for r in sdf.collect()])
            h = digest(normed)
            ok = h == expected[name]
        except Exception as exc:  # noqa: BLE001 — probe, record and go on
            h, ok = f"ERR {type(exc).__name__}: {exc}"[:120], False
        print(f"[{i:3d}/{len(names)}] {'OK ' if ok else 'DIFF'} {name} "
              f"t={time.perf_counter() - t0:.1f}s", flush=True)
        if not ok:
            bad.append((name, h, expected[name]))

    print(f"SUMMARY: {len(names) - len(bad)}/{len(names)} hash-stable "
          f"under {args.master}/{args.shuffle_partitions}-partition "
          "config vs the committed local[32]/32 ledger")
    for name, got, want in bad:
        print("  DIFF", name, "got", got, "want", want)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
