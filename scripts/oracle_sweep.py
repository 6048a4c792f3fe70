"""Judge-style oracle sweep: run EVERY queries() entry on Spark and its
oracle_sql() on DuckDB at a chosen scale factor, compare row counts, column
names, and an order-insensitive value hash — the same three-way compare the
round driver records in CORRECTNESS_r{N}.json — and write a per-query JSON
ledger.

Why this exists: the driver's correctness gate checks only the FIRST 50
registry entries per round (observed r3/r4/r5); with 108 oracle-backed
queries the remainder would otherwise carry only pytest evidence. This
script makes the full sweep an auditable artifact (BENCH/oracle_sweep_*.json)
instead of a claim: anyone can re-run

    python scripts/oracle_sweep.py --sf /root/testdata/sf0.01 \
        --out BENCH/oracle_sweep_r5_sf001.json

and diff the ledger. Row values are normalized by osmospark.oraclecmp —
the SAME module the pytest gate imports (floats to 9 significant digits,
NaN folded, columns sorted by name, rows sorted) — so a hash match here is
the same statement as a green driver row by construction, not by parallel
maintenance of two copies.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osmospark.oraclecmp import TABLES, digest, norm_rows  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all)")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (SparkSession.builder.master("local[32]")
             .appName("oracle-sweep")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - set(names)
        if unknown:
            # a typo must not shrink the sweep to 0/0 and exit green
            raise SystemExit(f"--only names not in the registry: "
                             f"{sorted(unknown)}")
        names = [n for n in names if n in keep]

    results: dict[str, dict] = {}
    green = 0
    for i, name in enumerate(names, 1):
        rec: dict = {"rows": None, "rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_sec": None, "err": None}
        try:
            t0 = time.perf_counter()
            sdf = queries[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_sec"] = round(time.perf_counter() - t0, 2)
            rec["rows"] = len(srows)
            res = duck.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["rows_match"] = len(srows) == len(drows)
            rec["schema_match"] = sorted(scols) == sorted(dcols)
            _, s_norm = norm_rows(scols, srows)
            _, d_norm = norm_rows(dcols, drows)
            rec["hash_match"] = digest(s_norm) == digest(d_norm)
            rec["value_hash"] = digest(s_norm)
        except Exception as exc:  # ledger, not a test: record and continue
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        ok = bool(rec["rows_match"] and rec["schema_match"]
                  and rec["hash_match"] and rec["err"] is None)
        green += ok
        results[name] = rec
        print(f"[{i:3d}/{len(names)}] {'OK ' if ok else 'RED'} {name} "
              f"rows={rec['rows']} t={rec['spark_sec']}s"
              + (f" err={rec['err']}" if rec["err"] else ""),
              flush=True)

    out = {"sf_dir": args.sf, "n_queries": len(names), "green": green,
           "red": len(names) - green, "results": results}
    text = json.dumps(out, indent=1)
    if args.out:
        Path(args.out).write_text(text)
        print(f"wrote {args.out}")
    print(f"SUMMARY green={green}/{len(names)}")
    spark.stop()
    return 0 if green == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
