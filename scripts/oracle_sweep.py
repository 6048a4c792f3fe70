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

and diff the ledger. Row values are normalized exactly as the local pytest
gate does (floats to 9 significant digits, NaN folded, columns sorted by
name, rows sorted) before hashing, so a hash match here is the same
statement as a green driver row.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def _digest(norm_rows) -> str:
    h = hashlib.sha256()
    for r in norm_rows:
        h.update("\x1f".join(r).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return h.hexdigest()[:16]


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
            _, s_norm = _norm(scols, srows)
            _, d_norm = _norm(dcols, drows)
            rec["hash_match"] = _digest(s_norm) == _digest(d_norm)
            rec["value_hash"] = _digest(s_norm)
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
