"""Iceberg-style state tables with atomic round commits.

The north rule asks for Iceberg state tables with resumable rounds.
TableIO provides one API with two backends:

- **iceberg** (``use_iceberg=True``): requires a Spark session with an
  Iceberg catalog configured (``spark.sql.catalog.<name>`` +
  the Iceberg runtime jar on the classpath). Each logical table becomes
  ``<catalog>.<namespace>.<table>`` carrying a ``round`` column; a round
  commit is ``writeTo(...).overwritePartitions()`` scoped to that round
  — ONE atomic Iceberg snapshot (idempotent on re-commit of the same
  round). Constructing with ``use_iceberg=True`` and no catalog raises
  immediately rather than falling back silently.
- **parquet+manifest** (default; the only backend exercisable in this
  sandbox, which has no Iceberg jar): each round writes to a staged
  directory ``<table>/_staging/round=<k>-<nonce>`` then atomically
  installs it by renaming to ``<table>/round=<k>`` and rewriting
  ``<table>/_manifest.json`` (the commit point). A crashed round leaves
  only staging garbage; resume reads the last manifest. This implements
  the same commit contract (atomic install, monotone committed_round,
  per-round metadata) Iceberg snapshots give.

Both backends keep the driver-side ``_manifest.json`` as round
bookkeeping (rounds list, committed_round, per-round meta); under
iceberg the durable commit point is the snapshot, and the manifest is
rebuilt from ``max(round)`` if missing.

At 10^10-URL scale each logical table stays partitioned (``host_bucket``)
so no state is ever collected to the driver.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid


def detect_iceberg_catalog(spark) -> str | None:
    """Name of the first Iceberg catalog configured on the session, or
    None. Checks the session's SparkConf (catalogs are configured at
    session start) plus the runtime SQLConf for explicitly-probed keys."""
    if spark is None:
        return None
    pat = re.compile(r"^spark\.sql\.catalog\.([A-Za-z0-9_]+)$")
    try:
        pairs = spark.sparkContext.getConf().getAll()
    except Exception:
        pairs = []
    for key, val in pairs:
        m = pat.match(key)
        if m and "iceberg" in (val or "").lower():
            return m.group(1)
    return None


class TableIO:
    def __init__(self, root: str, spark=None, use_iceberg: bool = False,
                 catalog: str | None = None, namespace: str = "osmospark"):
        self.root = root
        self.spark = spark
        self.use_iceberg = use_iceberg
        self.namespace = namespace
        self.catalog = None
        if use_iceberg:
            if catalog is not None:
                # explicit catalog: accept a runtime-set key too
                conf_val = None
                if spark is not None:
                    conf_val = spark.conf.get(
                        f"spark.sql.catalog.{catalog}", None)
                if not conf_val:
                    raise ValueError(
                        f"use_iceberg=True but spark.sql.catalog.{catalog} "
                        "is not configured on this session")
                self.catalog = catalog
            else:
                self.catalog = detect_iceberg_catalog(spark)
                if self.catalog is None:
                    raise ValueError(
                        "use_iceberg=True but no spark.sql.catalog.* with "
                        "an Iceberg implementation is configured; configure "
                        "an Iceberg catalog (plus the runtime jar) or use "
                        "the parquet+manifest backend (use_iceberg=False)")
        os.makedirs(root, exist_ok=True)

    def _qualified(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    # -- manifest -----------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def manifest(self, table: str) -> dict:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            if self.use_iceberg:
                return self._manifest_from_iceberg(table)
            return {"rounds": [], "committed_round": -1}
        with open(path) as f:
            return json.load(f)

    def _manifest_from_iceberg(self, table: str) -> dict:
        """Rebuild round bookkeeping from the Iceberg table itself (the
        durable source of truth under this backend)."""
        try:
            rows = (self.spark.table(self._qualified(table))
                    .select("round").distinct().collect())
        except Exception:
            return {"rounds": [], "committed_round": -1}
        rounds = sorted(int(r["round"]) for r in rows)
        return {"rounds": rounds,
                "committed_round": rounds[-1] if rounds else -1}

    def _write_manifest(self, table: str, manifest: dict) -> None:
        path = self._manifest_path(table)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)  # atomic on POSIX

    # -- commit/read -----------------------------------------------------
    def commit_round(self, table: str, round_no: int, df,
                     meta: dict | None = None) -> str:
        """Write df for a round and atomically commit it."""
        if self.use_iceberg:
            from pyspark.sql import functions as F
            qualified = self._qualified(table)
            self.spark.sql(
                f"CREATE NAMESPACE IF NOT EXISTS "
                f"{self.catalog}.{self.namespace}")
            tagged = df.withColumn("round", F.lit(int(round_no)))
            if not self._iceberg_table_exists(qualified):
                tagged.writeTo(qualified) \
                    .partitionedBy(F.col("round")).create()
            else:
                # dynamic partition overwrite: ONE atomic snapshot
                # replacing exactly this round's partition (idempotent
                # on re-commit of the same round)
                tagged.writeTo(qualified).overwritePartitions()
            committed = qualified
        else:
            table_dir = os.path.join(self.root, table)
            os.makedirs(table_dir, exist_ok=True)
            staging = os.path.join(
                table_dir, "_staging",
                f"round={round_no}-{uuid.uuid4().hex[:8]}")
            df.write.mode("overwrite").parquet(staging)
            final = os.path.join(table_dir, f"round={round_no}")
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(staging, final)
            committed = final
        manifest = self.manifest(table)
        manifest["rounds"] = sorted(
            {r["round"] for r in _norm_rounds(manifest)} | {round_no})
        manifest["committed_round"] = max(manifest["rounds"])
        manifest["meta"] = {**(manifest.get("meta") or {}),
                            str(round_no): (meta or {})}
        manifest["committed_at"] = time.time()
        self._write_manifest(table, manifest)
        return committed

    def _iceberg_table_exists(self, qualified: str) -> bool:
        try:
            self.spark.table(qualified)
            return True
        except Exception:
            return False

    def read_round(self, table: str, round_no: int):
        if self.use_iceberg:
            from pyspark.sql import functions as F
            return (self.spark.table(self._qualified(table))
                    .filter(F.col("round") == int(round_no)).drop("round"))
        return self.spark.read.parquet(
            os.path.join(self.root, table, f"round={round_no}"))

    def read_all(self, table: str):
        if self.use_iceberg:
            if not self._iceberg_table_exists(self._qualified(table)):
                return None
            return self.spark.table(self._qualified(table)).drop("round")
        manifest = self.manifest(table)
        paths = [os.path.join(self.root, table, f"round={r}")
                 for r in manifest["rounds"]]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def last_round(self, table: str) -> int:
        return self.manifest(table)["committed_round"]


def _norm_rounds(manifest: dict):
    return [{"round": r} for r in manifest.get("rounds", [])]


def write_bucketed(df, table: str, bucket_col: str,
                   n_buckets: int = 64, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a BUCKETED catalog table: rows are
    hash-partitioned into ``n_buckets`` files per write task by
    ``bucket_col`` (optionally sorted inside each bucket).

    Why this exists (the 100-TB co-located-join story): two tables
    bucketed on the same key with the same bucket count equi-join with
    ZERO Exchange — Spark proves both sides' output partitioning
    matches the join keys from the bucket spec, so the corpus never
    reshuffles for the join (``test_state.py`` asserts the executed
    plan is exchange-free vs 2 exchanges unbucketed). For a crawl
    pipeline this is how the pages table joins per-url state (ranks,
    features, seen flags) round after round without paying O(corpus)
    shuffle each time: bucket both by url_hash ONCE at write.

    Requires ``saveAsTable`` (bucket metadata lives in the catalog; the
    sandbox's in-memory catalog is session-scoped — at cluster scale the
    same call against a real metastore or an Iceberg catalog with a
    ``bucket(n, col)`` partition transform is durable)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str,
                  on: str, how: str = "inner"):
    """Equi-join two co-bucketed catalog tables on their bucket key.
    With matching bucket specs the plan contains no Exchange on either
    side; the merge hint pins a sort-merge join so the co-location (not
    a broadcast small-side fallback) is what is exercised."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, on, how)
