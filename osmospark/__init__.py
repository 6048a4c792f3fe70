"""osmospark — a PySpark-native crawl-and-extract analytics engine.

A brand-new engine with the query capabilities of rchipka/node-osmosis
(reference at /root/reference, read-only), re-expressed Spark-first:

- ``osmospark.html``     — pure-Python HTML parse + CSS/XPath-subset selector
                           engine (runs inside Arrow UDFs; the analogue of
                           libxml living inside the Node process).
- ``osmospark.record``   — the record algebra (dup-key promotion, array
                           coercion, child merge, sortIndex ordering);
                           semantics of reference lib/Data.js.
- ``osmospark.spec``     — fluent chain builder (get/find/set/follow/...),
                           the logical plan; semantics of reference
                           lib/Command.js chain compilation.
- ``osmospark.interpreter`` — synchronous single-process chain runtime over a
                           PageStore; the byte-identity correctness anchor.
- ``osmospark.corpus``   — deterministic synthetic Common-Crawl-style page
                           corpus (reference test fixtures + scale-out graphs).
- ``osmospark.urlnorm``  — URL canonicalization + xxHash64 identity.
- ``osmospark.frontier`` — the distributed engine: round-based frontier
                           scheduler (Bloom URL-seen, politeness, DFS
                           priority), extraction via mapInPandas, record
                           assembly via grouped aggregation.
- ``osmospark.functions``— training-data pipeline ops (dedup, similarity
                           search, text analysis, multimodal plumbing).
- ``osmospark.tableio``  — Iceberg-style atomic state-table commits
                           (Parquet + manifest fallback when no Iceberg jar).
"""

__version__ = "0.1.0"
