"""Oracle-comparison normalization, shared.

One definition of the driver-gate compare semantics — float cells to 9
significant digits, NaN folded to 'nan', columns sorted by name, rows
sorted — used by BOTH the pytest gate (tests/test_entry_contract.py)
and the standalone full-registry sweep (scripts/oracle_sweep.py). A
single home keeps the sweep ledger's "same statement as a green driver
row" claim true by construction: a future normalization change moves
both consumers at once instead of silently desyncing them.
"""
from __future__ import annotations

import hashlib
import math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    """(columns sorted by name, rows as normalized tuples, sorted)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def digest(normed_rows) -> str:
    """Order-insensitive value hash over already-normalized rows."""
    h = hashlib.sha256()
    for r in normed_rows:
        h.update("\x1f".join(r).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return h.hexdigest()[:16]
