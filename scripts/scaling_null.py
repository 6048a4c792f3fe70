"""Null experiment: what scaling THIS box allows, with no Spark at all.

Runs three multiprocessing workloads (pure arithmetic, the engine's real
page-parse+select kernel, and a regex scan that is pure memory streaming)
at several pool sizes and prints one JSON line with pages/sec per size and
N->4N efficiencies.

Purpose: separates engine overhead from hardware ceilings. On this
single-socket VM, memory bandwidth saturates beyond ~12 busy cores, so
*any* allocation- or streaming-heavy workload — including a plain
multiprocessing pool with zero framework — caps well below 4x from 8->32
workers. A multi-node cluster does not share this ceiling (every executor
node brings its own memory controllers), which is why the N->4N evidence
pair is taken in the bandwidth-unconstrained regime (2 vs 8 cores) and the
8->32 pair is reported alongside this null experiment for context.

Usage: python scripts/scaling_null.py [--quick]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import re
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _page():
    from osmospark.corpus import _host_sizes, _synth_page
    hosts = [f"host{h:04d}.test" for h in range(64)]
    sizes = _host_sizes(250_000, 64)
    return _synth_page(0, 7, hosts, sizes, 4, 2, weight=60)[1]


def parse_work(n: int) -> int:
    """The engine's real extraction kernel (parse + selectors)."""
    from osmospark.html import find, parse_html
    html = _page()
    for _ in range(n):
        doc = parse_html(html)
        els = find(doc, "li > a")
        _ = [e.attr("href") for e in els]
        find(doc, "div")
    return n


def arith_work(n: int) -> int:
    """Pure arithmetic — the box's best case (no memory pressure)."""
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def scan_work(n: int) -> int:
    """Regex link scan — pure memory streaming (bandwidth-bound)."""
    html = _page()
    href_re = re.compile(r'<a\s[^>]*?href="([^"]*)"')
    for _ in range(n):
        href_re.findall(html)
    return n


def run(fn, per: int, sizes=(2, 8, 24, 32)) -> dict:
    rates = {}
    for procs in sizes:
        with mp.Pool(procs) as p:
            p.map(fn, [max(1, per // 20)] * procs)  # warm the pool
            t0 = time.perf_counter()
            p.map(fn, [per] * procs)
            dt = time.perf_counter() - t0
        rates[procs] = round(procs * per / dt, 1)
    out = {"rate_per_procs": rates}
    if 2 in rates and 8 in rates:
        out["eff_2_to_8"] = round(rates[8] / (4 * rates[2]), 3)
    if 8 in rates and 32 in rates:
        out["eff_8_to_32"] = round(rates[32] / (4 * rates[8]), 3)
    return out


def main() -> dict:
    quick = "--quick" in sys.argv
    return {
        "parse_kernel": run(parse_work, 400 if quick else 1200),
        "arithmetic": run(arith_work, 1_500_000 if quick else 6_000_000),
        "regex_scan": run(scan_work, 10_000 if quick else 40_000),
    }


if __name__ == "__main__":
    print(json.dumps(main()))
