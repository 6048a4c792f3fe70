"""Per-host politeness: robots rules + crawl-delay fetch budgets.

The reference throttles with a concurrency window of 5 in-flight requests
(reference index.js:93, :245-270) and an optional per-item ``delay``
(reference lib/commands/delay.js:13-38). In a batch-iterative engine those
become per-round admission control (north rule: "per-host politeness window
(robots.txt rules + crawl-delay budget)"):

- ``robots`` table: (host, allow/disallow path prefixes, crawl_delay_s);
- per round of nominal duration T, a host gets
  ``slots = max(1, min(concurrency, T / crawl_delay))`` fetch slots;
- admission = ``row_number() OVER (PARTITION BY host ORDER BY priority) <=
  slots`` — a ranking window as the concurrency gate (SURVEY §2.6);
- disallowed URLs are dropped with a metrics row, never fetched.

Robots parsing is the subset that matters for scheduling: ``User-agent: *``
groups with ``Allow``/``Disallow`` prefixes and ``Crawl-delay``.
"""

from __future__ import annotations

DEFAULT_CONCURRENCY = 5      # reference index.js:93
DEFAULT_ROUND_SECONDS = 60.0


def parse_robots(text: str) -> dict:
    """Parse a robots.txt body → {'disallow': [...], 'allow': [...],
    'crawl_delay': float|None} for User-agent: * (subset semantics)."""
    disallow, allow, delay = [], [], None
    applies = False
    for line in (text or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow" and val:
            disallow.append(val)
        elif applies and key == "allow" and val:
            allow.append(val)
        elif applies and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return {"disallow": disallow, "allow": allow, "crawl_delay": delay}


def is_allowed(path: str, rules: dict) -> bool:
    """Longest-prefix-match allow/disallow (standard robots semantics)."""
    best_len, allowed = -1, True
    for p in rules.get("allow", ()):
        if path.startswith(p) and len(p) > best_len:
            best_len, allowed = len(p), True
    for p in rules.get("disallow", ()):
        if path.startswith(p) and len(p) > best_len:
            best_len, allowed = len(p), False
        elif path.startswith(p) and len(p) == best_len:
            allowed = False  # disallow wins ties
    return allowed


def host_slots(crawl_delay: float | None,
               concurrency: int = DEFAULT_CONCURRENCY,
               round_seconds: float = DEFAULT_ROUND_SECONDS) -> int:
    """Fetch slots a host gets this round."""
    if not crawl_delay or crawl_delay <= 0:
        return concurrency
    return max(1, min(concurrency * 100, int(round_seconds / crawl_delay)))
