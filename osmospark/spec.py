"""Fluent chain builder — the engine's logical plan.

The reference compiles fluent calls into a doubly-linked list of Command
nodes (reference lib/Command.js:480-515 ``contextCommand``), re-parenting
nested instances used as arguments (lib/Command.js:517-543
``findCommandArg``, index.js:350-354 ``setParent``). Here a chain is an
immutable-at-run-time list of ``Cmd(name, args)``; nested chains appear
inside ``set``/``do`` args and are marked ``nested`` so ``find`` switches to
relative evaluation (reference lib/commands/find.js:74-83).

The chain is *declarative*: the local interpreter executes it synchronously
per page, and the Spark frontier engine executes the same object inside
mapInPandas batches, turning fetch boundaries into frontier rounds.
"""

from __future__ import annotations

_CONTEXT_COMMANDS = {
    "get", "post", "parse", "find", "select", "set", "follow", "paginate",
    "filter", "fail", "success", "contains", "match", "then", "do", "data",
    "delay",
}
_CONFIG_COMMANDS = {"config", "cookie", "header", "headers", "proxy",
                    "done", "log", "error", "debug"}


class Cmd:
    __slots__ = ("name", "args")

    def __init__(self, name: str, args: tuple) -> None:
        self.name = name
        self.args = args

    def __repr__(self) -> str:  # pragma: no cover
        return f"Cmd({self.name})"


class Chain:
    """An ordered list of commands plus chain-level config/callbacks."""

    def __init__(self) -> None:
        self.commands: list[Cmd] = []
        self.nested = False          # True when used as a set/do argument
        self.opts: dict = {}
        self.on_data = []            # .data(cb) sinks
        self.on_done = []            # .done(cb)
        self.on_log = []
        self.on_error = []

    # -- fluent API ------------------------------------------------------
    def _append(self, name: str, *args) -> "Chain":
        for a in args:
            _mark_nested(a)
        self.commands.append(Cmd(name, args))
        return self

    def get(self, url, params=None):
        return self._append("get", url, params)

    def post(self, url, params=None):
        return self._append("post", url, params)

    def parse(self, html, base_url=None):
        return self._append("parse", html, base_url)

    def find(self, selector):
        return self._append("find", selector)

    def select(self, selector):
        return self._append("select", selector)

    def set(self, key, val=None):
        # arg normalization mirrors reference lib/commands/set.js:18-31
        if val is not None:
            spec = {key: val}
            is_array = False
        elif isinstance(key, str):
            spec = {key: None}
            is_array = False
        elif isinstance(key, list):
            spec = key
            is_array = True
        else:
            spec = key
            is_array = isinstance(key, list)
        for v in (spec if is_array else spec.values()):
            _mark_nested(v)
        self.commands.append(Cmd("set", (spec, is_array)))
        return self

    def follow(self, selector):
        return self._append("follow", selector)

    def paginate(self, selector, limit=None):
        return self._append("paginate", selector, limit)

    def submit(self, selector, params=None):
        """Submit a form or submit button (reference
        lib/commands/submit.js:16-49). ``params`` may be a dict or a
        callback over (context, data) merged onto the collected inputs."""
        return self._append("submit", selector, params)

    def login(self, user, password):
        """Fill and submit the page's login form (reference
        lib/commands/login.js:17-72)."""
        return self._append("login", user, password)

    def filter(self, selector):
        return self._append("filter", selector)

    def fail(self, selector):
        return self._append("fail", selector)

    def success(self, selector):
        return self._append("success", selector)

    def contains(self, string):
        return self._append("contains", string)

    def match(self, regex):
        return self._append("match", regex)

    def then(self, cb):
        return self._append("then", cb)

    def do(self, *chains):
        return self._append("do", *chains)

    def delay(self, seconds):
        return self._append("delay", seconds)

    # -- runtime control (reference lib/commands/{pause,resume,stop}.js:
    # immediate-effect instance flags, NOT queued commands — calling them
    # mid-run, e.g. from a then/log callback, takes effect at the next
    # interpreter step; nested chains share the runner like nested
    # reference instances share the parent queue, index.js:350-354) -------

    def pause(self):
        """Defer all further work onto the resume queue."""
        self._paused_flag = True
        r = getattr(self, "_runner", None)
        if r is not None:
            r.paused = True
        return self

    def resume(self):
        """Un-pause and drain deferred work (reference index.js:364-377)."""
        self._paused_flag = False
        r = getattr(self, "_runner", None)
        if r is not None:
            r.paused = False
            r._drain()
            r._maybe_done()
        return self

    def stop(self):
        """Discard all pending work; .done() callbacks still fire
        (reference test/stop.js)."""
        self._stopped_flag = True
        r = getattr(self, "_runner", None)
        if r is not None:
            r.stopped = True
            r.paused = True
            r._deferred.clear()
            r._maybe_done()
        return self

    def __getstate__(self):
        # never ship the live runner binding to executors
        state = dict(self.__dict__)
        state.pop("_runner", None)
        return state

    def data(self, cb):
        self.on_data.append(cb)
        return self._append("data", cb)

    def done(self, cb):
        self.on_done.append(cb)
        return self

    def log(self, cb):
        self.on_log.append(cb)
        return self

    def error(self, cb):
        self.on_error.append(cb)
        return self

    def config(self, key, val=None):
        """Scoped option mutation (reference lib/commands/config.js:13-35;
        prototype-chain inheritance lib/Command.js:229-251): options set
        here apply to the PRECEDING command on down the chain — so
        ``.get(url).config(opts)`` configures the get's own request."""
        delta = dict(key) if isinstance(key, dict) else {key: val}
        return self._append("config", delta)

    def cookie(self, name, value):
        """reference lib/commands/cookie.js:15-45 (scoped like config)."""
        return self._append("config", {"cookies": {name: value}})

    def header(self, name, value):
        """reference lib/commands/header.js:13-25."""
        return self._append("config", {"headers": {name: value}})

    def headers(self, obj):
        """reference lib/commands/headers.js:12-24."""
        return self._append("config", {"headers": dict(obj)})

    def proxy(self, p):
        """reference lib/commands/proxy.js:11-14 (slot attribute only —
        no live proxies against a static corpus, SURVEY §2.1)."""
        return self._append("config", {"proxy": p})

    def __repr__(self) -> str:  # pragma: no cover
        return "Chain(" + " → ".join(c.name for c in self.commands) + ")"


def _mark_nested(arg) -> None:
    """Mark nested chains (recursing into dict/list specs), the analogue of
    findCommandArg re-parenting (reference lib/Command.js:517-543)."""
    if isinstance(arg, Chain):
        arg.nested = True
    elif isinstance(arg, dict):
        for v in arg.values():
            _mark_nested(v)
    elif isinstance(arg, (list, tuple)):
        for v in arg:
            _mark_nested(v)


def collect_chains(root: Chain) -> list[Chain]:
    """All chains reachable from ``root`` (root first): nested instances in
    set specs / do args, recursively. Gives each chain a stable index so a
    continuation can name its chain across rounds."""
    out: list[Chain] = []
    seen: set[int] = set()

    def walk(obj) -> None:
        if isinstance(obj, Chain):
            if id(obj) in seen:
                return
            seen.add(id(obj))
            out.append(obj)
            for cmd in obj.commands:
                for a in cmd.args:
                    walk(a)
        elif isinstance(obj, dict):
            for v in obj.values():
                walk(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                walk(v)

    walk(root)
    return out


class _Factory:
    """``O.get(...)`` / ``O.find(...)`` / ``O('/url')`` entry points,
    mirroring the auto-generated StartingFunction set
    (reference index.js:393-406)."""

    def __call__(self, url, params=None) -> Chain:
        return Chain().get(url, params)

    def __getattr__(self, name: str):
        if name in _CONTEXT_COMMANDS or name in _CONFIG_COMMANDS:
            def starter(*args, **kwargs):
                return getattr(Chain(), name)(*args, **kwargs)
            return starter
        raise AttributeError(name)


O = _Factory()
