"""Trainable BPE tokenizer — closes the gap between the heuristic
"BPE-ish" token estimate (``textstats.token_counts``) and a real
learned subword vocabulary, with zero new dependencies.

Split of responsibilities, 100-TB-shaped:

- **Training** (``train_bpe`` / ``train_bpe_df``) is the classic
  byte-pair-encoding loop (Sennrich et al. 2016, "Neural Machine
  Translation of Rare Words with Subword Units"): repeatedly merge the
  highest-frequency adjacent symbol pair over a word-frequency dict.
  It is an OFFLINE, driver-side step over the corpus *vocabulary* —
  the (word, count) aggregate ``curation.vocab_stats`` already
  produces, which is vocabulary-sized (≤ ``max_vocab`` rows after the
  deterministic top-k cut), not corpus-sized. The corpus itself is
  never collected.
- **Encoding** (``bpe_token_counts`` / ``bpe_tokens``) is the
  DISTRIBUTED step and stays entirely JVM-side: the text is rewritten
  into a paren-delimited symbol string and each learned merge becomes
  one literal ``replace`` expression — a map-only chain inside
  whole-stage codegen, no Python, no shuffle, pipelines inside the
  scan like the other textstats.

Why the paren representation is exact BPE:

- A word "abc" becomes ``(a)(b)(c)``; merge (a,b)→ab is the literal
  replacement ``(a)(b)`` → ``(ab)``. Patterns always start with ``(``
  and end with ``)`` and symbols never contain parens (the normalizer
  strips text to [a-z0-9 ]), so a match can only align on symbol
  boundaries — and ``replace`` rewrites occurrences left-to-right,
  non-overlapping, exactly the within-word order real BPE merges
  occurrences in.
- Applying the merges IN TRAINING ORDER over the whole string is
  equivalent to the canonical "repeatedly merge the lowest-rank pair
  present" encoder: a merge's operand symbols can only be produced by
  strictly earlier merges, so later merges never create new matches
  for an earlier one.
- Word boundaries are bare spaces; merge patterns contain no spaces,
  so tokens never cross words.

The same chain is expressible in ANSI SQL (``replace`` +
``regexp_replace``), which is what the ``bpe_tokenize`` oracle in
``__spark_entry__.py`` does — including RE-TRAINING the merges as one
CTE block per merge step — giving a fully independent cross-engine
check of both the trainer and the encoder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BPE_MERGES = 24

# normalization shared by trainer and encoder (and mirrored in the
# oracle): lowercase, strip everything outside [a-z0-9 \s], collapse
# whitespace. Keeps the symbol alphabet paren-free by construction.
_STRIP_RE = r"[^a-z0-9\s]"


def normalize_for_bpe(col: Column) -> Column:
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(col), _STRIP_RE, ""), r"\s+", " "))


def _merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """One full merge pass over a word: left-to-right, non-overlapping —
    the same occurrence order a literal string replace() uses."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(vocab: dict[str, int],
              num_merges: int = BPE_MERGES) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a (word -> count) dict.

    Deterministic on any input order: the pair choice is (weighted
    count DESC, then pair lexicographic ASC) — the exact tie order the
    SQL oracle's ``ORDER BY c DESC, a, b LIMIT 1`` reproduces. Stops
    early when no adjacent pair remains. Word-internal only (no
    end-of-word marker), matching the distributed encoder."""
    state: dict[tuple[str, ...], int] = {}
    for w, c in vocab.items():
        if w:
            syms = tuple(w)
            state[syms] = state.get(syms, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in state.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        (a, b) = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((a, b))
        new_state: dict[tuple[str, ...], int] = {}
        for syms, c in state.items():
            ns = _merge_word(syms, a, b)
            new_state[ns] = new_state.get(ns, 0) + c
        state = new_state
    return merges


BPE_MAX_VOCAB = 1_000_000


def train_bpe_df(documents: DataFrame, num_merges: int = BPE_MERGES,
                 max_vocab: int | None = BPE_MAX_VOCAB,
                 text_col: str = "text") -> list[tuple[str, str]]:
    """Train merges from a corpus: one word-keyed aggregation (map-side
    partials, shuffles only words — the ``vocab_stats`` plan shape),
    then the result collects to the driver for the offline merge loop.

    ``max_vocab`` (default 1M) caps the collected rows deterministically
    (count DESC, word ASC — a total order, word is unique): at web scale
    the distinct-word count is 10^8+, and an unbounded collect would put
    the whole vocabulary through the driver. The cap is a TakeOrdered
    (no global sort) and only bounds the TRAINING vocabulary — encoding
    (``bpe_token_counts``/``bpe_tokens``) applies the learned merges to
    every document regardless. Merges are unchanged whenever the corpus
    vocabulary fits the cap. Pass ``max_vocab=None`` to explicitly
    opt out and collect everything."""
    words = (documents
             .select(F.explode(F.split(
                 normalize_for_bpe(F.col(text_col)), " ")).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("c")))
    if max_vocab is not None:
        words = words.orderBy(F.col("c").desc(), F.col("w").asc()) \
                     .limit(max_vocab)
    vocab = {r["w"]: r["c"] for r in words.collect()}
    return train_bpe(vocab, num_merges)


def _seq_col(col: Column, merges: list[tuple[str, str]]) -> Column:
    seq = F.regexp_replace(normalize_for_bpe(col), "([^ ])", r"($1)")
    for a, b in merges:
        seq = F.replace(seq, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
    return seq


def bpe_token_counts(documents: DataFrame,
                     merges: list[tuple[str, str]],
                     text_col: str = "text") -> DataFrame:
    """(doc_id, n_bpe_tokens) under the learned merges — the literal
    replace chain, map-only, whole-stage codegen. Token count = number
    of '(' delimiters left after all merges."""
    seq = _seq_col(F.col(text_col), merges)
    n = F.length(seq) - F.length(F.replace(seq, F.lit("(")))
    return documents.select(
        "doc_id", n.cast("int").alias("n_bpe_tokens"))


def bpe_tokens(documents: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """(doc_id, tokens array<string>) — same chain, tokens unwrapped.
    Concatenating a word's tokens reproduces the normalized word (BPE
    is segmentation-only), which the tests assert as a property."""
    seq = _seq_col(F.col(text_col), merges)
    return documents.select(
        "doc_id",
        F.regexp_extract_all(seq, F.lit(r"\(([^)]*)\)"), 1)
        .alias("tokens"))
