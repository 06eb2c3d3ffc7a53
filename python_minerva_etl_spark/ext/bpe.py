"""A real byte-pair-encoding (BPE) tokenizer — trainer, encoder, and
JVM-side count expressions — with a vendored merge table.

The algorithm is the public subword-NMT BPE (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units"):

- **training**: start from characters, repeatedly merge the most
  frequent adjacent symbol pair across the word-frequency table
  (ties broken deterministically: higher count, then lexicographic
  pair), recording merges in rank order;
- **encoding**: a word starts as characters and each merge ``(a, b)``
  is applied in rank order as a literal left-to-right non-overlapping
  replace — over a SENTINEL-DELIMITED symbol string: every symbol is
  wrapped in ``_`` (``hello`` → ``_h__e__l__l__o_``) and merge
  ``(a, b)`` replaces ``_a__b_`` with ``_ab_``.  Because the pattern
  is anchored by delimiters on both ends and symbols never contain
  the sentinel (words are ``[a-z]+`` by pre-tokenization), a match
  implies exact symbol boundaries — a bare space-joined replace
  (``"a b"`` → ``"ab"``, the round-4 formulation) could merge across
  boundaries the trainer never would (``['xa', 'b']`` matching
  ``"a b"`` inside ``"xa b"``), diverging from the merge table's
  training semantics.  Adjacent matches share no characters
  (``_a__b__a__b_`` hits twice), so sequential replace equals the
  trainer's tuple-wise merge exactly (property-tested against a
  tuple-based reference encoder in tests/test_bpe.py).

The rank-ordered-replace application is chosen deliberately: it is
the sequential-replace formulation of subword-nmt's encoder, and —
crucially for this engine — ``str.replace`` semantics are
IDENTICAL to SQL ``replace()`` in both Spark and DuckDB, so the whole
tokenizer compiles to a JVM-side expression chain (no Python UDF in
the hot path) and the DuckDB oracle can recompute the exact same
token counts.  ``spark_token_count_expr`` / ``duckdb_token_count_sql``
below emit those twin expressions from the same merge table.

Token accounting: lowercase alphabetic words are BPE-encoded; digit
runs and single non-alphanumeric marks count one token each (the same
pre-tokenization split as ``BPE_ISH_PATTERN`` in ext/text.py).

The vendored merge table (``bpe_merges.txt``) is trained by
``scripts/train_bpe.py`` on the synthetic corpus plus a fixed common-
English seed list — regenerate with that script; never hand-edit.
"""

from __future__ import annotations

import os
from collections import Counter
from functools import lru_cache

_MERGES_PATH = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")


def train_bpe(word_freqs: dict[str, int],
              n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    Deterministic: the best pair maximizes (count, pair) with the
    lexicographically GREATEST pair winning count ties — any total
    order works as long as trainer and re-trainer agree."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_freqs.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[sym[i], sym[i + 1]] += cnt
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """BPE-encode one word by rank-ordered sequential replace over the
    sentinel-delimited symbol string (the exact semantics the SQL
    twins reproduce; boundary-safe — see module docstring)."""
    s = "".join(f"_{c}_" for c in word)
    for a, b in merges:
        s = s.replace(f"_{a}__{b}_", f"_{a}{b}_")
    return s[1:-1].split("__") if s else []


@lru_cache(maxsize=1)
def load_merges() -> tuple[tuple[str, str], ...]:
    """The vendored merge table, rank order, one ``a b`` per line."""
    with open(_MERGES_PATH) as fh:
        return tuple(tuple(line.split(" ", 1))  # type: ignore[misc]
                     for line in fh.read().splitlines() if line)


def token_count(text: str,
                merges: list[tuple[str, str]] | None = None) -> int:
    """Reference (driver-side) token count: BPE pieces for lowercase
    alpha words + one per digit run / punctuation mark."""
    import re

    ms = list(merges if merges is not None else load_merges())
    n = sum(len(encode_word(w, ms))
            for w in re.findall(r"[a-z]+", text.lower()))
    n += len(re.findall(r"[0-9]+|[^A-Za-z0-9\s]", text))
    return n


def _replace_chain(inner: str, merges, fn: str = "replace") -> str:
    for a, b in merges:
        qa = f"_{a}__{b}_".replace("'", "''")
        qb = f"_{a}{b}_".replace("'", "''")
        inner = f"{fn}({inner}, '{qa}', '{qb}')"
    return inner


def spark_word_pieces_expr(word_col: str = "w") -> str:
    """Spark SQL expression: BPE piece count of one lowercase word —
    spread to sentinel-wrapped characters, run the merge chain as
    nested literal ``replace`` calls, count the surviving symbols
    (``k`` symbols have ``k-1`` ``__`` separators, so a split on
    ``__`` counts them).  Use this over a DISTINCT-word aggregate at
    scale: the chain then runs on vocabulary-sized data (millions of
    types), not corpus-sized data (trillions of tokens)."""
    merged = _replace_chain(
        f"regexp_replace({word_col}, '(.)', '_$1_')", load_merges())
    return f"size(split({merged}, '__'))"


def spark_token_count_expr(text_col: str = "text") -> str:
    """Spark SQL expression (for ``F.expr``) computing the real BPE
    token count of ``text_col`` ENTIRELY JVM-side: pre-tokenize with
    regexp_extract_all, spread each word to spaced characters, run
    the vendored merge chain as nested literal ``replace`` calls, and
    sum the piece counts — zero Python in the hot path, whole-stage
    codegen throughout."""
    return (
        "aggregate("
        f"  transform(regexp_extract_all(lower({text_col}), '[a-z]+', 0),"
        f"            w -> {spark_word_pieces_expr('w')}),"
        "  0L, (acc, x) -> acc + x)"
        f" + regexp_count({text_col}, '[0-9]+|[^A-Za-z0-9\\\\s]')")


def duckdb_token_count_sql(text_col: str = "text") -> str:
    """The DuckDB twin of :func:`spark_token_count_expr` — same merge
    chain, same replace semantics, same pre-tokenization."""
    merges = load_merges()
    word_tokens = _replace_chain(
        f"regexp_replace(w, '(.)', '_\\1_', 'g')", merges)
    return (
        "(COALESCE(list_sum(list_transform("
        f"   regexp_extract_all(lower({text_col}), '[a-z]+'),"
        f"   w -> len(string_split({word_tokens}, '__')))), 0)"
        f" + len(regexp_extract_all({text_col}, '[0-9]+|[^A-Za-z0-9\\s]')))")
