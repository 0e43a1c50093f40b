"""Shingling / tokenization as JVM-side column expressions.

Reference analogues (see SURVEY.md §2.8): ``get_ngrams`` (char n-grams,
/root/reference/code/common.py:50-57), ``get_words``
(/root/reference/code/common.py:234-240), ``get_wordgrams``
(/root/reference/code/common.py:243-251). The reference applies these
per-row in Python; here they are pure Catalyst expressions
(split / transform / sequence / slice) so they stay inside whole-stage
codegen — no Python in the hot path.

Semantics are nailed down precisely (and mirrored 1:1 in the DuckDB
oracle SQL in __spark_entry__):

- ``words(text)``   = lowercase, split on /\\s+/, drop empty tokens.
- ``word_shingles(text, n)`` = distinct [' '.join(words[i:i+n])
  for i in 1..max(len-n+1, 1)]; a document shorter than n words yields
  one shingle containing all its words; an empty document yields [''].
- ``char_ngrams(text, n)`` = distinct n-char substrings of the lowercased
  text at every offset (shorter tail substrings excluded); a text shorter
  than n chars yields the whole text as its only gram.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != F.lit(""))


def _sliding_join(arr: Column, n: int, sep: str) -> Column:
    """Sliding n-window join over an array column, O(n·len) per row.

    Implementation note: referencing an outer column subtree *inside* a
    higher-order-function lambda re-evaluates that subtree per array element
    (no CSE inside HOF lambdas) — a naive transform(sequence(...),
    i -> slice(arr, i, n)) is therefore O(len²) per row. Building n shifted
    copies once per row and zipping them keeps it linear.
    """
    shifted = [arr if i == 0 else F.slice(arr, i + 1, 2_147_483_000) for i in range(n)]
    zipped = F.arrays_zip(*shifted)  # padded with nulls at the tail
    fields = [str(i) for i in range(n)]
    joined = F.transform(
        zipped, lambda s: F.concat_ws(sep, *[s[f] for f in fields])
    )
    win = F.slice(joined, 1, F.greatest(F.size(arr) - (n - 1), F.lit(1)))
    # empty array: established semantics yield a single '' shingle
    return F.when(F.size(arr) == 0, F.array(F.lit(""))).otherwise(win)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), as array<string>."""
    if n == 1:
        w = words(col)
        return F.when(F.size(w) == 0, F.array(F.lit(""))).otherwise(F.array_distinct(w))
    return F.array_distinct(_sliding_join(words(col), n, " "))


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text, as array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(F.lower(c), "")
    return F.array_distinct(_sliding_join(chars, n, ""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(words(col)).cast("long")


# --- Python twins (used inside pandas UDFs) ---------------------------------
# Exact same semantics as the Catalyst expressions above; detectors shingle
# in-UDF from the raw text so that only the text column crosses Arrow.

_WS_ASCII = __import__("re").compile(r"\s+", __import__("re").ASCII)


def py_words(text: str) -> list[str]:
    # ASCII \s to match Java's regex class used by the Catalyst twin
    return [w for w in _WS_ASCII.split((text or "").lower()) if w]


def py_word_shingles(text: str, n: int) -> list[str]:
    w = py_words(text)
    if not w:
        return [""]
    if len(w) <= n:
        return [" ".join(w)]
    seen = dict.fromkeys(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
    return list(seen)


# --- DuckDB twins -----------------------------------------------------------
# Each helper above has a SQL twin used to build oracle queries; keeping the
# two side by side makes semantic drift visible in review.

def duck_words(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '\\s+'), x -> x != '')"
    )


def duck_word_shingles(expr: str, n: int = 3) -> str:
    w = duck_words(expr)
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len({w}) - {n - 1}, 1) + 1), "
        # coalesce: duckdb's array_to_string([]) is NULL, spark concat_ws is ''
        f"i -> coalesce(array_to_string(({w})[i:i+{n - 1}], ' '), '')))"
    )


def duck_char_ngrams(expr: str, n: int = 3) -> str:
    t = f"lower({expr})"
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(length({t}) - {n - 1}, 1) + 1), "
        f"i -> substring({t}, i, {n})))"
    )
