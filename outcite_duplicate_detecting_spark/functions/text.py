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


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), as array<string>."""
    w = words(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))
    )


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text, as array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.lower(c)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(words(col)).cast("long")


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
