"""Dictionary-based spell correction (SymSpell-style, self-contained).

The reference corrects tokens with SymSpell dictionaries at edit distance
≤ min(4, 0.2·len) (/root/reference/code/B2_process_features.py:49-50,
120-123). No SymSpell package ships in this environment, so the public
algorithm (Garbe's symmetric-deletion lookup) is re-implemented here in
~60 lines: index every dictionary term under all of its deletion variants
up to max_edits; lookup generates the query's deletion variants and
verifies candidates by true Damerau-ish edit distance, preferring higher
corpus frequency then lexicographic order.

Usage in Spark: build the index once on the driver, broadcast it, and
correct token arrays inside a pandas UDF (map-side dictionary join —
SURVEY.md §2.3 'dictionary lookup join').
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd


def _deletes(word: str, max_edits: int) -> set[str]:
    out = {word}
    frontier = {word}
    for _ in range(max_edits):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def edit_distance(a: str, b: str, cap: int) -> int:
    """Levenshtein with early cutoff; returns cap+1 when above cap."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            best = min(best, cur[j])
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


class SymSpellIndex:
    def __init__(self, frequencies: dict[str, int], max_edits: int = 2):
        self.max_edits = max_edits
        self.freq = dict(frequencies)
        self.index: dict[str, list[str]] = defaultdict(list)
        for term in self.freq:
            for d in _deletes(term, max_edits):
                self.index[d].append(term)

    def correct(self, token: str) -> str:
        """Closest dictionary term within min(max_edits, 0.2·len) edits
        (the reference's cap rule, scaled); the token itself if in the
        dictionary or nothing qualifies."""
        if token in self.freq:
            return token
        cap = min(self.max_edits, max(1, int(0.2 * len(token))))
        seen: set[str] = set()
        best: tuple[int, int, str] | None = None
        for d in _deletes(token, cap):
            for cand in self.index.get(d, ()):
                if cand in seen:
                    continue
                seen.add(cand)
                dist = edit_distance(token, cand, cap)
                if dist <= cap:
                    key = (dist, -self.freq[cand], cand)
                    if best is None or key < best:
                        best = key
        return best[2] if best else token


def correct_tokens_udf(index: SymSpellIndex):
    """pandas UDF over array<string> token columns using a broadcast-style
    closure (the index pickles once per executor)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def correct(tokens: pd.Series) -> pd.Series:
        cache: dict[str, str] = {}

        def one(tok: str) -> str:
            if tok not in cache:
                cache[tok] = index.correct(tok)
            return cache[tok]

        return pd.Series(
            [[one(t) for t in (ts if ts is not None else [])] for ts in tokens]
        )

    return correct
