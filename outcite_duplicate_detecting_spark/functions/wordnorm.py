"""Word-level normalization: is_word, compound splitting, lemmatization,
authgrams, per-word ascii-folded char-grams.

Reference analogues in /root/reference/code/B2_process_features.py:
- ``is_word`` (:95-96): token ∈ stopwords ∪ WordNet ∪ SymSpell dictionary.
  WordNet/SymSpell are external resources; here the check runs against a
  caller-supplied broadcast wordlist (corpus-derived or bundled) plus the
  stopword set — same call surface, pluggable vocabulary.
- ``splitter``/``split`` (:98-118): recursive longest-valid-prefix
  decompounding with the German linking-'s' rule and capitalization retry.
- lemmatization (:176-178): WordNet lemma by most frequent POS; re-founded
  as a rule-based English suffix lemmatizer validated against the wordlist
  (no nltk in this environment) — same signature, documented divergence.
- ``authgrams`` (:190-200): per-author '_'-joined name parts → char-4-grams,
  4 authors concatenated, padded/truncated to exactly 12 slots.
- ``get_char_ngrams(..., wordsep=True)`` (:134-142): ascii-folded, per-word
  char n-grams, non-distinct, words shorter than n contribute nothing.

All heavy paths are Arrow-batched pandas UDFs over broadcast vocabularies
(map-side; zero shuffle) — the reference applies these per row in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# a compact embedded English core vocabulary so the operators work without
# external resources; callers union in corpus dictionaries for coverage
CORE_WORDS = frozenset(
    """the of and a to in is was he for it with as his on be at by had not
    are but from or have an they which one you were her all she there would
    their we him been has when who will more no if out so said what up its
    about into than them can only other new some could time these two may
    then do first any my now such like our over man me even most made after
    also did many before must through back years where much your way well
    down should because each just those people mr how too little state good
    very make world still own see men work long get here between both life
    being under never day same another know while last might us great old
    year off come since against go came right used take three house himself
    few hand school part small book ball play fire water light paper air
    field land home side without head black white short news room fact
    foot force book word art war history science computer data base rule
    set group term test case point model view plan form list index table
    start end""".split()
)

STOPWORDS = frozenset(
    "the a an and or but if of to in on at by for with from as is are was were be been".split()
)


def make_is_word(vocab: set[str] | frozenset[str] | None = None):
    """Plain-python twin usable inside UDFs and tests."""
    words = frozenset(vocab) if vocab else CORE_WORDS

    def is_word(tok: str) -> bool:
        # reference: len > 2 and (stopword or lexicon hit), B2:95-96
        return len(tok) > 2 and (tok in STOPWORDS or tok.lower() in words)

    return is_word


def compound_split(tok: str, is_word_fn) -> list[str]:
    """Recursive longest-valid-prefix decompounding
    (reference ``splitter``/``split``, B2_process_features.py:98-118).

    Tries the longest left part that is a word, recursing on the remainder;
    the German linking-'s' between compounds is skipped; a failed split
    returns the token itself lowercased."""

    def splitter(s: str) -> list[str] | None:
        for index in range(1, len(s)):
            left = s[:-index]
            right1 = s[-index:]
            right2 = s[-index + 1 :] if index > 1 else ""
            if not is_word_fn(left):
                continue
            r1 = splitter_or_word(right1)
            if r1 is not None:
                return [left] + r1
            if s[-index] == "s":
                r2 = splitter_or_word(right2) if right2 else []
                if r2 is not None:
                    return [left] + r2
        return None

    def splitter_or_word(s: str) -> list[str] | None:
        if s == "":
            return []
        if is_word_fn(s):
            return [s]
        return splitter(s)

    if tok in STOPWORDS or len(tok) <= 2 or is_word_fn(tok):
        return [tok.lower()]
    parts = splitter(tok)
    return [tok.lower()] if not parts else [p.lower() for p in parts]


_LEMMA_RULES: list[tuple[str, str]] = [
    ("ies", "y"),
    ("sses", "ss"),
    ("ches", "ch"),
    ("shes", "sh"),
    ("xes", "x"),
    ("zes", "z"),
    ("men", "man"),
    ("ing", ""),
    ("ing", "e"),
    ("ed", ""),
    ("ed", "e"),
    ("s", ""),
]


def lemmatize(tok: str, is_word_fn) -> str:
    """Rule-based suffix lemmatizer validated against the lexicon — the
    WordNet-free stand-in for the reference's WNL.lemmatize (B2:176-178).
    The first rule whose result is a known word wins; otherwise the token
    passes through."""
    low = tok.lower()
    for suf, rep in _LEMMA_RULES:
        if low.endswith(suf) and (rep or len(low) > len(suf) + 1):
            cand = low[: -len(suf)] + rep
            if cand != low and is_word_fn(cand):
                return cand
    return low


def normalize_tokens_udf(vocab: set[str] | None = None):
    """array<string> tokens → array<string>: unknown tokens decompounded,
    every surviving token lemmatized (the reference's get_word_ngrams known/
    unknown flow, B2:160-180, minus the SymSpell correction which is
    functions/spell.py)."""
    iw = make_is_word(vocab)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def norm(tokens):  # pd.Series of lists
        import pandas as pd

        out = []
        for toks in tokens:
            if toks is None:
                out.append([])
                continue
            acc: list[str] = []
            for t in toks:
                if iw(t):
                    acc.append(lemmatize(t, iw))
                else:
                    parts = compound_split(t, iw)
                    if len(parts) > 1:
                        acc.extend(lemmatize(p, iw) for p in parts)
                    else:
                        acc.extend(parts)
            out.append(acc)
        return pd.Series(out)

    return norm


def py_chargrams_per_word(s: str | None, n: int = 4, wordsep: bool = True) -> list[str]:
    """Reference get_char_ngrams (B2:134-142): lowercased, spaces → '_',
    ascii-fold elided (input expected pre-folded), per-word char n-grams,
    NON-distinct, words shorter than n yield nothing."""
    if s is None:
        return []
    s = s.lower().replace(" ", "_")
    words = s.split("_") if wordsep else [s]
    grams: list[str] = []
    for w in words:
        grams += [w[i : i + n] for i in range(len(w) - (n - 1))]
    return grams


def py_authgrams(
    authors: list[tuple[str | None, str | None, str | None]], n: int = 4
) -> list[str | None]:
    """Reference authgrams (B2:190-200): first 4 authors' '_'-joined
    non-null (surname, initial, firstname) parts → char-n-grams, concat,
    pad/truncate to exactly 12 slots."""
    grams: list[str] = []
    for parts in authors[:4]:
        joined = "_".join(p for p in parts if p)
        grams += py_chargrams_per_word(joined, n=n, wordsep=True)
    return grams[:12] if len(grams) >= 12 else grams + [None] * (12 - len(grams))


def authgrams_udf(n: int = 4):
    """array<struct<surname,initials,firstnames>> (first entries used) →
    fixed 12-slot gram array."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def ag(authors):
        import pandas as pd

        out = []
        for lst in authors:
            if lst is None:
                out.append([None] * 12)
                continue
            tuples = []
            for a in lst:
                sur = a["surname"] if "surname" in a else None
                ini = a["initials"] if "initials" in a else None
                fir = a["firstnames"] if "firstnames" in a else None
                if isinstance(ini, (list, tuple)):
                    ini = ini[0] if len(ini) else None
                if isinstance(fir, (list, tuple)):
                    fir = fir[0] if len(fir) else None
                tuples.append((sur, ini, fir))
            out.append(py_authgrams(tuples, n=n))
        return pd.Series(out)

    return ag


def asciifolded_word_chargrams(col: Column | str, n: int = 4) -> Column:
    """The reference's full get_char_ngrams(wordsep=True) composition
    (B2_process_features.py:134-142): asciiDammit-fold, lowercase,
    space→'_', per-word char n-grams — asciifold ∘ chargrams_per_word,
    all Catalyst."""
    from .textnorm import asciifold

    c = F.col(col) if isinstance(col, str) else col
    return chargrams_per_word(asciifold(c), n=n)


def chargrams_per_word(col: Column | str, n: int = 4) -> Column:
    """Catalyst twin of py_chargrams_per_word for pre-folded text: per-word
    non-distinct char n-grams, short words contribute nothing."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.replace(F.lower(c), F.lit(" "), F.lit("_")), "_")
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0] in Spark, so
    # words shorter than n must short-circuit to an empty array
    per_word = F.transform(
        words,
        lambda w: F.when(
            F.length(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(w) - (n - 1)),
                lambda i: F.substring(w, i, n),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.flatten(per_word)
