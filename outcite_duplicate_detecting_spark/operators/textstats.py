"""Text-analysis operators for training-data pipelines.

All pure Catalyst column expressions (JVM-side, whole-stage codegen) — the
reference's per-row Python normalization pass
(/root/reference/code/B2_process_features.py:206-231) is the analogue; here
nothing leaves the JVM. Each operator has an exact DuckDB SQL twin in
__spark_entry__.oracle_sql.

- ``text_quality``: length/token/punctuation/stopword ratios + a composite
  quality score (heuristics in the spirit of C4/Gopher public filtering
  rules, simplified to stay engine-comparable).
- ``language_id``: marker-token voting with deterministic tie-break —
  the reference collapses cld3 output to a fixed language set
  (/root/reference/code/B2_process_features.py:125-132); same shape here
  without the model dependency.
- ``doc_fingerprint``: sha256 of the whitespace-normalized lowercased text —
  the reference's SHA-1 repID canonicalization analogue
  (/root/reference/code/blocking/code/make_representations_v3.py:47-49).
- ``token_stats``: whitespace + regex token counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words

STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that with as for on at by"
).split()

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "les", "des", "est", "une"],
    "es": ["el", "los", "las", "es", "una"],
    "it": ["il", "gli", "delle", "che", "una"],
}


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    w = words(text_col)
    alpha_tokens = F.size(
        F.filter(w, lambda t: t.rlike("^[a-zà-ÿ]+$"))
    )
    return df.withColumns(
        {
            "n_tokens": F.size(w).cast("long"),
            "n_alpha_tokens": alpha_tokens.cast("long"),
            "n_distinct_tokens": F.size(F.array_distinct(w)).cast("long"),
        }
    )


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + composite score, all in exact integer arithmetic
    (ratios as parts-per-million via integer division) so the DuckDB oracle
    hash-matches without float-ULP drift; score counts satisfied rules 0-4."""
    t = F.col(text_col)
    w = words(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = F.size(w).cast("long")
    stop_hits = F.size(F.filter(w, lambda x: x.isin(STOPWORDS_EN))).cast("long")
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", "")).cast("long")
    tok_chars = F.coalesce(
        F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)),
        F.lit(0).cast("long"),
    )
    distinct_toks = F.size(F.array_distinct(w)).cast("long")

    def ppm(num, den):
        # exact integer floor division: (a - a mod b) / b is an exact double
        # (both ≤ 1e12 < 2^53), avoiding engine-specific DIV/truncation rules
        a = (num * 1000000).cast("long")
        return F.when(den > 0, (a - F.pmod(a, den)) / den).otherwise(F.lit(0)).cast("long")

    punct_ppm = ppm(punct, n_chars)
    stop_ppm = ppm(stop_hits, n_tokens)
    distinct_ppm = ppm(distinct_toks, n_tokens)
    mean_tok_ppm = ppm(tok_chars, n_tokens)
    score = (
        F.when((n_tokens >= 50) & (n_tokens <= 100000), 1).otherwise(0)
        + F.when((mean_tok_ppm >= 3_000_000) & (mean_tok_ppm <= 12_000_000), 1).otherwise(0)
        + F.when(punct_ppm <= 100_000, 1).otherwise(0)
        + F.when(distinct_ppm >= 100_000, 1).otherwise(0)
    )
    return df.withColumns(
        {
            "n_chars_txt": n_chars,
            "n_tokens": n_tokens,
            "punct_ppm": punct_ppm,
            "stopword_ppm": stop_ppm,
            "distinct_ppm": distinct_ppm,
            "mean_token_len_ppm": mean_tok_ppm,
            "quality_score": score.cast("int"),
        }
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-token vote; ties and zero-evidence resolve to 'en' then marker
    order — fully deterministic and SQL-expressible."""
    w = words(text_col)

    def marker_pred(markers: list[str]):
        # NB: the HOF lambda must take exactly one parameter — a second one
        # would be bound to the array index by Spark, not to a closure value
        return lambda x: x.isin(markers)

    scores = {
        lang: F.size(F.filter(w, marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("en")
    for lang in reversed(langs):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def doc_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.sha2(norm, 256))
