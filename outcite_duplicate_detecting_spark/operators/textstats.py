"""Text-analysis operators for training-data pipelines.

All pure Catalyst column expressions (JVM-side, whole-stage codegen) — the
reference's per-row Python normalization pass
(/root/reference/code/B2_process_features.py:206-231) is the analogue; here
nothing leaves the JVM. Each operator has an exact DuckDB SQL twin in
__spark_entry__.oracle_sql.

- ``text_quality``: length/token/punctuation/stopword ratios + a composite
  quality score (heuristics in the spirit of C4/Gopher public filtering
  rules, simplified to stay engine-comparable).
- ``language_id``: char-trigram multinomial vote over per-language
  frequency profiles with deterministic tie-break — the reference
  collapses cld3 output to a fixed language set
  (/root/reference/code/B2_process_features.py:125-132); same collapse
  here ({de,fr,ru,es,it,default}) without the model dependency.
- ``doc_fingerprint``: sha256 of the whitespace-normalized lowercased text —
  the reference's SHA-1 repID canonicalization analogue
  (/root/reference/code/blocking/code/make_representations_v3.py:47-49).
- ``token_stats``: whitespace + regex token counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import spread_small_input
from ..functions.text import words

STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that with as for on at by"
).split()

# Per-language character-trigram profiles (top frequent trigrams over
# space-padded lowercase text; public frequency knowledge — the kind of
# table any Leipzig/UDHR corpus yields). Shared trigrams across languages
# are deliberate: the multinomial vote wins on total own-profile coverage,
# not on exclusive markers. The language SET and collapse (en→default,
# cld3-style) mirror the reference's get_language
# (/root/reference/code/B2_process_features.py:125-132).
LANG_TRIGRAMS: dict[str, list[str]] = {
    "de": ["en ", " de", "der", "er ", "ie ", "die", " di", "und", "nd ",
           " un", "ch ", "ein", "ung", "ng ", "sch", "che", "ich", " ge",
           "ten", "cht", "in ", " ei", "ne ", "ber", "gen", "das", " da",
           "te ", "auf", " au"],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", "es ", "as ",
           " co", "ión", "ón ", "en ", " en", "ent", "que", " qu", "ue ",
           "ado", "nte", "aci", "con", "res", "sta", "ara", " es", "o d",
           "a d", "ra ", "os,"],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", "nt ", "la ", " la",
           "ion", "on ", "re ", "s d", "e d", "e l", "et ", " et", "les",
           "que", " qu", "ue ", " pa", "tio", "ns ", "ait", "our", " co",
           "ur ", "une", " un"],
    "it": [" di", "di ", "to ", "la ", " la", "el ", "re ", " co", "ion",
           "one", "ne ", "che", " ch", "lla", "ell", "ta ", " de", "del",
           "ere", "nte", "ti ", " in", "zio", "ato", "gli", "o d", "a d",
           " pr", "pre", "ita"],
    "ru": [" пр", "при", " на", "на ", "ого", "го ", "ени", "ние", "ие ",
           "ост", "ть ", "ать", "ет ", "тся", " по", "по ", "ова", "ств",
           "его", " не", "но ", " ко", "ия ", " со", "ли ", " в ", "ах ",
           " ме", "ред", "ста"],
    "default": [" th", "the", "he ", "ed ", " an", "and", "nd ", " of",
                "of ", "ing", "ng ", " in", "in ", "ion", " to", "to ",
                "ent", " co", "er ", "es ", "ati", "at ", "is ", " re",
                "tio", "on ", "was", " wa", "s a", "e s"],
}
# deterministic tie-break preference (first profile hitting `best` wins)
LANG_TRIGRAM_ORDER = ["de", "es", "fr", "it", "ru", "default"]


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    # the tokenization HOFs are per-row CPU-heavy; spread a narrow scan
    # so they use every core (no-op at real scale)
    df = spread_small_input(df)
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
    df = spread_small_input(df)
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
    """cld3-class char-trigram multinomial vote over LANG_TRIGRAMS.

    Score(lang) = occurrences of lang-profile trigrams in the space-padded,
    whitespace-collapsed lowercase text; argmax with the fixed
    LANG_TRIGRAM_ORDER tie-break; zero evidence → 'default'. Output set
    {de,fr,ru,es,it,default} matches the reference's get_language collapse
    (B2_process_features.py:125-132; en folds into 'default' there too).
    Integer scoring end to end — whole-stage codegen, no UDF, and the
    DuckDB oracle reproduces it exactly."""

    df = spread_small_input(df)

    def gram_pred(grams: list[str]):
        # NB: the HOF lambda must take exactly one parameter — a second one
        # would be bound to the array index by Spark, not to a closure value
        return lambda g: g.isin(grams)

    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "),
        F.lit(" "),
    )
    d = df.withColumn("_lnorm", norm).withColumn(
        "_grams",
        F.when(
            F.length("_lnorm") >= 3,
            F.transform(
                F.sequence(F.lit(1), F.length("_lnorm") - 2),
                lambda i: F.col("_lnorm").substr(i, F.lit(3)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    scores = {
        lang: F.size(F.filter(F.col("_grams"), gram_pred(tris)))
        for lang, tris in LANG_TRIGRAMS.items()
    }
    best = F.greatest(*[scores[lang] for lang in LANG_TRIGRAM_ORDER])
    expr = F.lit("default")
    for lang in reversed(LANG_TRIGRAM_ORDER):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return d.withColumn(out_col, expr).drop("_lnorm", "_grams")


def doc_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.sha2(norm, 256))
