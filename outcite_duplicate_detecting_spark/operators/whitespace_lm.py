"""Whitespace language model: n-char context statistics for OCR-error repair.

The reference trains this model by scrolling every document out of ES and
accumulating nested python dicts in driver memory
(/root/reference/code/M_train_whitespace_LM.py:25-61 context generation,
:129-171 frequency accumulation) — capped at one machine's RAM. Here the
context-pair generation is a JVM-side flatten (no UDF, no per-row python)
and the accumulation is ONE groupBy: the model table is distributed,
spillable, and incrementally mergeable (retrain = union + re-aggregate).

Context semantics (exactly the reference generator's):
- text is lowercased with CR/LF → space, then whitespace-split,
- ACROSS pairs: for consecutive words (a, b) → h = last ``nchar`` chars of
  a, w = first ``nchar`` chars of b  (evidence FOR a space),
- WITHIN pairs: for every in-word split point i → h = last ``nchar`` chars
  of word[:i], w = first ``nchar`` chars of word[i:]  (evidence AGAINST).

``p_separate`` then scores a candidate word pair the way the reference's
``prob_sep`` does (M_train_whitespace_LM.py:70-75): unigram-product
probability of the boundary under the across-model vs the joint
within-model frequency, in exact integer arithmetic (ppm) so results
reproduce across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_words(text_col: str):
    # reference: replace('\n',' ').replace('\r',' ').lower() then .split()
    norm = F.lower(F.regexp_replace(F.col(text_col), r"[\n\r]", " "))
    return F.filter(F.split(norm, r"\s+"), lambda x: x != "")


def _suffix(s, n: int):
    # python s[-n:] (whole string when len < n). A plain negative-pos
    # substring differs between engines at short strings, so clamp.
    return s.substr(F.greatest(F.length(s) - (n - 1), F.lit(1)), F.lit(n))


def whitespace_lm(
    df: DataFrame, text_col: str = "text", nchar: int = 3, min_freq: int = 1
) -> DataFrame:
    """Train the context model: (across, h, w, freq).

    ``across`` = the context straddles a whitespace boundary. One wide
    operation (the groupBy); pair generation is flatten/transform inside
    whole-stage codegen. At 100 TB the model table is orders of magnitude
    smaller than the corpus (bounded by alphabet^(2·nchar) keys), so the
    aggregation map-side-combines down to almost nothing.
    """
    words = _norm_words(text_col)
    d = df.select(words.alias("_ws"))

    across = d.select(
        F.explode(
            F.when(
                F.size("_ws") >= 2,
                F.transform(
                    F.slice("_ws", 2, F.greatest(F.size("_ws") - 1, F.lit(0))),
                    lambda b, i: F.struct(
                        _suffix(F.element_at(F.col("_ws"), i + 1), nchar).alias("h"),
                        b.substr(1, nchar).alias("w"),
                    ),
                ),
            ).otherwise(F.lit(None))
        ).alias("hw")
    ).select(F.lit(True).alias("across"), "hw.h", "hw.w")

    # filter 1-char words BEFORE the nested transform: flatten() returns
    # NULL (not the concatenation) when any element is NULL, so a
    # when/otherwise(NULL) guard here would silently drop every within-
    # pair of any document containing a single-character word
    within = d.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.filter(F.col("_ws"), lambda w: F.length(w) >= 2),
                    lambda word: F.transform(
                        F.sequence(F.lit(1), F.length(word) - 1),
                        lambda i: F.struct(
                            _suffix(word.substr(F.lit(1), i), nchar).alias("h"),
                            word.substr(i + 1, F.lit(nchar)).alias("w"),
                        ),
                    ),
                )
            )
        ).alias("hw")
    ).select(F.lit(False).alias("across"), "hw.h", "hw.w")

    return (
        across.unionByName(within)
        .groupBy("across", "h", "w")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_freq)
    )


def p_separate(
    pairs: DataFrame,
    model: DataFrame,
    nchar: int = 3,
    w1_col: str = "w1",
    w2_col: str = "w2",
    exact: bool = True,
) -> DataFrame:
    """Score candidate word pairs with the trained model — the reference's
    ``prob_sep`` (M_train_whitespace_LM.py:70-75) in integer ppm:

        sep ∝ freq_across(h)·freq_across(·,w) / SUM2²
        tog ∝ freq_within(h,w) / SUM1
        p_separate = sep / (sep + tog)   (0 when sep = 0)

    Output adds ``p_separate_ppm`` and ``decision``. The reference's
    ``check_sep`` compares prob_sep's return [p, 0.01]: 'separate' iff
    p > 0.01, 'together' iff p < 0.01 (including p = 0), 'unknown' iff
    p = 0.01 exactly (:80). Same rule here at 10_000 ppm. Products are
    computed in decimal(38,0) — fh·fw·SUM1·10^6 overflows int64 at even
    modest corpora — and the floor division is exact, so the ppm value
    reproduces bit-for-bit in a HUGEINT-based SQL oracle. Model lookups
    are broadcast joins (the model is tiny relative to any corpus).

    Exactness has a capacity bound: the widest intermediate is
    max(sep)·10^6 = max_fh·max_fw·SUM1·10^6, and decimal(38,0) holds
    < 10^38 — roughly SUM1·SUM2² ≲ 10^32, comfortable for corpora up to
    ~10^9-10^10 documents but NOT for the 10^12 design point (sums ~10^13,
    context freqs ~10^11 → ~10^41). Overflow in non-ANSI mode would yield
    NULL ppm and a silent 'unknown', so the bound is CHECKED on the
    trained model's own maxima and violated ⇒ loud ValueError. For
    beyond-bound corpora pass ``exact=False``: the ratio is computed in
    double precision (sep and tog each ≲ 10^41 ≪ double's 10^308 range;
    the ppm floor may differ from the exact value only when p sits within
    ~2^-52 of a 1e-6 boundary) — decisions keep identical thresholds."""
    h = _suffix(F.lower(F.col(w1_col)), nchar)
    w = F.lower(F.col(w2_col)).substr(1, nchar)
    keyed = pairs.withColumn("_h", h).withColumn("_w", w)

    across = model.where("across")
    within = model.where(~F.col("across"))
    sums = model.agg(
        F.coalesce(F.sum(F.when(~F.col("across"), F.col("freq"))), F.lit(0)).alias("s1"),
        F.coalesce(F.sum(F.when(F.col("across"), F.col("freq"))), F.lit(0)).alias("s2"),
    ).collect()[0]
    sum1, sum2 = int(sums["s1"]), int(sums["s2"])
    h_freq = across.groupBy(F.col("h").alias("_h")).agg(F.sum("freq").alias("_fh"))
    w_freq = across.groupBy(F.col("w").alias("_w")).agg(F.sum("freq").alias("_fw"))
    hw_freq = within.select(
        F.col("h").alias("_h"), F.col("w").alias("_w"), F.col("freq").alias("_fhw")
    )
    scored = (
        keyed.join(F.broadcast(h_freq), "_h", "left")
        .join(F.broadcast(w_freq), "_w", "left")
        .join(F.broadcast(hw_freq), ["_h", "_w"], "left")
        .fillna(0, subset=["_fh", "_fw", "_fhw"])
    )
    # p = sep/(sep+tog) with sep = fh·fw·SUM1, tog = fhw·SUM2² (the common
    # positive denominator SUM2²·SUM1 cancels)
    if exact:
        # capacity guard (see docstring): the widest decimal(38,0)
        # intermediates are max_sep·10^6 and max_sep + max_tog; check them
        # against the trained model's own maxima so overflow fails loudly
        # here instead of silently NULLing ppm downstream
        def _mx(df: DataFrame, col: str) -> int:
            row = df.agg(F.max(col).alias("m")).collect()[0]
            return int(row["m"] or 0)

        max_sep = _mx(h_freq, "_fh") * _mx(w_freq, "_fw") * sum1
        max_tog = _mx(hw_freq, "_fhw") * sum2 * sum2
        if max(max_sep * 1_000_000, max_sep + max_tog) >= 10**38:
            raise ValueError(
                "p_separate(exact=True) would overflow decimal(38,0): "
                f"max_sep={max_sep:.3e}, max_tog={max_tog:.3e} (bound 1e38). "
                "Pass exact=False (double-precision scoring, identical "
                "decision thresholds) or raise min_freq when training."
            )
        dec = "decimal(38,0)"
        sep = (
            F.col("_fh").cast(dec) * F.col("_fw").cast(dec) * F.lit(sum1).cast(dec)
        )
        tog = F.col("_fhw").cast(dec) * F.lit(sum2).cast(dec) * F.lit(sum2).cast(dec)
        num = sep * F.lit(1_000_000).cast(dec)
        den = sep + tog
        ppm = F.when(sep > 0, ((num - num % den) / den).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    else:
        dbl = "double"
        sep = (
            F.col("_fh").cast(dbl) * F.col("_fw").cast(dbl) * F.lit(float(sum1))
        )
        tog = F.col("_fhw").cast(dbl) * F.lit(float(sum2) * float(sum2))
        ppm = F.when(
            sep > 0, F.floor(sep * F.lit(1_000_000.0) / (sep + tog)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return (
        scored.withColumn("p_separate_ppm", ppm)
        .withColumn(
            "decision",
            F.when(F.col("p_separate_ppm") > 10_000, F.lit("separate"))
            .when(F.col("p_separate_ppm") < 10_000, F.lit("together"))
            .otherwise(F.lit("unknown")),
        )
        .drop("_h", "_w", "_fh", "_fw", "_fhw")
    )
