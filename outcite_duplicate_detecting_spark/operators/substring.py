"""Exact-substring duplicate detector via winnowing fingerprints.

The north_rule's third detector: find pairs where one page's extracted text
is wholly contained in another's (boilerplate wrapping). The reference's
closest machinery is its suffix-structure-free exact blocking; the
distributed design here replaces a global suffix array with **winnowing**
(Schleimer, Wilkerson & Aiken, SIGMOD'03 — the MOSS fingerprinting scheme):

1. per doc, rolling k-gram hashes over the UTF-8 bytes, windowed minima
   (window w, rightmost tie-break) → a sparse fingerprint set, ~2/(w+1)
   density — computed in one Arrow-batched pandas UDF, no shuffle;
2. candidates = distinct doc pairs sharing ≥1 fingerprint (inverted-index
   self-join, cap-able/salt-able like every band join here);
3. verification = actual substring containment check on the candidate
   pair's texts (C-level ``in``, Arrow-batched).

Exactness: the winnowing guarantee says any shared byte run of length
≥ t = w + k − 1 produces a shared selected fingerprint. With
min_len chars ≥ t (and UTF-8 bytes ≥ chars), every true containment pair
is a candidate, and verification makes the output exactly
{(inner, outer) : inner.text ⊆ outer.text, len(inner) ≥ min_len, inner ≠ outer}.

Suffix-array note: a per-partition suffix array (mapInArrow over
concatenated partition text) was considered; winnowing wins at scale
because it needs no cross-partition boundary handling — fingerprints are a
per-row map-side computation and the only shuffle is the candidate join.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import to_i64, winnow
from .joins import band_candidate_pairs


@dataclass
class SubstringConfig:
    min_len: int = 50  # chars; containment pairs below this are out of scope
    k: int = 25  # gram length (bytes)
    w: int = 26  # winnow window ⇒ guarantee threshold t = w + k - 1 = 50
    # cap on docs sharing a fingerprint — same default as the reference's
    # 25000-doc group guard (code/common.py:96) and the other detectors;
    # a ubiquitous boilerplate fingerprint must never go quadratic silently
    max_fingerprint_df: int | None = 25000
    salt: int | None = None

    @property
    def guarantee_t(self) -> int:
        return self.w + self.k - 1


def fingerprint_udf(cfg: SubstringConfig):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [to_i64(winnow(t if t is not None else "", cfg.k, cfg.w)).tolist() for t in texts]
        )

    return fp


def add_fingerprints(
    df: DataFrame, cfg: SubstringConfig, text_col: str = "text", out_col: str = "fingerprints"
) -> DataFrame:
    return df.withColumn(out_col, fingerprint_udf(cfg)(F.col(text_col)))


def substring_pairs(
    df: DataFrame,
    cfg: SubstringConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(containment_pairs, dropped_fingerprints).

    containment_pairs: (inner_id, outer_id) where inner.text is a substring
    of outer.text, length(inner.text) ≥ min_len (chars), inner_id ≠ outer_id.
    Equal texts yield both directions (they are each other's substring) —
    callers that collapse exact duplicates first never see that case.
    """
    cfg = cfg or SubstringConfig()
    assert cfg.min_len >= cfg.guarantee_t, "winnowing guarantee requires min_len >= w+k-1"
    # eager materialization: texts feed fingerprinting AND both verify sides.
    # NULL text → '' so verification's `x in y` never sees None (the
    # fingerprint UDF already maps None → '').
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(text_col), F.lit("")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    # eager checkpoint: the band join consumes the postings up to 4× (bucket
    # sizes, the cap anti-join, both self-join sides). Uncheckpointed, each
    # consumer re-runs the winnowing UDF over the corpus — measured as the
    # single hottest plan in the pipeline (fingerprint subtree ~8× in one
    # stage write). Postings are (id, long) — tiny relative to the texts.
    fps = (
        add_fingerprints(base, cfg)
        .select("id", F.explode("fingerprints").alias("fp"))
        .localCheckpoint(eager=True)
    )
    cands = band_candidate_pairs(
        fps, key_cols=["fp"], id_col="id",
        max_bucket_size=cfg.max_fingerprint_df, salt=cfg.salt,
    )
    return containment_verify(cands.pairs, base, cfg.min_len), cands.drops


def containment_verify(
    pairs: DataFrame, base: DataFrame, min_len: int
) -> DataFrame:
    """Containment verification of candidate pairs.

    ``pairs``: (id1, id2); ``base``: (id, text) with non-null text. Output
    (inner_id, outer_id) distinct, inner.text ⊆ outer.text and
    length(inner) ≥ min_len. Single pass: the contain UDF runs once per
    candidate and both directions are emitted from one evaluation (a
    where/union pair would re-run the candidate join and the UDF per
    branch). The text table is pruned to candidate participants first —
    candidates are sparse, the id list broadcasts, and non-candidate texts
    stay out of both verify-join shuffles (the verify_jaccard pattern)."""
    cand_ids = (
        pairs.select(F.col("id1").alias("id"))
        .unionByName(pairs.select(F.col("id2").alias("id")))
        .distinct()
    )
    base = base.join(cand_ids, "id", "left_semi")
    t1 = base.select(F.col("id").alias("id1"), F.col("text").alias("t1"))
    t2 = base.select(F.col("id").alias("id2"), F.col("text").alias("t2"))
    paired = pairs.join(t1, "id1").join(t2, "id2")

    @F.pandas_udf(T.IntegerType())
    def contain(a: pd.Series, b: pd.Series) -> pd.Series:
        # 0: none, 1: a in b, 2: b in a, 3: equal/both
        out = [
            (1 if (x in y) else 0) | (2 if (y in x) else 0)
            for x, y in zip(a, b)
        ]
        return pd.Series(out, dtype="int32")

    flagged = paired.withColumn("c", contain(F.col("t1"), F.col("t2")))
    directed = flagged.select(
        F.explode(
            F.array(
                F.when(
                    (F.col("c").bitwiseAND(F.lit(1)) > 0)
                    & (F.length("t1") >= min_len),
                    F.struct(
                        F.col("id1").alias("inner_id"), F.col("id2").alias("outer_id")
                    ),
                ),
                F.when(
                    (F.col("c").bitwiseAND(F.lit(2)) > 0)
                    & (F.length("t2") >= min_len),
                    F.struct(
                        F.col("id2").alias("inner_id"), F.col("id1").alias("outer_id")
                    ),
                ),
            )
        ).alias("p")
    )
    return (
        directed.where(F.col("p").isNotNull())
        .select("p.inner_id", "p.outer_id")
        .distinct()
    )
