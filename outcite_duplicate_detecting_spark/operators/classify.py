"""Pairwise similarity scoring and verification.

Reference stages 2-3: per-feature-type similarity kernels combined with a
frozen logistic model (weights/bias trained offline —
/root/reference/code/2_update_clusterIDs.py:89-107,
/root/reference/code/M_train_classifier.py:38-61), then a rule-based
pairwise classifier inside each cluster
(/root/reference/code/3_update_duplicateIDs.py:104-116, 238-264).

Spark mapping (SURVEY.md §2.8 / §2.11):
- similarity kernels (jaccard / dice / overlap / cosine from intersection
  counts, reference code/common.py:280-312) = pure column arithmetic,
- the logistic combination = one column expression (no UDF),
- the within-cluster pairwise classifier = self-join on cluster id with
  id1 < id2 (groups are capped; reference guard common.py:96), or
  ``applyInPandas`` when the decision needs difflib-style sequence logic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sim_kernels(inter: Column, s1: Column, s2: Column) -> dict[str, Column]:
    """The reference's four kernels from sparse intersection counts
    (code/common.py:280-312), as exact column expressions."""
    return {
        "jaccard": inter / (s1 + s2 - inter),
        "dice": (inter * 2) / (s1 + s2),
        "overlap": inter / F.least(s1, s2),
        "cosine": inter / F.sqrt((s1 * s2).cast("double")),
    }


@dataclass
class LogisticPairScorer:
    """sigmoid(Σ w_k · sim_k + bias) — reference stage-2 combination
    (code/2_update_clusterIDs.py:89-101; production uses a single jaccard
    feature at threshold ≈ 0.1 with trained weight/bias)."""

    weights: dict[str, float] = field(default_factory=lambda: {"jaccard": 12.0})
    bias: float = -5.5588  # reference bias constant, 2_update_clusterIDs.py:101
    threshold: float = 0.5

    def score(self, sims: dict[str, Column]) -> Column:
        z = F.lit(self.bias)
        for name, w in self.weights.items():
            z = z + F.lit(w) * sims[name]
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def decide(self, sims: dict[str, Column]) -> Column:
        return self.score(sims) > self.threshold


def score_pairs(
    pairs: DataFrame,
    scorer: LogisticPairScorer | None = None,
    inter_col: str = "inter_size",
    union_col: str = "union_size",
    s1_col: str | None = None,
    s2_col: str | None = None,
) -> DataFrame:
    """Score verified pairs carrying (inter_size, union_size): adds
    score_ppm (long, floor(score·1e6)) and is_equivalent.

    jaccard/dice derive from (inter, union) alone; overlap/cosine need the
    per-side set sizes — pass ``s1_col``/``s2_col`` (or have ``sz1``/``sz2``
    columns present) to enable them. A scorer weighting an unavailable
    kernel raises ValueError up front instead of a KeyError mid-plan."""
    scorer = scorer or LogisticPairScorer()
    inter = F.col(inter_col).cast("double")
    union = F.col(union_col).cast("double")
    s1_plus_s2 = union + inter
    sims = {
        "jaccard": inter / union,
        "dice": (inter * 2) / s1_plus_s2,
    }
    cols = set(pairs.columns)
    s1_col = s1_col or ("sz1" if "sz1" in cols else None)
    s2_col = s2_col or ("sz2" if "sz2" in cols else None)
    if s1_col and s2_col:
        s1 = F.col(s1_col).cast("double")
        s2 = F.col(s2_col).cast("double")
        sims["overlap"] = inter / F.least(s1, s2)
        sims["cosine"] = inter / F.sqrt(s1 * s2)
    missing = set(scorer.weights) - set(sims)
    if missing:
        raise ValueError(
            f"scorer weights {sorted(missing)} need per-side set sizes: "
            f"pass s1_col/s2_col (available kernels: {sorted(sims)})"
        )
    available = {k: v for k, v in sims.items() if k in scorer.weights}
    score = scorer.score(available)
    return pairs.withColumns(
        {
            "score_ppm": F.floor(score * 1000000).cast("long"),
            "is_equivalent": score > scorer.threshold,
        }
    )


def ff_smoothing_pairs(
    postings: DataFrame,
    id_col: str = "id",
    feat_col: str = "feat",
    ff_threshold: float | None = 0.5,
) -> DataFrame:
    """Feature-feature probability smoothing (reference ``getFF`` +
    ``probability``, /root/reference/code/common.py:311-326; the PROB /
    PROB_thr similarity modes — OFF in reference production,
    2_update_clusterIDs.py:110; provided for mode parity).

    With M the boolean doc×feature matrix, x=per-doc feature counts,
    f=per-feature doc counts: FF[g,h] = Σ_d M[d,g]·M[d,h] / (x[d]·f[h]);
    with a threshold, FF rows are normalized by their diagonal and entries
    below the threshold dropped. The smoothed doc-pair score is
    S[a,b] = Σ_{g,h} (M[a,g]/f[g]) · FF[g,h] · (M[b,h]/x[b]).

    All of it is three join-aggregations over the exploded postings table
    (the CSR dot products in relational form); FF is only materialized for
    co-occurring feature pairs. Output: (id1, id2, score) for id1 != id2.
    Intended for per-block use like the reference (features per block are
    bounded); the FF join is quadratic in features-per-doc.
    """
    p = postings.select(
        F.col(id_col).alias("id"), F.col(feat_col).alias("feat")
    ).distinct()
    x = p.groupBy("id").agg(F.count("*").alias("x"))
    fv = p.groupBy("feat").agg(F.count("*").alias("f"))

    a = p.select(F.col("id"), F.col("feat").alias("g"))
    b = p.select(F.col("id"), F.col("feat").alias("h"))
    ff = (
        a.join(b, "id")
        .join(x, "id")
        .join(fv.select(F.col("feat").alias("h"), F.col("f").alias("f_h")), "h")
        .groupBy("g", "h")
        .agg(F.sum(F.lit(1.0) / (F.col("x") * F.col("f_h"))).alias("ff"))
    )
    if ff_threshold is not None:
        diag = ff.where(F.col("g") == F.col("h")).select(
            F.col("g"), F.col("ff").alias("ff_gg")
        )
        ff = (
            ff.join(diag, "g")
            .withColumn("ff", F.col("ff") / F.col("ff_gg"))
            .where(F.col("ff") >= ff_threshold)
            .drop("ff_gg")
        )
    left = (
        p.select(F.col("id").alias("id1"), F.col("feat").alias("g"))
        .join(fv.select(F.col("feat").alias("g"), "f"), "g")
        .select("id1", "g", (F.lit(1.0) / F.col("f")).alias("xf"))
    )
    right = (
        p.select(F.col("id").alias("id2"), F.col("feat").alias("h"))
        .join(x.select(F.col("id").alias("id2"), "x"), "id2")
        .select("id2", "h", (F.lit(1.0) / F.col("x")).alias("fx"))
    )
    return (
        left.join(ff, "g")
        .join(right, "h")
        .where(F.col("id1") != F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("xf") * F.col("ff") * F.col("fx")).alias("score"))
    )


def within_cluster_pairs(
    assignments: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """All ordered member pairs per cluster — the reference's O(n²)
    pairwise_classifier iteration space (3_update_duplicateIDs.py:104-116)
    as a self-join; AQE splits skewed clusters."""
    a = assignments.select(cluster_col, F.col(id_col).alias("id1"))
    b = assignments.select(cluster_col, F.col(id_col).alias("id2"))
    return a.join(b, cluster_col).where(F.col("id1") < F.col("id2"))
