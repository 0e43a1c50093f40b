"""Pairwise precision/recall/F1 with sum-of-squares pair counting.

Re-implements the reference's evaluation semantics
(/root/reference/code/common.py:73-89 and the SQL twin
/root/reference/code/blocking/code/pipeline/8_evaluate_components_v2.sh:37-52):

    T  = Σ_g |gold group g|²          (true-pair mass, self-pairs included)
    P  = Σ_l |label group l|²         (predicted-pair mass)
    TP = Σ_{g,l} |gold g ∩ label l|²  (agreeing mass)
    precision = TP/P, recall = TP/T, F1 = harmonic mean

Counting squares instead of C(n,2) pairs matches the reference exactly
(the constant diagonal shifts both numerator and denominator the same way).
One DataFrame job: two groupBy aggregations and one join — no per-group
Python, no driver-side pair materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_pr(
    assignments: DataFrame,
    id_col: str = "id",
    gold_col: str = "gold",
    label_col: str = "label",
    min_gold_size: int = 1,
    max_gold_size: int | None = None,
    max_label_size: int | None = None,
) -> DataFrame:
    """Single-row DataFrame: (t_mass, p_mass, tp_mass, precision_ppm,
    recall_ppm, f1_ppm). Size filters mirror the reference's evaluation
    grid slices (8a_evaluate_all.sh:14-31)."""
    base = assignments.select(id_col, gold_col, label_col)

    gold_sizes = base.groupBy(gold_col).agg(F.count("*").alias("gsz"))
    if max_gold_size is not None:
        gold_sizes = gold_sizes.where(F.col("gsz") <= max_gold_size)
    gold_sizes = gold_sizes.where(F.col("gsz") >= min_gold_size)

    label_sizes = base.groupBy(label_col).agg(F.count("*").alias("lsz"))
    if max_label_size is not None:
        label_sizes = label_sizes.where(F.col("lsz") <= max_label_size)

    kept = base.join(gold_sizes, gold_col).join(label_sizes, label_col)

    t = kept.select(gold_col).groupBy(gold_col).count().agg(
        F.coalesce(F.sum(F.col("count") * F.col("count")), F.lit(0)).alias("t_mass")
    )
    p = kept.select(label_col).groupBy(label_col).count().agg(
        F.coalesce(F.sum(F.col("count") * F.col("count")), F.lit(0)).alias("p_mass")
    )
    tp = (
        kept.groupBy(gold_col, label_col)
        .count()
        .agg(F.coalesce(F.sum(F.col("count") * F.col("count")), F.lit(0)).alias("tp_mass"))
    )

    def ppm(num, den):
        a = (num * 1000000).cast("long")
        return F.when(den > 0, (a - F.pmod(a, den)) / den).otherwise(F.lit(0)).cast("long")

    joined = t.crossJoin(p).crossJoin(tp)
    return joined.select(
        F.col("t_mass").cast("long"),
        F.col("p_mass").cast("long"),
        F.col("tp_mass").cast("long"),
        ppm(F.col("tp_mass"), F.col("p_mass")).alias("precision_ppm"),
        ppm(F.col("tp_mass"), F.col("t_mass")).alias("recall_ppm"),
        ppm(2 * F.col("tp_mass"), F.col("p_mass") + F.col("t_mass")).alias("f1_ppm"),
    )
