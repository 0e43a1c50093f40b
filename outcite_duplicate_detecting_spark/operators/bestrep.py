"""Weighted top-terms and best-representative selection (reference stage 4).

Reference semantics (/root/reference/code/4_index_duplicates.py):
- ``get_topterms`` (:71-76): char-3-gram frequencies across a group's
  values, each occurrence weighted by its source weight; keep grams whose
  weighted share exceeds a threshold.
- ``best_representative`` (:79-99): the candidate value whose 3-gram set
  has maximal Jaccard with the top-terms set.

Spark mapping (SURVEY.md §2.4 'weighted top-terms' / 'best
representative'): explode 3-grams → weighted groupBy — all relational; the
final per-group argmax is one max_by. Used to pick the canonical title-ish
field per duplicate cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams


def weighted_top_grams(
    values: DataFrame,
    group_col: str = "cluster_id",
    value_col: str = "value",
    weight_col: str | None = None,
    n: int = 3,
    min_share_ppm: int = 100_000,
) -> DataFrame:
    """(group, gram) grams whose weighted share within the group exceeds
    min_share_ppm (integer ppm arithmetic, engine-stable)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    ex = values.select(
        F.col(group_col).alias("grp"),
        F.explode(char_ngrams(value_col, n)).alias("gram"),
        w.cast("long").alias("w"),
    )
    gram_w = ex.groupBy("grp", "gram").agg(F.sum("w").alias("gw"))
    tot = gram_w.groupBy("grp").agg(F.sum("gw").alias("tot"))
    return (
        gram_w.join(tot, "grp")
        .where(F.col("gw") * 1_000_000 >= F.col("tot") * min_share_ppm)
        .select(F.col("grp").alias(group_col), "gram")
    )


def best_representative(
    values: DataFrame,
    top_grams: DataFrame,
    group_col: str = "cluster_id",
    value_col: str = "value",
    n: int = 3,
) -> DataFrame:
    """Per group: the value whose gram set maximizes Jaccard vs the group's
    top-gram set; ties by value ascending. Output (group, best_value,
    inter_size, value_gram_size)."""
    top_sized = top_grams.groupBy(group_col).agg(
        F.count("*").alias("top_sz"), F.collect_set("gram").alias("top_set")
    )
    cand = values.select(
        F.col(group_col), F.col(value_col).alias("value"), char_ngrams(value_col, n).alias("grams")
    ).dropDuplicates([group_col, "value"])
    joined = cand.join(top_sized, group_col)
    inter = F.size(F.array_intersect("grams", "top_set"))
    scored = joined.select(
        group_col,
        "value",
        inter.alias("inter_size"),
        F.size("grams").alias("gsz"),
        F.col("top_sz"),
    ).withColumn(
        # jaccard as exact ratio via cross-multiplied ordering key: compare
        # inter/(gsz+top-inter) by max_by on (inter * 1e6) // union
        "jacc_ppm",
        F.when(
            (F.col("gsz") + F.col("top_sz") - F.col("inter_size")) > 0,
            (F.col("inter_size") * 1_000_000
             - F.pmod(F.col("inter_size") * 1_000_000,
                      F.col("gsz") + F.col("top_sz") - F.col("inter_size")))
            / (F.col("gsz") + F.col("top_sz") - F.col("inter_size")),
        ).otherwise(F.lit(0)).cast("long"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("jacc_ppm"), F.asc("value"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            group_col,
            F.col("value").alias("best_value"),
            F.col("inter_size").cast("long"),
            F.col("gsz").cast("long").alias("value_gram_size"),
        )
    )
