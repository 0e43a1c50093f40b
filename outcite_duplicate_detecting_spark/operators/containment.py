"""Set-containment (poset) join and minimal-element reduction.

The reference's poset blocking method (/root/reference/code/blocking/code/
find_components_disk.py): a representation A is *under* B when A's feature
set is a subset of B's (find_subsup :94-113, rarest-first posting-list
intersection). Its outputs: (subset, superset) edges, the minimal elements
(subsets that are nobody's strict superset — update_results :162-174,
get_min_el_map :186-202), and connected components over the bipartite
minel↔superset graph.

Spark mapping (SURVEY.md §2.3): explode features to a postings table and
count matching features per candidate pair — A ⊆ B iff
|features(A) ∩ features(B)| = |features(A)|. The reference's optimizations
map to relational form:
- rarest-first intersection → the join naturally intersects through the
  postings index; selectivity ordering is the optimizer's job,
- size-stratified task grid (:125-135, 176-184) → the pruning predicate
  size(A) ≤ size(B) (strict subsets: <, plus id tie-break on equal sets),
- frequency cap on ubiquitous features → the same bucket-cap machinery as
  every candidate join here (drop accounting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def containment_pairs(
    df: DataFrame,
    id_col: str = "id",
    features_col: str = "features",
    strict: bool = True,
) -> DataFrame:
    """(sub_id, sup_id): feature set of sub ⊆ feature set of sup.

    ``strict``: equal sets are reported once with sub_id < sup_id and
    proper subsets always as (smaller-set id, larger-set id); a row never
    pairs with itself.
    """
    sized = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.col(features_col)).alias("fs"),
    ).withColumn("sz", F.size("fs"))
    ex = sized.select("id", "sz", F.explode("fs").alias("feat"))
    a = ex.select(F.col("feat"), F.col("id").alias("sub_id"), F.col("sz").alias("sub_sz"))
    b = ex.select(F.col("feat"), F.col("id").alias("sup_id"), F.col("sz").alias("sup_sz"))
    # size-stratified pruning predicate (reference task grid analogue)
    joined = a.join(b, "feat").where(
        (F.col("sub_id") != F.col("sup_id"))
        & (
            (F.col("sub_sz") < F.col("sup_sz"))
            | ((F.col("sub_sz") == F.col("sup_sz")) & (F.col("sub_id") < F.col("sup_id")))
        )
    )
    counts = joined.groupBy("sub_id", "sup_id", "sub_sz").agg(
        F.count("*").alias("shared")
    )
    out = counts.where(F.col("shared") == F.col("sub_sz")).select("sub_id", "sup_id")
    return out


def minimal_elements(pairs: DataFrame) -> DataFrame:
    """Minimal elements of the containment order: ids that appear as a
    subset but never as a strict superset of some other subset — the
    reference's min-el set (find_components_disk.py:162-174)."""
    subs = pairs.select(F.col("sub_id").alias("id")).distinct()
    sups = pairs.select(F.col("sup_id").alias("id")).distinct()
    return subs.join(sups, "id", "left_anti")


def minel_superset_edges(pairs: DataFrame) -> DataFrame:
    """(src, dst) edges minimal-element → superset, the graph whose
    connected components the reference labels (':270-276')."""
    minels = minimal_elements(pairs)
    return (
        pairs.join(minels.withColumnRenamed("id", "sub_id"), "sub_id")
        .select(F.col("sub_id").alias("src"), F.col("sup_id").alias("dst"))
    )
