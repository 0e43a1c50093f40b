"""Per-cluster canonical record merging.

Reference stage 4 (/root/reference/code/4_index_duplicates.py:71-246):
majority vote per field with NULL-as-wildcard (majority_vote, :122-133),
weighted top-terms + best-representative selection (:71-99), priority URL
choice (best_url, :178-185). Spark mapping (SURVEY.md §2.4): groupBy
aggregations where the semantics are per-column, ``applyInPandas`` where
the reference's vote couples columns.

Here: canonical member per cluster via pure aggregations (scale path), and
a grouped-map canonicalizer for coupled row-level votes (duplicate groups
are small by construction — bounded by the pair-generation caps)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_members(
    assignments: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One row per cluster: canonical member = longest text, ties by min id
    (the reference picks the best-supported representative; for web pages
    the longest extracted text is the standard keep rule). Pure aggregation:
    max_by is a single partial/final agg, no window, no shuffle beyond the
    groupBy."""
    joined = assignments.join(docs, id_col)
    return joined.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_size"),
        F.max_by(
            F.col(id_col), F.struct(F.length("text").alias("l"), (-F.col(id_col)).alias("i"))
        ).alias("canonical_id"),
        F.min(id_col).alias("min_id"),
    )


def majority_vote_fields(
    docs: DataFrame,
    cluster_col: str,
    fields: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-cluster per-field mode with NULLs excluded; ties by value order.

    Reference majority_vote treats NULL as wildcard support
    (4_index_duplicates.py:122-133); the wildcard rule only changes outcomes
    when a NULL-carrying tuple would outvote all concrete tuples — per-field
    mode with NULL exclusion is the decoupled-field equivalent."""
    out = docs.select(cluster_col).distinct()
    for f in fields:
        counts = (
            docs.where(F.col(f).isNotNull())
            .groupBy(cluster_col, f)
            .agg(F.count("*").alias("_n"))
            .groupBy(cluster_col)
            .agg(F.max_by(F.col(f), F.struct(F.col("_n"), F.col(f))).alias(f))
        )
        out = out.join(counts, cluster_col, "left")
    return out


def merge_clusters_grouped(
    docs: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Grouped-map canonicalizer: per cluster emit one merged record with
    member ids — the applyInPandas analogue of the reference's per-group
    merge loop (4_index_duplicates.py:188-246)."""
    schema = f"{cluster_col} long, canonical_id long, n_members long, member_ids array<long>, {text_col} string"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(_len=pdf[text_col].str.len())
        # longest text wins; ties broken by smallest id
        best = pdf.sort_values(["_len", id_col], ascending=[False, True]).iloc[0]
        return pd.DataFrame(
            {
                cluster_col: [pdf[cluster_col].iloc[0]],
                "canonical_id": [best[id_col]],
                "n_members": [len(pdf)],
                "member_ids": [sorted(pdf[id_col].tolist())],
                text_col: [best[text_col]],
            }
        )

    return docs.groupBy(cluster_col).applyInPandas(merge, schema=schema)
