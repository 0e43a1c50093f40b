"""Gold-standard silver labels from shared external target IDs.

Reference B3 (/root/reference/code/B3_add_goldID.py:38-74): every row
carries a linkID plus optional external-record IDs (sowiport/crossref/dnb/
…); edges linkID→targetID over the bipartite link graph, scipy connected
components, and the component label becomes ``goldID``. Two references
matched to the same external record transitively share a goldID — the
silver ground truth the evaluation harness consumes (SURVEY.md §5).

Spark mapping: melt the target-ID columns to edges, hash string IDs to
longs (xxhash64, namespaced per column so 'crossref:X' never collides with
'dnb:X'), reuse the large-star/small-star connected components, and emit
``(link_id, gold_id)``; gold_id = min node hash of the component —
deterministic across partitionings and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components


def gold_link_edges(
    df: DataFrame, link_col: str, target_cols: list[str]
) -> DataFrame:
    """(src, dst) long edges of the bipartite link graph. String IDs are
    hashed with a per-column namespace prefix; the link node itself is
    namespaced 'link:'."""
    link = F.xxhash64(F.concat(F.lit("link:"), F.col(link_col).cast("string")))
    targets = F.array(
        *[
            F.when(
                F.col(c).isNotNull(),
                F.xxhash64(F.concat(F.lit(f"{c}:"), F.col(c).cast("string"))),
            )
            for c in target_cols
        ]
    )
    return (
        df.where(F.col(link_col).isNotNull())
        .select(link.alias("src"), F.explode(targets).alias("dst"))
        .where(F.col("dst").isNotNull())
    )


def gold_labels(
    df: DataFrame, link_col: str, target_cols: list[str]
) -> DataFrame:
    """(link id column, gold_id): transitive closure of shared-target links.

    Rows with no target ID get their own singleton gold_id (their hashed
    link node)."""
    edges = gold_link_edges(df, link_col, target_cols)
    link_nodes = df.where(F.col(link_col).isNotNull()).select(
        F.col(link_col),
        F.xxhash64(
            F.concat(F.lit("link:"), F.col(link_col).cast("string"))
        ).alias("id"),
    ).distinct()
    labels = connected_components(edges, src="src", dst="dst", nodes=link_nodes.select("id"))
    return link_nodes.join(labels, "id").select(
        link_col, F.col("component").alias("gold_id")
    )
