"""External gold-standard sources.

- ``gold_jsonl_labels``: the CORE deduplication ground-truth JSONL
  (/root/reference/code/blocking/code/core_goldstandard.py:83-99): one JSON
  object per line with ``core_id`` and a ``labelled_duplicates`` id list;
  edges core_id↔duplicate_id, connected components → gold label per id.
- ``component_size_histogram``: the reference's follow-up histogram
  (:106-109) as one aggregation.
- ``load_frequency_dictionary``: SymSpell frequency files — whitespace
  ``term count`` lines (/root/reference/code/B2_process_features.py:61-64,
  data under resources/word_frequencies/) → driver dict for the broadcast
  spell index (functions/spell.SymSpellIndex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import connected_components


def gold_jsonl_labels(spark: SparkSession, path: str) -> DataFrame:
    """(core_id, gold_id): transitive closure of the labelled-duplicate
    relation; gold_id = min core_id of the component."""
    raw = spark.read.json(path)
    base = raw.select(
        F.col("core_id").cast("long").alias("core_id"),
        F.col("labelled_duplicates").alias("dups"),
    )
    edges = base.select(
        F.col("core_id").alias("src"),
        F.explode_outer("dups").alias("dst_raw"),
    ).select("src", F.col("dst_raw").cast("long").alias("dst"))
    labels = connected_components(
        edges.where(F.col("dst").isNotNull()),
        src="src",
        dst="dst",
        nodes=base.select(F.col("core_id").alias("id")),
    )
    return labels.select(F.col("id").alias("core_id"), F.col("component").alias("gold_id"))


def component_size_histogram(labels: DataFrame, label_col: str = "gold_id") -> DataFrame:
    """(component_size, n_components) — core_goldstandard.py:106-109."""
    return (
        labels.groupBy(label_col)
        .agg(F.count("*").alias("component_size"))
        .groupBy("component_size")
        .agg(F.count("*").cast("long").alias("n_components"))
        .select(F.col("component_size").cast("long"), "n_components")
    )


def load_frequency_dictionary(
    spark: SparkSession, path: str, term_index: int = 0, count_index: int = 1
) -> dict[str, int]:
    """Driver-side dict from a SymSpell-style frequency file (term count
    per line, whitespace-separated). Small by construction (a language
    lexicon) — intended for broadcast into the spell-correction UDF."""
    rows = (
        spark.read.text(path)
        .select(F.split(F.col("value"), r"\s+").alias("p"))
        .where(F.size("p") > max(term_index, count_index))
        .select(
            F.col("p").getItem(term_index).alias("term"),
            # try_cast: malformed counts → NULL row, not an ANSI error
            F.col("p").getItem(count_index).try_cast("long").alias("count"),
        )
        .where(F.col("count").isNotNull())
        .collect()
    )
    return {r["term"]: int(r["count"]) for r in rows}
