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
    """Per-cluster per-field mode with NULLs excluded; ties by value order
    (values carried as strings in the long format).

    Reference majority_vote treats NULL as wildcard support
    (4_index_duplicates.py:122-133) — ``majority_vote_wildcard`` implements
    that coupled-tuple rule; this is the decoupled per-field mode. One melt
    (stack) + one groupBy + one pivot — a single shuffle chain instead of
    one join per field."""
    stack_args = ", ".join(f"'{f}', cast({f} as string)" for f in fields)
    melted = docs.select(
        F.col(cluster_col),
        F.expr(f"stack({len(fields)}, {stack_args}) as (field, value)"),
    ).where(F.col("value").isNotNull())
    winners = (
        melted.groupBy(cluster_col, "field", "value")
        .agg(F.count("*").alias("_n"))
        .groupBy(cluster_col, "field")
        .agg(F.max_by(F.col("value"), F.struct(F.col("_n"), F.col("value"))).alias("_win"))
    )
    pivoted = (
        winners.groupBy(cluster_col).pivot("field", fields).agg(F.first("_win"))
    )
    all_clusters = docs.select(cluster_col).distinct()
    return all_clusters.join(pivoted, cluster_col, "left")


def majority_vote_wildcard(
    docs: DataFrame,
    cluster_col: str,
    fields: list[str],
) -> DataFrame:
    """Reference ``majority_vote`` semantics (4_index_duplicates.py:122-133):
    the winning per-cluster field *tuple* under NULL-as-wildcard support.

    A tuple with NULLs adds its frequency to every tuple it is compatible
    with (NULL in the supporter matches anything); the winner is the tuple
    with maximal summed support. The reference breaks support ties by dict
    insertion order (scan-order-dependent); here ties break deterministically
    by (fewest NULLs, field values ascending NULLs-last) so results are
    stable across partitionings — the only divergence, documented.

    Relational plan (no UDF): tuple-frequency table → within-cluster
    compatibility self-join → support sum → one max_by. The join is over
    *distinct tuples* per cluster (small — duplicate groups are capped),
    not over rows.
    """
    vals = docs.groupBy(cluster_col, *fields).agg(F.count("*").alias("_freq"))
    sup = vals.select(
        F.col(cluster_col).alias("_c"),
        *[F.col(f).alias(f"_s_{f}") for f in fields],
        F.col("_freq").alias("_sfreq"),
    )
    cand = vals.select(
        F.col(cluster_col).alias("_c"),
        *[F.col(f).alias(f"_k_{f}") for f in fields],
    )
    compat = [
        (F.col(f"_s_{f}").isNull()) | (F.col(f"_s_{f}") == F.col(f"_k_{f}"))
        for f in fields
    ]
    cond = compat[0]
    for c in compat[1:]:
        cond = cond & c
    support = (
        cand.join(sup, on="_c")
        .where(cond)
        .groupBy("_c", *[f"_k_{f}" for f in fields])
        .agg(F.sum("_sfreq").alias("_support"))
    )
    n_nulls = sum(
        [F.when(F.col(f"_k_{f}").isNull(), 1).otherwise(0) for f in fields],
        F.lit(0),
    )
    # min_by over (-support, n_nulls, per-field (isnull, value)) realizes
    # "support desc, fewest NULLs, values asc NULLs-last" in one ordering key
    order = F.struct(
        (-F.col("_support")).alias("s"),
        n_nulls.alias("nn"),
        *[
            F.struct(
                F.col(f"_k_{f}").isNull().alias("isnull"),
                F.col(f"_k_{f}").alias("v"),
            ).alias(f"o_{f}")
            for f in fields
        ],
    )
    winner = support.groupBy("_c").agg(
        *[
            F.min_by(F.col(f"_k_{f}"), order).alias(f)
            for f in fields
        ],
        F.max("_support").alias("support"),
    )
    return winner.select(F.col("_c").alias(cluster_col), *fields, "support")


def positional_name_vote(
    docs: DataFrame,
    cluster_col: str,
    names_col: str = "authors",
    parts: tuple[str, ...] = ("surname", "initials", "firstnames"),
    max_list: int = 3,
) -> DataFrame:
    """Reference ``majority_name`` (4_index_duplicates.py:136-163): per
    author *slot*, vote over positional name-part tuples with
    case-insensitive, NULL-tolerant-on-both-sides matching.

    ``names_col``: array<struct<surname string, initials array<string>,
    firstnames array<string>>>. Output: one row per (cluster, slot) with
    the winning parts. Grouped-map pandas UDF — the vote couples fields and
    compares case-insensitively both ways, which has no join form; groups
    are duplicate clusters (small, capped upstream).
    Tie-break: deterministic (support desc, tuple asc NULLs-last) — the
    reference uses dict order.
    """
    from collections import Counter

    part_fields = [f"{p}_{i}" for p in parts for i in range(max_list)]
    schema = (
        f"{cluster_col} long, slot int, "
        + ", ".join(f"{f} string" for f in part_fields)
        + ", support long"
    )

    def vote(pdf: pd.DataFrame) -> pd.DataFrame:
        cluster = pdf[cluster_col].iloc[0]
        out_rows = []
        max_slots = max((len(x) if x is not None else 0) for x in pdf[names_col])
        for slot in range(max_slots):
            tuples: list[tuple] = []
            for lst in pdf[names_col]:
                if lst is None or len(lst) <= slot:
                    continue
                name = lst[slot]
                vals = []
                for p in parts:
                    v = name[p] if p in name else None
                    if isinstance(v, str):
                        v = [v]
                    for i in range(max_list):
                        vals.append(
                            v[i] if v is not None and len(v) > i else None
                        )
                tuples.append(tuple(vals))
            if not tuples:
                continue
            freq = Counter(tuples)
            supp: Counter = Counter()
            for key in freq:
                for key_ in freq:
                    ok = all(
                        k is None or k_ is None or k.lower() == k_.lower()
                        for k, k_ in zip(key, key_)
                    )
                    if ok:
                        supp[key_] += freq[key]
            best = min(
                supp,
                key=lambda t: (
                    -supp[t],
                    tuple((v is None, v or "") for v in t),
                ),
            )
            out_rows.append((cluster, slot, *best, supp[best]))
        cols = [cluster_col, "slot", *part_fields, "support"]
        return pd.DataFrame(out_rows, columns=cols)

    return docs.groupBy(cluster_col).applyInPandas(vote, schema=schema)


def best_value_priority(
    docs: DataFrame,
    cluster_col: str,
    collection_col: str,
    value_col: str,
    priority: list[str],
) -> DataFrame:
    """Reference ``best_url`` (4_index_duplicates.py:178-185): per cluster,
    take the first collection in ``priority`` that has any non-null value;
    within it the most frequent value wins (ties → value ascending; the
    reference's list.count max is first-seen order).

    Pure aggregation: value frequencies → per-collection mode → priority
    rank → min_by. Output (cluster, collection, value)."""
    prio = F.create_map(
        *[x for i, c in enumerate(priority) for x in (F.lit(c), F.lit(i))]
    )
    counts = (
        docs.where(F.col(value_col).isNotNull() & F.col(collection_col).isin(priority))
        .groupBy(cluster_col, collection_col, value_col)
        .agg(F.count("*").alias("_n"))
    )
    mode_per_coll = counts.groupBy(cluster_col, collection_col).agg(
        F.min_by(
            F.col(value_col), F.struct((-F.col("_n")).alias("n"), F.col(value_col).alias("v"))
        ).alias("best_value")
    )
    ranked = mode_per_coll.withColumn("_rank", prio[F.col(collection_col)])
    return ranked.groupBy(cluster_col).agg(
        F.min_by(F.col(collection_col), F.col("_rank")).alias("collection"),
        F.min_by(F.col("best_value"), F.col("_rank")).alias("best_value"),
    )


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
