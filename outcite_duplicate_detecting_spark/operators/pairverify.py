"""Grouped-map pairwise verification (reference stage 3 semantics).

The reference's rule-based classifier runs all O(n²) pairs inside each
cluster (/root/reference/code/3_update_duplicateIDs.py:104-116) with
SequenceMatcher-style distances (:132-150), year tolerance ±1 (:194-199)
and optimal attribute-value assignment via the Hungarian algorithm
(:186-191, scipy linear_sum_assignment). Spark mapping (SURVEY.md §2.3
'within-group cartesian' / §2.11): ``applyInPandas`` per cluster — groups
are bounded by the 25000 guard upstream, so per-group O(n²) Python is
confined and Arrow-batched.

scipy isn't guaranteed in the runtime; the assignment falls back to a
greedy matching (optimal for the ≤4-slot author lists the reference
processes — reference maps at 3_update_duplicateIDs.py:78-90).
"""

from __future__ import annotations

from dataclasses import dataclass
from difflib import SequenceMatcher

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - environment dependent
    from scipy.optimize import linear_sum_assignment  # type: ignore

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


def seq_distance(a: str, b: str) -> float:
    """1 - overlap/max(len) — the reference's `distance` (:132-137)."""
    if not a and not b:
        return 0.0
    m = SequenceMatcher(None, a, b)
    overlap = sum(bl.size for bl in m.get_matching_blocks())
    return 1.0 - overlap / max(len(a), len(b), 1)


def assign_cost(left: list[str], right: list[str]) -> float:
    """Mean optimal-assignment distance between two attribute-value lists
    (`assign`, :186-191). Hungarian when scipy exists, greedy otherwise."""
    if not left or not right:
        return 1.0
    cost = np.array([[seq_distance(x, y) for y in right] for x in left])
    if _HAVE_SCIPY:
        ri, ci = linear_sum_assignment(cost)
        return float(cost[ri, ci].mean())
    total, used = 0.0, set()
    for i in range(min(len(left), len(right))):
        j = min(
            (j for j in range(len(right)) if j not in used),
            key=lambda j: cost[i][j],
        )
        used.add(j)
        total += cost[i][j]
    return total / min(len(left), len(right))


@dataclass
class PairRules:
    max_title_diff: float = 0.5  # reference configs.json:68
    year_tolerance: int = 1  # similar_enough, :194-199


def verify_cluster_pairs(
    docs: DataFrame,
    rules: PairRules | None = None,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
    title_col: str = "text",
    year_col: str | None = None,
) -> DataFrame:
    """All within-cluster pairs with the rule decision:
    (cluster_id, id1, id2, title_diff_ppm, is_equivalent)."""
    rules = rules or PairRules()
    year_name = year_col

    schema = (
        f"{cluster_col} long, id1 long, id2 long, "
        "title_diff_ppm long, is_equivalent boolean"
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        recs = pdf.sort_values(id_col).to_dict("records")
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a, b = recs[i], recs[j]
                d = seq_distance(str(a[title_col] or ""), str(b[title_col] or ""))
                ok = d <= rules.max_title_diff
                if ok and year_name:
                    ya, yb = a.get(year_name), b.get(year_name)
                    if ya is not None and yb is not None:
                        ok = abs(int(ya) - int(yb)) <= rules.year_tolerance
                rows.append(
                    {
                        cluster_col: a[cluster_col],
                        "id1": a[id_col],
                        "id2": b[id_col],
                        "title_diff_ppm": int(d * 1_000_000),
                        "is_equivalent": bool(ok),
                    }
                )
        return pd.DataFrame(
            rows,
            columns=[cluster_col, "id1", "id2", "title_diff_ppm", "is_equivalent"],
        )

    return docs.groupBy(cluster_col).applyInPandas(per_cluster, schema=schema)
