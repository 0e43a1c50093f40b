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

import re
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

# the reference's configured garbage class (configs.json `regex_garbage`:
# \W) stripped before the block-filtered distance_3
GARBAGE_RE = re.compile(r"\W")
# publication-year plausibility (configs.json `regex_year`)
YEAR_RE = re.compile(r"1[5-9][0-9]{2}|20(0[0-9]|1[0-9]|2[0-3])")


def seq_distance(a: str, b: str) -> float:
    """1 - overlap/max(len) over the lowercased strings — the reference's
    `distance` (3_update_duplicateIDs.py:132-137)."""
    a, b = a.lower(), b.lower()
    if not a and not b:
        return 0.0
    m = SequenceMatcher(None, a, b)
    overlap = sum(bl.size for bl in m.get_matching_blocks())
    return 1.0 - overlap / max(len(a), len(b), 1)


def seq_distance_2(a: str, b: str) -> int:
    """Absolute (unnormalized) matching-block distance — the reference's
    `distance_2` (3_update_duplicateIDs.py:138-143):
    max(len) − Σ block sizes, over the lowercased strings."""
    a, b = a.lower(), b.lower()
    m = SequenceMatcher(None, a, b)
    overlap = sum(bl.size for bl in m.get_matching_blocks())
    return max(len(a), len(b)) - overlap


def seq_distance_3(a: str, b: str) -> int:
    """Garbage-stripped, ≥2-block distance — the reference's `distance_3`
    (3_update_duplicateIDs.py:145-150): strip the \\W garbage class from
    the lowercased strings, prefix '_' (so empty strings still anchor a
    leading block), count only matching blocks of size ≥ 2 (single-char
    coincidences carry no signal between attribute values), distance =
    min(len) − overlap. Negative-free is NOT guaranteed by the formula and
    not clamped — parity preserved."""
    a = "_" + GARBAGE_RE.sub("", a.lower())
    b = "_" + GARBAGE_RE.sub("", b.lower())
    m = SequenceMatcher(None, a, b)
    overlap = sum(bl.size for bl in m.get_matching_blocks() if bl.size >= 2)
    return min(len(a), len(b)) - overlap


def similar_enough(a, b, cost: float, threshold: float) -> bool:
    """The reference's attribute-value equivalence rule
    (3_update_duplicateIDs.py:194-200): two year-shaped strings are
    equivalent within ±1 year; other strings compare the assignment cost
    against min(len)·threshold; non-strings require equality."""
    if isinstance(a, str) and isinstance(b, str):
        if YEAR_RE.fullmatch(a) and YEAR_RE.fullmatch(b):
            return abs(int(a) - int(b)) <= 1
        return cost / min(len(a), len(b)) < threshold
    return a == b


def assign_pairs(
    left: list[str], right: list[str], metric: str = "distance"
) -> tuple[list[tuple[int, int]], list[float]]:
    """Optimal assignment between two attribute-value lists (`assign`,
    :186-191): (index mapping, per-pair costs). Hungarian when scipy
    exists, greedy otherwise (optimal for the ≤4-slot lists the reference
    processes). ``metric``: "distance" (normalized) or "distance_3" (the
    reference's assign metric)."""
    if not left or not right:
        return [], []
    dist = seq_distance_3 if metric == "distance_3" else seq_distance
    cost = np.array([[dist(x, y) for y in right] for x in left], dtype=float)
    if _HAVE_SCIPY:
        ri, ci = linear_sum_assignment(cost)
        mapping = list(zip(ri.tolist(), ci.tolist()))
    else:
        mapping, used = [], set()
        for i in range(min(len(left), len(right))):
            j = min(
                (j for j in range(len(right)) if j not in used),
                key=lambda j: cost[i][j],
            )
            used.add(j)
            mapping.append((i, j))
    return mapping, [float(cost[i, j]) for i, j in mapping]


def assign_cost(
    left: list[str], right: list[str], metric: str = "distance"
) -> float:
    """Mean optimal-assignment distance between two attribute-value lists."""
    if not left or not right:
        return 1.0
    _mapping, costs = assign_pairs(left, right, metric)
    return float(np.mean(costs))


def compare_value_lists(
    left: list[str], right: list[str], threshold: float
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """The reference's `compare_refstrings` core (:201-210): optimally
    assign the two value lists under distance_3 costs, then split the
    mapped pairs into matches / mismatches by ``similar_enough``."""
    mapping, costs = assign_pairs(left, right, metric="distance_3")
    matches, mismatches = [], []
    for (i, j), cost in zip(mapping, costs):
        if similar_enough(left[i], right[j], cost, threshold):
            matches.append((left[i], right[j]))
        else:
            mismatches.append((left[i], right[j]))
    return matches, mismatches


def record_equivalent(
    rec1: dict[str, list[str]],
    rec2: dict[str, list[str]],
    rules: "PairRules",
    title_key: str = "title",
) -> bool:
    """The reference's full pairwise rule classifier `is_equivalent`
    (3_update_duplicateIDs.py:238-263) over two attribute→values records
    (the output of reshape.pairfy/dictfy on a flattened record):

    1. per shared attribute, optimally assign values (distance_3 costs)
       and split into matches/mismatches via similar_enough(threshold),
    2. matchprec = weighted match mass / total mass, where a pair's weight
       is min(len(a), len(b)) except year pairs which weigh ``dateweight``,
    3. equivalent iff both titles exist, distance(title1, title2) <
       max_title_diff, matchprec ≥ thr_prec, and ≥ 2 attribute matches.
    """
    matches: list[tuple[str, str, str]] = []
    mismatches: list[tuple[str, str, str]] = []
    for key in set(rec1) & set(rec2):
        m, mm = compare_value_lists(rec1[key], rec2[key], rules.threshold)
        matches += [(key, a, b) for a, b in m]
        mismatches += [(key, a, b) for a, b in mm]

    def weight(key: str, a: str, b: str) -> float:
        if key.endswith("year"):
            return float(rules.dateweight)
        return float(min(len(a), len(b)))

    match_mass = sum(weight(*t) for t in matches)
    total_mass = match_mass + sum(weight(*t) for t in mismatches)
    matchprec = match_mass / total_mass if total_mass > 0 else 0.0

    t1 = rec1.get(title_key) or []
    t2 = rec2.get(title_key) or []
    title1 = t1[0] if t1 else None
    title2 = t2[0] if t2 else None
    if title1 and title2 and seq_distance(title1, title2) < rules.max_title_diff:
        return matchprec >= rules.thr_prec and len(matches) > 1
    return False


@dataclass
class PairRules:
    max_title_diff: float = 0.5  # reference configs.json:68
    year_tolerance: int = 1  # similar_enough, :194-199
    threshold: float = 0.25  # similar_enough cost ratio, configs.json:66
    thr_prec: float = 0.85  # matchprec floor, configs.json:73
    dateweight: int = 250  # year-pair weight in matchprec, configs.json:74


def verify_cluster_records(
    docs: DataFrame,
    rules: PairRules | None = None,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
    attr_cols: list[str] | None = None,
    title_col: str = "title",
) -> DataFrame:
    """All within-cluster pairs under the FULL reference rule classifier
    (``record_equivalent`` — matchprec + title gate + distance_3
    assignment): (cluster_id, id1, id2, is_equivalent).

    ``attr_cols``: columns forming the attribute→values record per row
    (array columns contribute their elements, scalars a single value;
    NULLs and empties dropped — the reference's not-in [None,'None','',' ']
    filter, 3_update_duplicateIDs.py:244-245). ``title_col`` must be one
    of them for the title gate. Grouped-map per cluster: groups are
    bounded by the 25000 guard upstream, so the per-group O(n²) Python is
    confined and Arrow-batched."""
    rules = rules or PairRules()
    attr_cols = attr_cols or [title_col]
    schema = f"{cluster_col} long, id1 long, id2 long, is_equivalent boolean"

    def to_record(row: dict) -> dict[str, list[str]]:
        rec: dict[str, list[str]] = {}
        for c in attr_cols:
            v = row.get(c)
            vals = v if isinstance(v, (list, tuple, np.ndarray)) else [v]
            clean = [
                str(x) for x in vals if x is not None and str(x) not in ("None", "", " ")
            ]
            if clean:
                rec[c] = clean
        return rec

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = pdf.sort_values(id_col).to_dict("records")
        rows = []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a, b = recs[i], recs[j]
                eq = record_equivalent(
                    to_record(a), to_record(b), rules, title_key=title_col
                )
                rows.append(
                    {
                        cluster_col: a[cluster_col],
                        "id1": a[id_col],
                        "id2": b[id_col],
                        "is_equivalent": bool(eq),
                    }
                )
        return pd.DataFrame(
            rows, columns=[cluster_col, "id1", "id2", "is_equivalent"]
        )

    return docs.groupBy(cluster_col).applyInPandas(per_cluster, schema=schema)


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
