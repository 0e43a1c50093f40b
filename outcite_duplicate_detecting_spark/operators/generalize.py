"""Generalization-lattice expansion + surrogate-key specification.

Reference blocking pre-passes:

- ``generalize_representations.py`` (:101-115, rule grammar :49-58): each
  representation row carries feature columns grouped by ftype; a rule maps
  the row's per-ftype non-NULL count signature (lhs) to one or more target
  signatures (rhs = how many of each ftype to KEEP). For every rhs the row
  fans out to every combination of keeping exactly rhs[i] of its lhs[i]
  populated columns per ftype (dropped → NULL), validity-checked against
  restriction lists (``is_valid`` :74-83 / ``is_ok`` :40-45: at least one
  ftype of every restriction must survive).
- ``specify_mentions.py`` (:15-23): a row where ALL columns of some
  restriction list are NULL (and no earlier restriction matched) gets its
  own id written into the restriction's first column — forcing it into a
  singleton block instead of colliding with every other underspecified row.

Spark mapping (SURVEY.md §2.9): the specification is a chain of ``F.when``
column expressions (zero shuffle); the lattice fan-out is a ``mapInPandas``
generator — combinations are data-dependent per row, which no fixed-arity
explode expresses, but the fan-out itself stays map-side (the production
OUTCITE scheme is ``only_matchID`` with tiny fan-out, OUTCITE.sh:14).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations, product
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GeneralizationScheme:
    """groups: ftype → its columns (order fixes the signature positions).
    rules: lhs signature (non-NULL count per ftype) → list of rhs
    signatures (columns to keep per ftype). restrictions: lists of columns
    where every generalization must keep ≥1 non-NULL entry overall."""

    groups: dict[str, list[str]] = field(default_factory=dict)
    rules: dict[tuple[int, ...], list[tuple[int, ...]]] = field(default_factory=dict)
    restrictions: list[list[str]] = field(default_factory=list)

    @property
    def ftypes(self) -> list[str]:
        return list(self.groups)

    @property
    def columns(self) -> list[str]:
        return [c for cols in self.groups.values() for c in cols]


def parse_rule_line(line: str) -> tuple[tuple, list[tuple], list[str]]:
    """Parse one line of the reference rule grammar
    ('2 initial 0 first ... --> 1 initial 0 first ... | ...',
    generalize_representations.py:49-58). Returns (lhs_counts, rhs_counts
    list, ftype order)."""
    lhs_s, rhs_s = line.rstrip().split(" --> ")
    toks = lhs_s.split()
    lhs = tuple(int(toks[i]) for i in range(0, len(toks), 2))
    ftypes = [toks[i + 1] for i in range(0, len(toks), 2)]
    rhss = []
    for rhs in rhs_s.split(" | "):
        rtoks = rhs.split()
        rhss.append(tuple(int(rtoks[i]) for i in range(0, len(rtoks), 2)))
    return lhs, rhss, ftypes


def generalize_expand(
    df: DataFrame,
    scheme: GeneralizationScheme,
    id_col: str = "id",
) -> DataFrame:
    """All rule-licensed generalizations of every row
    (reference ``generalize``, generalize_representations.py:101-115).

    Output: one row per (input row, generalization) with the input's
    ``id_col`` and the scheme columns, dropped entries NULLed. Rows whose
    signature has no rule emit nothing (the reference warns 'illegal lhs').
    Map-side only — the fan-out happens inside mapInPandas partitions.
    """
    ftypes = scheme.ftypes
    groups = [scheme.groups[t] for t in ftypes]
    cols = scheme.columns
    restrictions = [list(r) for r in scheme.restrictions]
    rules = dict(scheme.rules)
    out_schema = df.select(id_col, *cols).schema

    def _has(rec: dict, c: str) -> bool:
        v = rec.get(c)
        # pandas surfaces numeric NULLs as NaN (NaN != NaN), not None
        return v is not None and v == v

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for rec in pdf.to_dict("records"):
                present = [[c for c in g if _has(rec, c)] for g in groups]
                lhs = tuple(len(p) for p in present)
                for rhs in rules.get(lhs, []):
                    # every way of keeping rhs[i] of the lhs[i] populated
                    # columns per ftype (reference `pick`/product)
                    keep_choices = [
                        list(combinations(present[i], rhs[i]))
                        for i in range(len(ftypes))
                    ]
                    for keeps in product(*keep_choices):
                        kept = {c for ch in keeps for c in ch}
                        if restrictions and not all(
                            any(c in kept and _has(rec, c) for c in r)
                            for r in restrictions
                        ):
                            continue
                        out_rows.append(
                            {
                                id_col: rec[id_col],
                                **{
                                    c: (rec.get(c) if c in kept else None)
                                    for c in cols
                                },
                            }
                        )
            yield pd.DataFrame(out_rows, columns=[id_col, *cols])

    return df.select(id_col, *cols).mapInPandas(expand, schema=out_schema)


def specify_surrogates(
    df: DataFrame,
    restrictions: list[list[str]],
    id_col: str = "id",
) -> DataFrame:
    """Surrogate-key specification (reference specify_mentions.py:15-23).

    For the FIRST restriction list whose columns are all NULL in a row,
    write the row's own id (as string) into that restriction's first
    column — underspecified rows become singletons instead of one giant
    block. Pure ``F.when`` chains, zero shuffle.

    The NULL flags are evaluated against the ORIGINAL columns before any
    update (the reference materializes them into a temp table first,
    specify_mentions.py:15) — updates to a shared column never re-trigger
    or suppress a later restriction."""
    flags = [
        F.coalesce(*[F.col(c) for c in r]).isNull()
        if len(r) > 1
        else F.col(r[0]).isNull()
        for r in restrictions
    ]
    staged = df.withColumns({f"__tmp{i}": fl for i, fl in enumerate(flags)})
    out = staged
    for i, r in enumerate(restrictions):
        cond = F.col(f"__tmp{i}")
        for j in range(i):
            cond = cond & ~F.col(f"__tmp{j}")
        target = r[0]
        out = out.withColumn(
            target,
            F.when(cond, F.col(id_col).cast("string")).otherwise(F.col(target)),
        )
    return out.drop(*[f"__tmp{i}" for i in range(len(restrictions))])
