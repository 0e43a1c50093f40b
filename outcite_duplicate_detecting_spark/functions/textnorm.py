"""Reference-parity scalar normalization functions (SURVEY.md §2.8).

- ``asciifold``: Latin-1/MS-charset → ASCII transliteration as one
  F.translate + regexp cleanup chain (the reference ships a 206-line
  per-row translation table, /root/reference/code/M_asciidammit.py:1-206;
  this is the JVM-side equivalent built from the standard Latin-1
  transliteration, not a copy of that file).
- ``paired_years``: the year1/year2 encoding year1=concat(y-1,y),
  year2=concat(y,y+1) with the plausibility guard
  (/root/reference/code/B2_process_features.py:202-203,46).
- ``bundle``: sort values within a column-equivalence group, NULLs last —
  set→sequence canonicalization (make_representations_v3.py:38-45).
- ``make_rep_id``: SHA-1 of the '#+*'-joined bundled values — reproduces
  the reference's repID bytes exactly for equal inputs
  (make_representations_v3.py:47-49).
- ``year_regex_ok``: the reference's publication-year plausibility regex
  (3_update_duplicateIDs.py:44).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝŠŽšž"
_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUYSZsz"


def asciifold(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(c, _SRC, _DST)
    folded = F.regexp_replace(folded, "ß", "ss")
    folded = F.regexp_replace(folded, "[æÆ]", "ae")
    folded = F.regexp_replace(folded, "[œŒ]", "oe")
    folded = F.regexp_replace(folded, "[øØ]", "o")
    folded = F.regexp_replace(folded, "[ðÐþÞ]", "d")
    return F.regexp_replace(folded, "[^\\x00-\\x7F]", "")


def paired_years(col: Column | str, max_year: int = 2026) -> tuple[Column, Column]:
    y = (F.col(col) if isinstance(col, str) else col).cast("int")
    valid = y.isNotNull() & (y > 0) & (y <= max_year + 1)
    y1 = F.when(valid, F.concat((y - 1).cast("string"), y.cast("string")).cast("long"))
    y2 = F.when(valid, F.concat(y.cast("string"), (y + 1).cast("string")).cast("long"))
    return y1, y2


def bundle(cols: list[Column | str]) -> Column:
    """Values of an equivalence group sorted ascending, NULLs last
    (array<string>) — order-canonicalized so author-slot permutations
    produce identical representations."""
    arr = F.array(*[(F.col(c) if isinstance(c, str) else c).cast("string") for c in cols])
    non_null = F.array_sort(F.filter(arr, lambda x: x.isNotNull()))
    nulls = F.filter(arr, lambda x: x.isNull())
    return F.concat(non_null, nulls)


def make_rep_id(bundled_groups: list[Column]) -> Column:
    """SHA-1 over the '#+*'-joined concatenation of all bundled values —
    byte-parity with the reference repID for equal canonical inputs."""
    flat = F.flatten(F.array(*bundled_groups))
    joined = F.array_join(flat, "#+*", null_replacement="None")
    return F.sha1(joined)


YEAR_REGEX = r"1[5-9]\d{2}|20(0\d|1\d|2[0-3])"


def year_regex_ok(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").rlike(f"^({YEAR_REGEX})$")


def clean_int(col: Column | str, lower: int, upper: int) -> Column:
    """Integer-range clean (reference ``clean_int``,
    4_index_duplicates.py:102-119): non-integer → NULL, outside
    [lower, upper] → NULL, zero → NULL (the reference's truthiness check)."""
    c = F.col(col) if isinstance(col, str) else col
    v = c.cast("string").try_cast("long")
    return F.when(v.isNotNull() & (v != 0) & v.between(lower, upper), v)


def clean_int_span(
    start: Column | str, end: Column | str, lower: int = 1, upper: int = 10000
) -> tuple[Column, Column]:
    """The cross-field start/end rule (4_index_duplicates.py:193-194):
    start is cleaned against [lower, end] and end against [start, upper];
    a missing counterpart falls back to the absolute bound — so start > end
    spans NULL out, matching the reference's dependent clean_int calls."""
    s_raw = clean_int(start, lower, upper)
    e_raw = clean_int(end, lower, upper)
    s = F.when(e_raw.isNull() | (s_raw <= e_raw), s_raw)
    e = F.when(s_raw.isNull() | (e_raw >= s_raw), e_raw)
    return s, e
