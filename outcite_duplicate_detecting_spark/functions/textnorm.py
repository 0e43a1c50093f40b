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

# Plain-text approximations of the cp1252/Latin-1 range 0x80–0xFF — the
# same mapping the reference's bundled public-domain "ASCII, Dammit"
# module applies per row (/root/reference/code/M_asciidammit.py:29-157,
# first tuple element = plain approximation). Re-typed from the published
# Latin-1 tables, not copied; the MS block 0x80–0x9F transliterates
# (smart quotes → '/", dashes → -/--, ellipsis → ...) instead of being
# stripped, so char-grams over Word-sourced text keep their punctuation
# signal.
_MS_PLAIN: dict[int, str] = {
    0x80: "EUR", 0x81: " ", 0x82: ",", 0x83: "f", 0x84: ",,", 0x85: "...",
    0x86: "+", 0x87: "++", 0x88: "^", 0x89: "%", 0x8A: "S", 0x8B: "<",
    0x8C: "OE", 0x8D: "?", 0x8E: "Z", 0x8F: "?", 0x90: "?", 0x91: "'",
    0x92: "'", 0x93: '"', 0x94: '"', 0x95: "*", 0x96: "-", 0x97: "--",
    0x98: "~", 0x99: "(TM)", 0x9A: "s", 0x9B: ">", 0x9C: "oe", 0x9D: "?",
    0x9E: "z", 0x9F: "Y",
    0xA0: " ", 0xA1: "!", 0xA2: "c", 0xA3: "GBP", 0xA4: "$", 0xA5: "YEN",
    0xA6: "|", 0xA7: "S", 0xA8: "..", 0xA9: "", 0xAA: "(th)", 0xAB: "<<",
    0xAC: "!", 0xAD: " ", 0xAE: "(R)", 0xAF: "-", 0xB0: "o", 0xB1: "+-",
    0xB2: "2", 0xB3: "3", 0xB4: "'", 0xB5: "u", 0xB6: "P", 0xB7: "*",
    0xB8: ",", 0xB9: "1", 0xBA: "(th)", 0xBB: ">>", 0xBC: "1/4",
    0xBD: "1/2", 0xBE: "3/4", 0xBF: "?",
    0xC6: "AE", 0xC7: "C", 0xD0: "D", 0xD1: "N", 0xD7: "*", 0xD8: "O",
    0xDD: "Y", 0xDE: "b", 0xDF: "ss",
    0xE6: "ae", 0xE7: "c", 0xF0: "o", 0xF1: "n", 0xF7: "/", 0xF8: "o",
    0xFD: "y", 0xFE: "b", 0xFF: "y",
}
for _r, _out in [
    ((0xC0, 0xC5), "A"), ((0xC8, 0xCB), "E"), ((0xCC, 0xCF), "I"),
    ((0xD2, 0xD6), "O"), ((0xD9, 0xDC), "U"),
    ((0xE0, 0xE5), "a"), ((0xE8, 0xEB), "e"), ((0xEC, 0xEF), "i"),
    ((0xF2, 0xF6), "o"), ((0xF9, 0xFC), "u"),
]:
    for _cp in range(_r[0], _r[1] + 1):
        _MS_PLAIN[_cp] = _out

# cp1252 0x80–0x9F bytes decode to these Unicode codepoints in modern
# pipelines — map them to the same plain approximations so a correctly
# decoded smart quote and a latin-1-misdecoded one normalize identically
_CP1252_UNICODE: dict[int, int] = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}

ASCII_DAMMIT_TABLE: dict[str, str] = {chr(cp): out for cp, out in _MS_PLAIN.items()}
ASCII_DAMMIT_TABLE.update(
    {chr(uni): _MS_PLAIN[cp] for cp, uni in _CP1252_UNICODE.items()}
)
# lowercase š/ž of the MS block's Š/Ž exist only as Unicode; cover them too
ASCII_DAMMIT_TABLE.setdefault("Š", "S")
ASCII_DAMMIT_TABLE.setdefault("š", "s")
ASCII_DAMMIT_TABLE.setdefault("Ž", "Z")
ASCII_DAMMIT_TABLE.setdefault("ž", "z")


def py_ascii_dammit(s: str | None) -> str:
    """Python twin of ``asciifold`` (for UDFs and tests): table-mapped
    transliteration, any other non-ASCII stripped."""
    if s is None:
        return ""
    return "".join(
        ASCII_DAMMIT_TABLE.get(ch, ch if ord(ch) < 128 else "") for ch in s
    )


def asciifold(col: Column | str) -> Column:
    """Full ASCII-Dammit plain-text transliteration as a Catalyst chain:
    one ``translate`` for all 1:1 mappings, ``replace`` per multi-char
    mapping, then a final strip of any remaining non-ASCII."""
    c = F.col(col) if isinstance(col, str) else col
    singles = {ch: out for ch, out in ASCII_DAMMIT_TABLE.items() if len(out) == 1}
    multis = {ch: out for ch, out in ASCII_DAMMIT_TABLE.items() if len(out) != 1}
    folded = F.translate(c, "".join(singles), "".join(singles.values()))
    for ch, out in sorted(multis.items()):
        folded = F.replace(folded, F.lit(ch), F.lit(out))
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


# the reference's subtitle divider (configs.json `feat_subtitdiv`,
# B2_process_features.py:76): sentence/subtitle boundaries '. ', ': ',
# ' -- ', '? '
SUBTITLE_DIV_REGEX = r"\. |: | -+ |\? "


def subtitle_split(col: Column | str) -> Column:
    """Split text at subtitle dividers (B2_process_features.py:160)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, SUBTITLE_DIV_REGEX)


def stopword_split_pattern(stopwords: list[str]) -> str:
    """The reference's STOPWORDS section splitter (B2:77):
    '&', '.', ',' or any whole stopword."""
    import re as _re

    return r"&|\.|\," + "".join(
        "|\\b" + _re.escape(s) + "\\b" for s in stopwords
    )


def text_sections(col: Column | str, stopwords: list[str]) -> Column:
    """Two-stage section split feeding the title-term features
    (B2_process_features.py:160-161): subtitle-divider split, then each
    piece split again at '&'/'.'/','/stopwords — array<string> of
    sections, order preserved, faithful to the reference's nested
    ``SUBTITDIV.split`` → ``STOPWORDS.split`` composition."""
    pat = stopword_split_pattern(stopwords)
    outer = subtitle_split(col)
    return F.flatten(F.transform(outer, lambda s: F.split(s, pat)))


def py_text_sections(text: str | None, stopwords: list[str]) -> list[str]:
    """Python twin of ``text_sections``."""
    import re as _re

    if text is None:
        return [""]
    pat = _re.compile(stopword_split_pattern(stopwords))
    return [
        sec
        for piece in _re.split(SUBTITLE_DIV_REGEX, text)
        for sec in pat.split(piece)
    ]


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
