"""Tests for reference-parity operators: containment join, min-el,
textnorm scalars, SymSpell correction, best-representative, pair verify."""

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.functions.spell import SymSpellIndex, edit_distance
from outcite_duplicate_detecting_spark.functions.textnorm import (
    asciifold,
    bundle,
    make_rep_id,
    paired_years,
    year_regex_ok,
)
from outcite_duplicate_detecting_spark.operators.bestrep import (
    best_representative,
    weighted_top_grams,
)
from outcite_duplicate_detecting_spark.operators.containment import (
    containment_pairs,
    minimal_elements,
)
from outcite_duplicate_detecting_spark.operators.pairverify import (
    PairRules,
    assign_cost,
    seq_distance,
    verify_cluster_pairs,
)

SETS = {
    1: ["a", "b"],
    2: ["a", "b", "c"],
    3: ["a", "b", "c", "d"],
    4: ["x"],
    5: ["x", "y"],
    6: ["a", "b"],  # duplicate of 1
}


def brute_containment(sets):
    out = set()
    for i, j in itertools.permutations(sets, 2):
        si, sj = set(sets[i]), set(sets[j])
        if si < sj or (si == sj and i < j):
            out.add((i, j))
    return out


def test_containment_pairs(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in SETS.items()], "id long, features array<string>"
    )
    got = {(r["sub_id"], r["sup_id"]) for r in containment_pairs(df).collect()}
    assert got == brute_containment(SETS)


def test_minimal_elements(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in SETS.items()], "id long, features array<string>"
    )
    pairs = containment_pairs(df)
    minels = {r["id"] for r in minimal_elements(pairs).collect()}
    # subs: 1,2,4,6(1<->6 equal: 1 is sub of 6? equal sets pair once (1,6));
    # minimal = appear as sub, never as strict sup of another sub
    # sub ids: 1 (of 2,3,6), 2 (of 3), 4 (of 5), 6? 6 is sup in (1,6)
    assert 1 in minels and 4 in minels
    assert 3 not in minels and 5 not in minels


def test_asciifold(spark):
    df = spark.createDataFrame(
        [("Müller-Lüdenscheidt çà œuvre ß",), ("plain ascii",)], "s string"
    )
    rows = [r[0] for r in df.select(asciifold("s")).collect()]
    assert rows[0] == "Muller-Ludenscheidt ca oeuvre ss"
    assert rows[1] == "plain ascii"


def test_paired_years(spark):
    df = spark.createDataFrame([(1999,), (2024,), (None,), (99999,)], "y int")
    y1, y2 = paired_years("y")
    rows = df.select(y1.alias("y1"), y2.alias("y2")).collect()
    assert (rows[0]["y1"], rows[0]["y2"]) == (19981999, 19992000)
    assert (rows[1]["y1"], rows[1]["y2"]) == (20232024, 20242025)
    assert rows[2]["y1"] is None and rows[3]["y1"] is None


def test_bundle_and_rep_id_permutation_invariant(spark):
    df = spark.createDataFrame(
        [("b", "a", None), (None, "b", "a")], "c1 string, c2 string, c3 string"
    )
    b = bundle(["c1", "c2", "c3"])
    rows = df.select(b.alias("b"), make_rep_id([b]).alias("rid")).collect()
    assert rows[0]["b"] == rows[1]["b"] == ["a", "b", None]
    assert rows[0]["rid"] == rows[1]["rid"]
    want = hashlib.sha1("a#+*b#+*None".encode()).hexdigest()
    assert rows[0]["rid"] == want


def test_year_regex(spark):
    df = spark.createDataFrame([("1987",), ("2023",), ("2024",), ("1499",)], "y string")
    rows = [r[0] for r in df.select(year_regex_ok("y")).collect()]
    assert rows == [True, True, False, False]


def test_symspell_correction():
    idx = SymSpellIndex({"table": 100, "tables": 50, "cable": 10}, max_edits=2)
    assert idx.correct("table") == "table"
    assert idx.correct("tabl") == "table"  # 1 edit, within cap min(2, .2*4→1)
    # the reference cap min(4, 0.2*len) = 1 for 5-char tokens: a distance-2
    # transposition stays uncorrected
    assert idx.correct("tabel") == "tabel"
    assert idx.correct("xyzzy") == "xyzzy"  # nothing within cap
    idx2 = SymSpellIndex({"elephanttrunk": 5}, max_edits=2)
    assert idx2.correct("elephantrunk") == "elephanttrunk"  # len 12 → cap 2
    assert edit_distance("kitten", "sitting", 5) == 3


def test_correct_tokens_udf(spark):
    from outcite_duplicate_detecting_spark.functions.spell import correct_tokens_udf

    idx = SymSpellIndex({"spark": 10, "query": 5}, max_edits=2)
    df = spark.createDataFrame([(["sparc", "query", "zz"],)], "toks array<string>")
    out = df.select(correct_tokens_udf(idx)(F.col("toks")).alias("c")).collect()[0]["c"]
    assert out == ["spark", "query", "zz"]


def test_weighted_top_grams_and_best_representative(spark):
    vals = spark.createDataFrame(
        [
            (1, "the query engine", 3),
            (1, "the query enginx", 1),
            (1, "unrelated words!", 1),
        ],
        "cluster_id long, value string, w long",
    )
    top = weighted_top_grams(vals, value_col="value", weight_col="w", min_share_ppm=20_000)
    best = best_representative(vals, top, value_col="value").collect()[0]
    assert best["best_value"] == "the query engine"


def test_verify_cluster_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, 10, "the quick brown fox jumps", 1999),
            (1, 11, "the quick brown fox jumped", 2000),
            (1, 12, "completely different words here", 1980),
        ],
        "cluster_id long, doc_id long, text string, year int",
    )
    rows = {
        (r["id1"], r["id2"]): r
        for r in verify_cluster_pairs(docs, PairRules(), year_col="year").collect()
    }
    assert len(rows) == 3
    assert rows[(10, 11)]["is_equivalent"]
    assert not rows[(10, 12)]["is_equivalent"]


def test_assign_cost():
    assert assign_cost(["smith", "jones"], ["jones", "smith"]) == 0.0
    assert assign_cost([], ["x"]) == 1.0
    assert 0 < seq_distance("abc", "abd") < 1


def test_distance_formulas_reference_parity():
    """Hand parity with the reference's distance/distance_2/distance_3
    (3_update_duplicateIDs.py:132-150): recompute each formula literally
    and compare on hand pairs, including garbage and case."""
    import re
    from difflib import SequenceMatcher as SM

    from outcite_duplicate_detecting_spark.operators.pairverify import (
        seq_distance_2,
        seq_distance_3,
    )

    GARBAGE = re.compile(r"\W")

    def ref_distance(a, b):
        a, b = a.lower(), b.lower()
        s = SM(None, a, b)
        overlap = sum(bl.size for bl in s.get_matching_blocks())
        return 1 - (overlap / max([len(a), len(b)]))

    def ref_distance_2(a, b):
        a, b = a.lower(), b.lower()
        s = SM(None, a, b)
        overlap = sum(bl.size for bl in s.get_matching_blocks())
        return max([len(a), len(b)]) - overlap

    def ref_distance_3(a, b):
        a = "_" + re.sub(GARBAGE, "", a.lower())
        b = "_" + re.sub(GARBAGE, "", b.lower())
        s = SM(None, a, b)
        overlap = sum(bl.size for bl in s.get_matching_blocks() if bl.size >= 2)
        return min([len(a), len(b)]) - overlap

    pairs = [
        ("Smith, J.", "smith j"),
        ("The Quick Brown Fox", "the quick brown fox!"),
        ("a-b-c", "abc"),
        ("Wittgenstein", "Winterstein"),
        ("x", "y"),
        ("", "abc"),
        ("Jahrbuch für Wirtschaftsgeschichte", "jahrbuch fur wg"),
    ]
    for a, b in pairs:
        assert seq_distance(a, b) == ref_distance(a, b), (a, b)
        assert seq_distance_2(a, b) == ref_distance_2(a, b), (a, b)
        assert seq_distance_3(a, b) == ref_distance_3(a, b), (a, b)


def test_similar_enough_and_record_equivalent():
    """similar_enough (:194-199) + the full is_equivalent matchprec rule
    (:238-263) on hand records."""
    from outcite_duplicate_detecting_spark.operators.pairverify import (
        record_equivalent,
        similar_enough,
    )

    # year pairs: ±1 accepted regardless of cost
    assert similar_enough("1999", "2000", 99.0, 0.25)
    assert not similar_enough("1999", "2002", 0.0, 0.25)
    # string pairs: cost / min(len) < threshold
    assert similar_enough("duplicate detection", "duplicate detection", 0.0, 0.25)
    assert not similar_enough("abcd", "wxyz", 4.0, 0.25)
    # non-strings: equality
    assert similar_enough(3, 3, 1.0, 0.25) and not similar_enough(3, 4, 0.0, 0.25)

    rules = PairRules()
    a = {
        "title": ["near duplicate detection at scale"],
        "year": ["1999"],
        "a1sur": ["smith"],
    }
    b_close = {
        "title": ["near duplicate detection at scale!"],
        "year": ["2000"],
        "a1sur": ["smith j"],
    }
    b_far = {
        "title": ["entirely unrelated treatise"],
        "year": ["1950"],
        "a1sur": ["jones"],
    }
    assert record_equivalent(a, b_close, rules)
    assert not record_equivalent(a, b_far, rules)
    # title gate: high matchprec alone is not enough without close titles
    b_titleless = {"year": ["1999"], "a1sur": ["smith"]}
    assert not record_equivalent(a, b_titleless, rules)


def test_verify_cluster_records(spark):
    """Grouped-map wrapper over the full rule classifier: equivalences
    match record_equivalent recomputed per pair on the driver."""
    from outcite_duplicate_detecting_spark.operators.pairverify import (
        record_equivalent,
        verify_cluster_records,
    )

    rows = [
        (1, 10, "near duplicate detection at scale", "1999", ["smith", "jones"]),
        (1, 11, "near duplicate detection at scale!", "2000", ["smith j", "jones"]),
        (1, 12, "entirely unrelated treatise", "1950", ["brown"]),
        (2, 20, "alpha beta gamma", None, ["lee"]),
        (2, 21, "alpha beta gamma", "2001", ["lee"]),
    ]
    docs = spark.createDataFrame(
        rows, "cluster_id long, doc_id long, title string, year string, authors array<string>"
    )
    attr_cols = ["title", "year", "authors"]
    got = {
        (r["id1"], r["id2"]): r["is_equivalent"]
        for r in verify_cluster_records(docs, attr_cols=attr_cols).collect()
    }
    # recompute expectations straight from record_equivalent
    from outcite_duplicate_detecting_spark.operators.pairverify import PairRules

    recs = {
        did: {
            k: v
            for k, v in {
                "title": [t], "year": [y] if y else [], "authors": list(a)
            }.items()
            if v
        }
        for (_c, did, t, y, a) in rows
    }
    import itertools

    for c in (1, 2):
        members = sorted(d for (cl, d, *_r) in rows if cl == c)
        for a, b in itertools.combinations(members, 2):
            assert got[(a, b)] == record_equivalent(recs[a], recs[b], PairRules()), (a, b)
    assert got[(10, 11)] is True and got[(10, 12)] is False
