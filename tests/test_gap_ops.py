"""Gold JSONL source, frequency-dictionary source, clean_int, single-feature
blocking, melt/collect (flatten-pairfy-dictfy) and FF smoothing — each vs a
hand-computed or numpy brute-force oracle of the reference semantics."""

import json

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.functions.textnorm import clean_int, clean_int_span
from outcite_duplicate_detecting_spark.operators.classify import ff_smoothing_pairs
from outcite_duplicate_detecting_spark.operators.containment import single_feature_labels
from outcite_duplicate_detecting_spark.operators.reshape import collect_attrs, melt_attrs
from outcite_duplicate_detecting_spark.sources.gold import (
    component_size_histogram,
    gold_jsonl_labels,
    load_frequency_dictionary,
)


def test_gold_jsonl_labels(spark, tmp_path):
    lines = [
        {"core_id": "1", "labelled_duplicates": ["2"], "doi": "a"},
        {"core_id": "2", "labelled_duplicates": ["3"], "doi": "a"},
        {"core_id": "3", "labelled_duplicates": [], "doi": "a"},
        {"core_id": "7", "labelled_duplicates": [], "doi": "b"},
    ]
    p = tmp_path / "gold.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))
    labels = gold_jsonl_labels(spark, str(p))
    got = {r["core_id"]: r["gold_id"] for r in labels.collect()}
    assert got[1] == got[2] == got[3] == 1  # chained 1-2-3 → min id 1
    assert got[7] == 7
    hist = {
        r["component_size"]: r["n_components"]
        for r in component_size_histogram(labels).collect()
    }
    assert hist == {3: 1, 1: 1}


def test_load_frequency_dictionary(spark, tmp_path):
    p = tmp_path / "freq.txt"
    p.write_text("the 1000\nhouse 50\nbadline\nx notanum\n")
    d = load_frequency_dictionary(spark, str(p))
    assert d == {"the": 1000, "house": 50}


def test_clean_int(spark):
    df = spark.createDataFrame(
        [("1999",), ("7",), ("abc",), (None,), ("0",), ("3000",)], "v string"
    )
    got = [r["c"] for r in df.select(clean_int("v", 1500, 2026).alias("c")).collect()]
    assert got == [1999, None, None, None, None, None]


def test_clean_int_span(spark):
    df = spark.createDataFrame(
        [("10", "20"), ("20", "10"), ("5", None), (None, "8")],
        "s string, e string",
    )
    s, e = clean_int_span("s", "e")
    got = [(r["cs"], r["ce"]) for r in df.select(s.alias("cs"), e.alias("ce")).collect()]
    assert got == [(10, 20), (None, None), (5, None), (None, 8)]


def test_single_feature_labels(spark):
    rows = [
        (1, ["a", "b"]),
        (2, ["b", "c"]),  # linked to 1 via b
        (3, ["d"]),
        (4, []),  # isolated
    ]
    df = spark.createDataFrame(rows, "id long, features array<string>")
    got = {r["id"]: r["label"] for r in single_feature_labels(df).collect()}
    assert got[1] == got[2]
    assert got[3] != got[1]
    assert len({got[1], got[3], got[4]}) == 3


def _py_flatten_pairfy(d, parent_key="", sep="_"):
    """Reference pairfy twin (3_update_duplicateIDs.py:164-175) for the
    flattened dict: lists explode, lists of dicts recurse with list key."""
    for key, v in d.items():
        name = parent_key + sep + key if parent_key else key
        if isinstance(v, dict):
            yield from _py_flatten_pairfy(v, name, sep)
        elif isinstance(v, list):
            for el in v:
                if isinstance(el, dict):
                    yield from _py_flatten_pairfy(el, key, sep)
                else:
                    yield (name, str(el))
        elif v is not None:
            yield (name, str(v))


def test_melt_attrs_matches_pairfy(spark):
    rec = {
        "title": "t1",
        "year": 1999,
        "ids": ["x", "y"],
        "authors": [
            {"surname": "smith", "initials": ["j", "k"]},
            {"surname": "doe", "initials": []},
        ],
        "venue": {"name": "conf", "place": "here"},
    }
    schema = (
        "id long, rec struct<title string, year long, ids array<string>, "
        "authors array<struct<surname string, initials array<string>>>, "
        "venue struct<name string, place string>>"
    )
    df = spark.createDataFrame(
        [
            (
                1,
                (
                    rec["title"],
                    rec["year"],
                    rec["ids"],
                    [(a["surname"], a["initials"]) for a in rec["authors"]],
                    (rec["venue"]["name"], rec["venue"]["place"]),
                ),
            )
        ],
        schema,
    )
    got = {
        (r["attr"], r["value"])
        for r in melt_attrs(df, "id", "rec").collect()
    }
    want = set(_py_flatten_pairfy(rec))
    assert got == want
    # dictfy: same-key values appended
    d = {
        (r["attr"]): sorted(r["values"])
        for r in collect_attrs(melt_attrs(df, "id", "rec"), "id").collect()
    }
    assert d["authors_surname"] == ["doe", "smith"]
    assert d["ids"] == ["x", "y"]


def test_ff_smoothing_vs_numpy(spark):
    # M: 4 docs × 5 features
    post = [
        (0, "a"), (0, "b"),
        (1, "a"), (1, "c"),
        (2, "c"), (2, "d"),
        (3, "e"),
    ]
    feats = sorted({f for _, f in post})
    fi = {f: i for i, f in enumerate(feats)}
    M = np.zeros((4, 5))
    for d, f in post:
        M[d, fi[f]] = 1.0
    x = M.sum(1)  # per-doc
    fv = M.sum(0)  # per-feature
    XF = M / fv[None, :]
    FX = (M / x[:, None]).T
    FF = FX.dot(M / x[:, None]).T  # FF[g,h] = Σ_d M[d,g]M[d,h]/(x[d] f[h]) …
    # compute FF directly from the definition to avoid transposition slips
    FF = np.zeros((5, 5))
    for d in range(4):
        for g in range(5):
            for h in range(5):
                if M[d, g] and M[d, h]:
                    FF[g, h] += 1.0 / (x[d] * fv[h])
    S = XF.dot(FF).dot(FX)

    df = spark.createDataFrame(post, "id long, feat string")
    got = {
        (r["id1"], r["id2"]): r["score"]
        for r in ff_smoothing_pairs(df, ff_threshold=None).collect()
    }
    for (i, j), s in got.items():
        assert s == pytest.approx(S[i, j], rel=1e-9)
    # every nonzero off-diagonal pair appears
    for i in range(4):
        for j in range(4):
            if i != j and S[i, j] > 0:
                assert (i, j) in got
