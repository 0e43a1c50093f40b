"""Generalization lattice, surrogate specification, min-el diagnostics,
gold-link labels, and word normalization vs hand-computed oracles."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.functions.wordnorm import (
    CORE_WORDS,
    compound_split,
    lemmatize,
    make_is_word,
    normalize_tokens_udf,
    py_authgrams,
    py_chargrams_per_word,
    chargrams_per_word,
)
from outcite_duplicate_detecting_spark.operators.containment import (
    containment_pairs,
    lattice_pair_recall,
    minel_fanin_stats,
    minel_superset_edges,
)
from outcite_duplicate_detecting_spark.operators.generalize import (
    GeneralizationScheme,
    generalize_expand,
    parse_rule_line,
    specify_surrogates,
)
from outcite_duplicate_detecting_spark.operators.goldlinks import gold_labels


# ------------------------------------------------------------- generalize

def test_parse_rule_line():
    lhs, rhss, ftypes = parse_rule_line(
        "2 initial 0 first 3 term --> 1 initial 0 first 2 term | 2 initial 0 first 1 term"
    )
    assert lhs == (2, 0, 3)
    assert rhss == [(1, 0, 2), (2, 0, 1)]
    assert ftypes == ["initial", "first", "term"]


def test_generalize_expand(spark):
    scheme = GeneralizationScheme(
        groups={"term": ["t1", "t2"], "year": ["y1"]},
        rules={(2, 1): [(1, 1), (2, 0)]},
        restrictions=[["t1", "t2"]],  # at least one term must survive
    )
    df = spark.createDataFrame(
        [(1, "a", "b", "1999"), (2, "a", None, "2000")],
        "id long, t1 string, t2 string, y1 string",
    )
    got = generalize_expand(df, scheme, id_col="id").collect()
    rows = {(r["id"], r["t1"], r["t2"], r["y1"]) for r in got}
    # row 1 (lhs (2,1)): rhs (1,1) → keep one of {t1,t2} + y1 (2 combos);
    # rhs (2,0) → keep both terms, drop year (1 combo). All pass restriction.
    assert rows == {
        (1, "a", None, "1999"),
        (1, None, "b", "1999"),
        (1, "a", "b", None),
    }
    # row 2 has lhs (1,1): no rule → nothing emitted


def test_specify_surrogates(spark):
    df = spark.createDataFrame(
        [
            (1, None, None, "x"),  # restriction 1 all-null → f1 = id
            (2, "a", None, None),  # restriction 2 all-null → f3 = id
            (3, None, None, None),  # both null → FIRST restriction wins only
            (4, "a", "b", "c"),  # fully specified → untouched
        ],
        "id long, f1 string, f2 string, f3 string",
    )
    got = {
        r["id"]: r
        for r in specify_surrogates(
            df, [["f1", "f2"], ["f3"]], id_col="id"
        ).collect()
    }
    assert got[1]["f1"] == "1" and got[1]["f3"] == "x"
    assert got[2]["f1"] == "a" and got[2]["f3"] == "2"
    assert got[3]["f1"] == "3" and got[3]["f3"] is None  # first-match only
    assert got[4]["f1"] == "a" and got[4]["f3"] == "c"


# ---------------------------------------------------------- minel stats

@pytest.fixture()
def poset(spark):
    # feature sets: m1={a}, m2={b}, s1={a,b}, s2={a,b,c}, s3={b,d}
    rows = [
        (1, ["a"]),
        (2, ["b"]),
        (3, ["a", "b"]),
        (4, ["a", "b", "c"]),
        (5, ["b", "d"]),
    ]
    return spark.createDataFrame(rows, "id long, features array<string>")


def test_minel_fanin_stats(spark, poset):
    pairs = containment_pairs(poset)
    edges = minel_superset_edges(pairs)
    # minels: 1 ({a}) and 2 ({b}). supersets of 1: 3,4; of 2: 3,4,5.
    # fan_in: 3→2, 4→2, 5→1
    got = {r["minel_id"]: r for r in minel_fanin_stats(edges).collect()}
    assert got[1]["num_any"] == 2 and got[1]["num_multi"] == 2 and got[1]["num_single"] == 0
    assert got[2]["num_any"] == 3 and got[2]["num_multi"] == 2 and got[2]["num_single"] == 1
    assert got[1]["prob_multi_ppm"] == 1_000_000
    assert got[2]["prob_multi_ppm"] == 666_666


def test_lattice_pair_recall(spark, poset):
    pairs = containment_pairs(poset)
    edges = minel_superset_edges(pairs)
    # gold: minels 1,2 same group g1 (they share supersets 3 and 4 → reached)
    nodes = spark.createDataFrame(
        [(1, "g1"), (2, "g1")], "id long, gold string"
    )
    row = lattice_pair_recall(edges, nodes).collect()[0]
    # reached pairs within g1: (1,1),(2,2) reflexive + (1,2),(2,1) shared sup
    # TP = 4, T = (1+1)^2 = 4 → recall 1.0
    assert row["tp"] == 4 and row["t"] == 4
    assert row["micro_recall_ppm"] == 1_000_000
    assert row["macro_recall_ppm"] == 1_000_000

    # split gold: each its own group → TP per group = 1, T = 1 → still 1.0;
    # but a third minel with NO shared superset in g1 lowers recall
    nodes2 = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (6, "g1")], "id long, gold string"
    )
    row2 = lattice_pair_recall(edges, nodes2).collect()[0]
    # node 6 has no edges (isolated): reaches only itself.
    # reached in-gold pairs: (1,1),(2,2),(6,6),(1,2),(2,1) → TP=5, T=9
    assert row2["tp"] == 5 and row2["t"] == 9


def test_lattice_pair_recall_fanin_cap(spark, poset):
    """Hot-superset guard: supersets over the fan-in cap are excluded from
    the reached self-join and accounted in drops — recall only ever drops
    (conservative), and a no-op cap leaves the result exactly unchanged."""
    from outcite_duplicate_detecting_spark.operators.containment import (
        lattice_pair_recall_with_drops,
    )

    pairs = containment_pairs(poset)
    edges = minel_superset_edges(pairs)
    nodes = spark.createDataFrame([(1, "g1"), (2, "g1")], "id long, gold string")

    # supersets 3 and 4 each have fan-in 2 (minels 1 and 2), superset 5 has
    # fan-in 1; reflexive self-edges add dst=1, dst=2 at fan-in 1.
    out, drops = lattice_pair_recall_with_drops(edges, nodes, max_fanin=1)
    dropped = {(r["dst"], r["fan_in"]) for r in drops.collect()}
    assert dropped == {(3, 2), (4, 2)}
    row = out.collect()[0]
    # cross pairs (1,2),(2,1) rode only on dropped supersets → TP=2 (the
    # reflexive pairs survive), T=4: understated, never overstated
    assert row["tp"] == 2 and row["t"] == 4

    # cap above every fan-in: drops empty, result identical to uncapped
    capped, drops2 = lattice_pair_recall_with_drops(edges, nodes, max_fanin=100)
    uncapped, _ = lattice_pair_recall_with_drops(edges, nodes, max_fanin=None)
    assert drops2.count() == 0
    assert capped.collect() == uncapped.collect()


# ------------------------------------------------------------ gold links

def test_gold_labels(spark):
    df = spark.createDataFrame(
        [
            ("m1", "X", None),
            ("m2", "X", "Y"),
            ("m3", None, "Y"),
            ("m4", "Z", None),
            ("m5", None, None),  # no targets → singleton
        ],
        "mention string, crossref string, dnb string",
    )
    got = gold_labels(df, "mention", ["crossref", "dnb"]).collect()
    lab = {r["mention"]: r["gold_id"] for r in got}
    assert len(lab) == 5
    assert lab["m1"] == lab["m2"] == lab["m3"]  # X chains to Y via m2
    assert lab["m4"] != lab["m1"]
    assert lab["m5"] not in (lab["m1"], lab["m4"])


# -------------------------------------------------------------- wordnorm

def test_is_word_and_split():
    iw = make_is_word()
    assert iw("house")
    assert iw("the")  # stopword, len > 2
    assert not iw("zz")
    assert compound_split("waterlight", iw) == ["water", "light"]
    assert compound_split("xqzzt", iw) == ["xqzzt"]  # unsplittable passthrough
    # longest valid prefix wins: 'years' (a word itself) + 'book'
    assert compound_split("yearsbook", iw) == ["years", "book"]


def test_lemmatize():
    iw = make_is_word()
    assert lemmatize("houses", iw) == "house"
    assert lemmatize("states", iw) == "state"
    assert lemmatize("men", iw) == "man"
    assert lemmatize("playing", iw) == "play"
    assert lemmatize("unknownword", iw) == "unknownword"


def test_normalize_tokens_udf(spark):
    df = spark.createDataFrame(
        [(1, ["houses", "waterlight", "xqzzt"])], "id long, toks array<string>"
    )
    got = df.select(normalize_tokens_udf()(F.col("toks")).alias("n")).collect()[0]["n"]
    assert got == ["house", "water", "light", "xqzzt"]


def test_chargrams_and_authgrams(spark):
    assert py_chargrams_per_word("ab cde", n=2) == ["ab", "cd", "de"]
    assert py_chargrams_per_word("smith", n=4) == ["smit", "mith"]
    assert py_chargrams_per_word("abc", n=4) == []
    # per-word grams: 'smith_j' → words [smith, j] → grams of 'smith' only
    # ('j' and 'doe' are shorter than n=4 and contribute nothing)
    ag = py_authgrams([("smith", "j", None), ("doe", None, None)], n=4)
    assert ag == ["smit", "mith"] + [None] * 10
    # catalyst twin matches the python twin
    df = spark.createDataFrame([("ab cde",), ("smith",), ("x",)], "s string")
    got = [r["g"] for r in df.select(chargrams_per_word("s", 2).alias("g")).collect()]
    assert got == [py_chargrams_per_word(s, 2) for s in ("ab cde", "smith", "x")]


def test_asciifolded_word_chargrams(spark):
    from outcite_duplicate_detecting_spark.functions.wordnorm import (
        asciifolded_word_chargrams,
    )

    df = spark.createDataFrame([("Müller Straße",)], "s string")
    got = df.select(asciifolded_word_chargrams("s", 4).alias("g")).collect()[0]["g"]
    # fold: 'muller strasse' → words [muller, strasse]
    assert got == ["mull", "ulle", "ller", "stra", "tras", "rass", "asse"]


def test_ascii_dammit_ms_block(spark):
    """Full MS-charset transliteration parity: the cp1252 0x80-0x9F block
    (raw codepoints AND the Unicode equivalents modern decoding yields)
    maps to the published plain-text approximations instead of being
    stripped; Latin-1 letters fold; leftovers strip."""
    from outcite_duplicate_detecting_spark.functions.textnorm import (
        ASCII_DAMMIT_TABLE,
        asciifold,
        py_ascii_dammit,
    )

    # hand-typed expectations for the punctuation block (reference plain
    # approximations, M_asciidammit.py:29-59)
    expect = {
        "\x80": "EUR", "\x82": ",", "\x84": ",,", "\x85": "...",
        "\x86": "+", "\x87": "++", "\x89": "%", "\x91": "'", "\x92": "'",
        "\x93": '"', "\x94": '"', "\x95": "*", "\x96": "-", "\x97": "--",
        "\x99": "(TM)", "\x8c": "OE", "\x9c": "oe",
        # Unicode equivalents of the same cp1252 bytes
        "‘": "'", "’": "'", "“": '"', "”": '"',
        "–": "-", "—": "--", "…": "...", "€": "EUR",
        "™": "(TM)",
        # Latin-1 letters and symbols
        "\xe9": "e", "\xdf": "ss", "\xc6": "AE", "\xbd": "1/2",
        "\xa9": "", "\xd7": "*", "\xf7": "/",
    }
    for ch, out in expect.items():
        assert ASCII_DAMMIT_TABLE[ch] == out, hex(ord(ch))
        assert py_ascii_dammit(ch) == out, hex(ord(ch))
    # every char 0x80-0xff is covered (nothing silently stripped)
    for cp in range(0x80, 0x100):
        assert chr(cp) in ASCII_DAMMIT_TABLE, hex(cp)

    samples = [
        "“Smart” quotes — and ellipsis…",
        "Caf\xe9 \xbd price \x93quoted\x94",
        "stra\xdfe €5",
        "untouched ascii!",
        "greek α stripped",  # not in the table → stripped
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["f"] for r in df.select(asciifold("s").alias("f")).collect()]
    assert got == [py_ascii_dammit(s) for s in samples]
    assert got[0] == '"Smart" quotes -- and ellipsis...'
    assert got[1] == 'Cafe 1/2 price "quoted"'
    assert got[2] == "strasse EUR5"
    assert got[3] == "untouched ascii!"
    assert got[4] == "greek  stripped"


def test_text_sections(spark):
    """Subtitle + stopword section split parity with the reference's
    nested SUBTITDIV/STOPWORDS composition (B2_process_features.py:76-77,
    160-161), recomputed literally."""
    import re

    from outcite_duplicate_detecting_spark.functions.textnorm import (
        py_text_sections,
        text_sections,
    )

    stopwords = ["the", "of", "and"]
    SUBTITDIV = re.compile(r"\. |: | -+ |\? ")
    STOPWORDS = re.compile(
        r"&|\.|\,|" + r"|".join("\\b" + s + "\\b" for s in stopwords)
    )

    samples = [
        "history of science: a survey. second edition",
        "war -- and peace? or both, maybe & more",
        "plain title without dividers",
    ]
    for s in samples:
        want = [d for t in SUBTITDIV.split(s) for d in STOPWORDS.split(t)]
        assert py_text_sections(s, stopwords) == want, s

    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [
        r["sec"] for r in df.select(text_sections("s", stopwords).alias("sec")).collect()
    ]
    assert got == [py_text_sections(s, stopwords) for s in samples]


def test_gold_pair_samples_reference_parity(spark):
    """gold_pair_samples vs a literal reimplementation of the reference's
    get_samples (common.py:376-403) — same pairs, same caps, same
    first-come overshoot semantics, on a labelling with singletons, a big
    group (per-label cap binds) and enough groups for the global caps."""
    import itertools

    from outcite_duplicate_detecting_spark.operators.evaluate import (
        gold_pair_samples,
    )

    # mentions 0..29: label layout exercises every cap
    gold = (
        ["g0"] * 8        # C(8,2)=28 combos, per-label cap 5 binds
        + ["g1"] * 4      # 6 combos
        + ["g2"] * 1      # singleton
        + ["g3"] * 3
        + ["g4"] * 2
        + ["g5"] * 12     # big group
    )

    def ref_get_samples(labelling, max_epl, max_e, max_dpp, max_d):
        g2i = {}
        for i, g in enumerate(labelling):
            g2i.setdefault(g, []).append(i)
        equivalents = []
        for g in g2i:
            eq_ = []
            for m1, m2 in itertools.combinations(g2i[g], 2):
                eq_.append((m1, m2))
                if len(eq_) >= max_epl:
                    break
            equivalents += eq_
            if len(equivalents) >= max_e:
                break
        differents = []
        for g1, g2 in itertools.combinations(g2i.keys(), 2):
            d_ = []
            for m1, m2 in itertools.product(g2i[g1], g2i[g2]):
                d_.append((m1, m2))
                if len(d_) >= max_dpp:
                    break
            differents += d_
            if len(differents) >= max_d:
                break
        return set(equivalents), set(differents)

    caps = dict(max_epl=5, max_e=12, max_dpp=3, max_d=20)
    want_eq, want_diff = ref_get_samples(gold, **caps)

    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(gold)], "id long, gold string"
    )
    out = gold_pair_samples(
        df,
        max_equivs_per_gold_label=caps["max_epl"],
        max_equivs=caps["max_e"],
        max_diffs_per_gold_pair=caps["max_dpp"],
        max_diffs=caps["max_d"],
    ).collect()
    got_eq = {(r["m1"], r["m2"]) for r in out if r["is_equivalent"]}
    got_diff = {(r["m1"], r["m2"]) for r in out if not r["is_equivalent"]}
    assert got_eq == want_eq
    assert got_diff == want_diff
