"""Unit tests for shingling/hashing kernels against independent Python oracles."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.functions.hashing import (
    fnv1a64_strings,
    kgram_rolling_hashes,
    minhash_params,
    minhash_signature,
    simhash64,
    winnow,
)
from outcite_duplicate_detecting_spark.functions.text import (
    char_ngrams,
    duck_char_ngrams,
    duck_word_shingles,
    word_shingles,
    words,
)


def py_words(t):
    return [w for w in t.lower().split() if w]


def py_word_shingles(t, n=3):
    w = py_words(t)
    out, seen = [], set()
    for i in range(max(len(w) - n + 1, 1)):
        s = " ".join(w[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def py_char_ngrams(t, n=3):
    t = t.lower()
    out, seen = [], set()
    for i in range(max(len(t) - n + 1, 1)):
        g = t[i : i + n]
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


TEXTS = [
    "The quick  brown fox jumps over the lazy dog",
    "a b",
    "single",
    "",
    "  leading and trailing  ",
    "Ünïcode tëxt with ümlauts",
]


def test_shingles_match_python(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    rows = df.select(
        "text",
        words("text").alias("w"),
        word_shingles("text", 3).alias("ws"),
        char_ngrams("text", 3).alias("cg"),
    ).collect()
    for r in rows:
        assert r["w"] == py_words(r["text"])
        assert r["ws"] == py_word_shingles(r["text"], 3)
        assert r["cg"] == py_char_ngrams(r["text"], 3)


def test_duckdb_twins_match_spark(spark):
    import duckdb

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    srows = df.select(
        word_shingles("text", 3).alias("ws"), char_ngrams("text", 4).alias("cg")
    ).collect()
    for t, srow in zip(TEXTS, srows):
        ws = duckdb.sql(
            "select "
            f"{duck_word_shingles('txt', 3)}, {duck_char_ngrams('txt', 4)} "
            "from (select ?::varchar as txt) s",
            params=[t],
        ).fetchone()
        assert sorted(srow["ws"]) == sorted(ws[0])
        assert sorted(srow["cg"]) == sorted(ws[1])


def py_fnv1a(b: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in b:
        h = ((h ^ byte) * 0x100000001B3) % 2**64
    return h


@given(st.lists(st.text(max_size=30), max_size=20))
@settings(max_examples=50, deadline=None)
def test_fnv1a_matches_scalar_reference(strings):
    got = fnv1a64_strings(strings)
    want = [py_fnv1a(s.encode("utf-8")) for s in strings]
    assert [int(x) for x in got] == want


def test_simhash_majority_semantics():
    # two features: bits set in both → 1; in one → tie → 0
    h = np.array([0b1011, 0b0011], dtype=np.uint64)
    assert simhash64(h) == 0b0011
    assert simhash64(np.array([], dtype=np.uint64)) == 0
    assert simhash64(np.array([7], dtype=np.uint64)) == 7


def test_minhash_similarity_estimate():
    a, b = minhash_params(256, seed=1)
    rng = np.random.RandomState(0)
    s1 = rng.randint(0, 2**63, size=200).astype(np.uint64)
    s2 = np.concatenate([s1[:150], rng.randint(0, 2**63, size=50).astype(np.uint64)])
    sig1 = minhash_signature(s1, a, b)
    sig2 = minhash_signature(s2, a, b)
    true_j = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
    est = (sig1 == sig2).mean()
    assert abs(est - true_j) < 0.12
    # identical sets → identical signatures
    assert (minhash_signature(s1, a, b) == sig1).all()


def py_kgram_hashes(t: str, k: int):
    b = t.encode("utf-8")
    base = 1000003
    if len(b) <= k:
        h = 0
        for v in b:
            h = (h * base + v) % 2**64
        return [h]
    out = []
    for i in range(len(b) - k + 1):
        h = 0
        for v in b[i : i + k]:
            h = (h * base + v) % 2**64
        out.append(h)
    return out


@given(st.text(min_size=0, max_size=120), st.integers(min_value=2, max_value=8))
@settings(max_examples=60, deadline=None)
def test_rolling_hash_matches_naive(t, k):
    got = [int(x) for x in kgram_rolling_hashes(t, k)]
    assert got == py_kgram_hashes(t, k)


@given(
    st.text(alphabet="ab ", min_size=0, max_size=200),
    st.text(alphabet="ab ", min_size=0, max_size=200),
    st.text(alphabet="abc ", min_size=60, max_size=150),
)
@settings(max_examples=40, deadline=None)
def test_winnow_guarantee(prefix, suffix, shared):
    """Texts sharing a run ≥ w+k-1 bytes share a winnowed fingerprint."""
    k, w = 25, 26
    t1 = prefix + shared
    t2 = shared + suffix
    f1 = set(int(x) for x in winnow(t1, k, w))
    f2 = set(int(x) for x in winnow(t2, k, w))
    assert f1 & f2, "winnowing guarantee violated"


def test_winnow_deterministic():
    t = "hello world " * 20
    assert winnow(t, 25, 26).tolist() == winnow(t, 25, 26).tolist()
