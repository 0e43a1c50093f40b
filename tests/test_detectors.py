"""Detector correctness vs brute-force all-pairs oracles on a planted corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.functions.hashing import fnv1a64_strings, simhash64
from outcite_duplicate_detecting_spark.operators.dedup import (
    collapse_exact,
    exact_duplicates,
    jaccard_pairs,
)
from outcite_duplicate_detecting_spark.operators.joins import band_candidate_pairs, salted_all_pairs
from outcite_duplicate_detecting_spark.operators.minhash import MinHashConfig, minhash_lsh_pairs
from outcite_duplicate_detecting_spark.operators.simhash import SimHashConfig, simhash_pairs
from outcite_duplicate_detecting_spark.operators.substring import SubstringConfig, substring_pairs
from outcite_duplicate_detecting_spark.sources.pages import CorpusSpec, generate_pages_pdf

SPEC = CorpusSpec(
    n_singletons=60,
    n_exact_clusters=8,
    n_near_clusters=8,
    n_fuzzy_clusters=8,
    n_substring_clusters=8,
    n_hard_negative_pairs=8,
    seed=7,
)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = generate_pages_pdf(SPEC)
    pdf = pdf.reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    df = spark.createDataFrame(pdf[["doc_id", "text", "gold_cluster_id", "dup_kind"]])
    return pdf, df.cache()


def py_shingles(t, n=3):
    w = [x for x in t.lower().split() if x]
    return set(" ".join(w[i : i + n]) for i in range(max(len(w) - n + 1, 1)))


def brute_jaccard_pairs(pdf, n=3, threshold=0.8):
    sh = {r.doc_id: py_shingles(r.text, n) for r in pdf.itertuples()}
    ids = sorted(sh)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            union = len(sh[a]) + len(sh[b]) - inter
            if inter * 10**6 >= union * int(round(threshold * 10**6)):
                out.add((a, b))
    return out


def test_exact_duplicates(spark, corpus):
    pdf, df = corpus
    got = exact_duplicates(df).collect()
    from collections import Counter

    counts = Counter(pdf["text"])
    want_texts = {t for t, c in counts.items() if c > 1}
    assert len(got) == len(want_texts)
    for r in got:
        ids = sorted(pdf.index[pdf["text"] == pdf["text"][r["member_ids"][0]]].tolist())
        assert r["member_ids"] == ids
        assert r["canonical_id"] == ids[0]


def test_collapse_exact_roundtrip(spark, corpus):
    pdf, df = corpus
    reps, membership = collapse_exact(df)
    assert reps.count() == pdf["text"].nunique()
    assert membership.count() == len(pdf)
    # every member maps to a rep with identical text
    joined = (
        membership.join(df.select(F.col("doc_id").alias("id"), F.col("text").alias("t_member")), "id")
        .join(reps.select(F.col("rep_id"), F.col("text").alias("t_rep")), "rep_id")
    )
    assert joined.where(F.col("t_member") != F.col("t_rep")).count() == 0


def test_jaccard_pairs_exact_oracle(spark, corpus):
    pdf, df = corpus
    want = brute_jaccard_pairs(pdf, n=3, threshold=0.8)
    got = {(r["id1"], r["id2"]) for r in jaccard_pairs(df, threshold=0.8).collect()}
    assert got == want


def test_minhash_lsh_recall_and_precision(spark, corpus):
    pdf, df = corpus
    want = brute_jaccard_pairs(pdf, n=3, threshold=0.8)
    cfg = MinHashConfig(threshold=0.8)
    verified, drops = minhash_lsh_pairs(df, cfg)
    got = {(r["id1"], r["id2"]) for r in verified.collect()}
    assert drops.count() == 0
    # precision is exact by construction (verify step)
    assert got <= want
    # recall ≥ 0.99 required by BASELINE.json; planted pairs are J≥0.9 so
    # 32 bands × 4 rows should find every one
    assert len(got) >= 0.99 * len(want)


def brute_simhash_pairs(pdf, k=7, n=2):
    def grams(t):
        w = [x for x in t.lower().split() if x]
        return list(
            dict.fromkeys(
                " ".join(w[i : i + n]) for i in range(max(len(w) - n + 1, 1))
            )
        )

    sigs = {}
    for r in pdf.itertuples():
        h = fnv1a64_strings(grams(r.text))
        sigs[r.doc_id] = simhash64(h)
    ids = sorted(sigs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= k:
                out.add((a, b))
    return out


def test_simhash_pigeonhole_exact_fnv(spark, corpus):
    """python/string-FNV mode: signatures bit-match the reference fold."""
    pdf, df = corpus
    want = brute_simhash_pairs(pdf, k=7)
    cfg = SimHashConfig(hamming_k=7, hash_fn="python")
    assert cfg.exactness_holds()
    verified, drops = simhash_pairs(df, cfg)
    got = {(r["id1"], r["id2"]) for r in verified.collect()}
    assert drops.count() == 0
    assert got == want  # pigeonhole ⇒ EXACT, not approximate


def brute_wordhash_simhash_sigs(pdf, n=2):
    """Brute signatures under the default wordhash kernel (the unified
    sign-stage hash family: FNV per word, shifted-slice gram combiner)."""
    from outcite_duplicate_detecting_spark.functions.hashing import (
        hash_shingles_from_word_hashes,
    )
    from outcite_duplicate_detecting_spark.functions.text import py_words

    return {
        r.doc_id: simhash64(
            hash_shingles_from_word_hashes(fnv1a64_strings(py_words(r.text)), n)
        )
        for r in pdf.itertuples()
    }


def test_simhash_pigeonhole_exact_wordhash_default(spark, corpus):
    """default (wordhash-kernel) mode: the band join finds exactly the ≤k
    pairs of the kernel's signatures (pigeonhole), verified brute-force."""
    pdf, df = corpus
    sigs = brute_wordhash_simhash_sigs(pdf)
    want = {
        (a, b)
        for i, a in enumerate(sorted(sigs))
        for b in sorted(sigs)[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 7
    }
    cfg = SimHashConfig(hamming_k=7)
    assert cfg.hash_fn == "wordhash" and cfg.exactness_holds()
    verified, drops = simhash_pairs(df, cfg)
    got = {(r["id1"], r["id2"]) for r in verified.collect()}
    assert drops.count() == 0
    assert got == want


def test_simhash_pigeonhole_exact_xxhash(spark, corpus):
    """catalyst-xxhash64 mode: the band join finds exactly the ≤k pairs of
    the signatures it computed (pigeonhole), and signatures are stable."""
    pdf, df = corpus
    cfg = SimHashConfig(hamming_k=7, hash_fn="catalyst-xxhash64")
    from outcite_duplicate_detecting_spark.operators.simhash import add_simhash

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in add_simhash(
            df.select("doc_id", "text"), cfg
        ).select("doc_id", "simhash").collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 7
    }
    verified, drops = simhash_pairs(df, cfg)
    got = {(r["id1"], r["id2"]) for r in verified.collect()}
    assert drops.count() == 0
    assert got == want


def brute_containment_pairs(pdf, min_len=50):
    rows = [(r.doc_id, r.text) for r in pdf.itertuples()]
    out = set()
    for a, ta in rows:
        if len(ta) < min_len:
            continue
        for b, tb in rows:
            if a != b and ta in tb:
                out.add((a, b))
    return out


def test_substring_exact(spark, corpus):
    pdf, df = corpus
    want = brute_containment_pairs(pdf, min_len=50)
    verified, drops = substring_pairs(df, SubstringConfig())
    got = {(r["inner_id"], r["outer_id"]) for r in verified.collect()}
    assert drops.count() == 0
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_substring_minfp_recall_adversarial_ties(spark, seed):
    """Property test of the min-fingerprint winnowing argument (r5 verdict
    advisory #5) at its edges: random plants over a TWO-letter alphabet
    (maximal k-gram hash ties/collisions), heavy periodic repeats (every
    winnow window full of equal minima — the rightmost-tie-break path),
    plants exactly at the guarantee threshold len == min_len, and shared
    inner spans planted into multiple outers. The end-to-end output must
    equal the brute-force containment oracle — which in particular means
    candidate recall before verification was 1.0 (verification can only
    drop pairs, never add)."""
    rng = np.random.RandomState(seed)
    cfg = SubstringConfig()  # min_len=50, k=25, w=26
    docs = []
    def rnd(n):
        return "".join(rng.choice(list("ab"), size=n))
    # periodic / tie-heavy inners, including exactly-threshold lengths
    inners = [
        "ab" * 25,                # len 50 == min_len, period 2
        "a" * 50,                 # all-equal grams: every window ties
        rnd(50),
        rnd(73),
        ("aba" * 20)[:55],        # period 3
    ]
    for i, t in enumerate(inners):
        docs.append((i, t))
    # outers embedding each inner at random offsets (some share inners)
    nid = len(inners)
    for i, t in enumerate(inners):
        for _ in range(2):
            pre, post = rnd(int(rng.randint(0, 60))), rnd(int(rng.randint(0, 60)))
            docs.append((nid, pre + t + post))
            nid += 1
    # noise docs, some shorter than min_len
    for _ in range(25):
        docs.append((nid, rnd(int(rng.randint(10, 120)))))
        nid += 1
    import pandas as pd

    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    want = brute_containment_pairs(pdf, min_len=cfg.min_len)
    df = spark.createDataFrame(pdf)
    verified, _drops = substring_pairs(df, cfg)
    got = {(r["inner_id"], r["outer_id"]) for r in verified.collect()}
    assert got == want


def test_salted_all_pairs_equals_naive(spark):
    rng = np.random.RandomState(3)
    rows = [(int(i), int(k)) for i, k in enumerate(rng.randint(0, 5, size=300))]
    df = spark.createDataFrame(rows, "id long, band_key long")
    naive = band_candidate_pairs(df, ["band_key"], "id").pairs
    salted = band_candidate_pairs(df, ["band_key"], "id", salt=4).pairs
    a = {(r["id1"], r["id2"]) for r in naive.collect()}
    b = {(r["id1"], r["id2"]) for r in salted.collect()}
    assert a == b
    # exactly-once check (no dup pairs pre-distinct)
    raw = salted_all_pairs(df, ["band_key"], "id", 4)
    assert raw.count() == raw.distinct().count()


def test_bucket_cap_drops_accounted(spark):
    rows = [(int(i), 1) for i in range(100)] + [(100 + int(i), 2) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, band_key int")
    res = band_candidate_pairs(df, ["band_key"], "id", max_bucket_size=10)
    assert res.pairs.count() == 3  # only the small bucket pairs
    d = res.drops.collect()
    assert len(d) == 1 and d[0]["bucket_size"] == 100


def test_jaccard_pairs_hot_shingle_cap(spark):
    from outcite_duplicate_detecting_spark.operators.dedup import jaccard_pairs_with_drops

    # 30 docs all sharing one stop-shingle; two genuine near-dup docs
    rows = [(int(i), f"common stop phrase unique{i} tail{i} word{i}") for i in range(30)]
    rows += [(100, "alpha beta gamma delta epsilon"), (101, "alpha beta gamma delta zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs, drops = jaccard_pairs_with_drops(df, threshold=0.5, max_bucket_size=10)
    d = drops.collect()
    assert {r["shingle"] for r in d} == {"common stop phrase"}
    assert d[0]["bucket_size"] == 30
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert got == {(100, 101)}  # stop-shingle bucket generated no pairs

    # uncapped: identical output when no bucket exceeds the cap
    capped, drops2 = jaccard_pairs_with_drops(df, threshold=0.5, max_bucket_size=25000)
    uncapped, _ = jaccard_pairs_with_drops(df, threshold=0.5, max_bucket_size=None)
    assert drops2.count() == 0
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_simhash_multiprobe_exact_k7_at_16bit(spark, corpus):
    """16-bit bands alone are pigeonhole-exact only for hamming ≤ 3; with
    1-bit multi-probe they are exact for ≤ 2·4−1 = 7 — the web-scale
    config. Verified against the brute-force hamming oracle."""
    import itertools

    pdf, df = corpus
    sigs = brute_wordhash_simhash_sigs(pdf)
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 7
    }
    cfg = SimHashConfig(bits_per_band=16, multi_probe=True)
    assert cfg.exactness_holds()
    verified, drops = simhash_pairs(df, cfg)
    got = {(r["id1"], r["id2"]) for r in verified.collect()}
    assert drops.count() == 0
    assert got == want  # exact: no tail loss, no false positives


def test_simhash_salted_equals_fused(spark, corpus):
    """The triangle-salted fallback path produces the same verified pair
    set as the fused join-verify (salting only re-cells the work)."""
    pdf, df = corpus
    v1, _ = simhash_pairs(df, SimHashConfig())
    v2, _ = simhash_pairs(df, SimHashConfig(salt=4))
    a = {(r["id1"], r["id2"], r["hamming_dist"]) for r in v1.collect()}
    b = {(r["id1"], r["id2"], r["hamming_dist"]) for r in v2.collect()}
    assert a == b
