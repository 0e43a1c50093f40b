"""Tests for textstats, similarity, evaluate, canonicalize, classify,
multimodal plumbing, and streaming incremental."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.operators.canonicalize import (
    canonical_members,
    majority_vote_fields,
    merge_clusters_grouped,
)
from outcite_duplicate_detecting_spark.operators.classify import (
    LogisticPairScorer,
    score_pairs,
    within_cluster_pairs,
)
from outcite_duplicate_detecting_spark.operators.evaluate import pairwise_pr
from outcite_duplicate_detecting_spark.operators.multimodal import extract_features
from outcite_duplicate_detecting_spark.operators.similarity import (
    AnnLshConfig,
    ann_lsh_cosine,
    knn_cosine_brute,
)
from outcite_duplicate_detecting_spark.operators.textstats import (
    language_id,
    text_quality,
    token_stats,
)


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat !!"), (2, ""), (3, "word " * 60)],
        "id long, text string",
    )
    rows = {r["id"]: r for r in text_quality(token_stats(df)).collect()}
    assert rows[1]["n_tokens"] == 7
    assert rows[1]["n_distinct_tokens"] == 6
    assert rows[2]["n_tokens"] == 0 and rows[2]["quality_score"] >= 0
    assert rows[3]["n_tokens"] == 60
    # 60 tokens of 'word': len rule ok, mean len 4 ok, no punct, distinct 1/60 < 0.1
    assert rows[3]["quality_score"] == 3
    assert rows[1]["punct_ppm"] == (2 * 1000000) // 25


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze und das haus"),
            (3, "xyz qrs tuv"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "en"


def test_knn_cosine_brute_matches_numpy(spark):
    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(40)], "vec_id long, embedding array<float>"
    )
    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = knn_cosine_brute(df, q, k=4).collect()
    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    cos = (v64 @ v64.T) / np.outer(norms, norms)
    for qid in range(3):
        order = sorted(
            (j for j in range(40) if j != qid), key=lambda j: (-cos[qid, j], j)
        )[:4]
        mine = sorted(
            [(r["rank"], r["neighbor_id"]) for r in got if r["query_id"] == qid]
        )
        assert [n for _, n in mine] == order


def test_ann_lsh_recall(spark):
    rng = np.random.RandomState(1)
    base = rng.standard_normal((60, 16))
    # plant 3 near-identical neighbors for query 0
    base[1] = base[0] + 0.01 * rng.standard_normal(16)
    base[2] = base[0] + 0.01 * rng.standard_normal(16)
    df = spark.createDataFrame(
        [(i, base[i].astype(np.float32).tolist()) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = df.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    got = ann_lsh_cosine(df, q, AnnLshConfig(k=2))
    top = {r["neighbor_id"] for r in got.collect()}
    assert {1, 2} == top


def test_pairwise_pr_reference_semantics(spark):
    # gold: {a,b,c}, {d}; pred: {a,b}, {c,d}
    rows = [("a", 1, 10), ("b", 1, 10), ("c", 1, 20), ("d", 2, 20)]
    df = spark.createDataFrame(rows, "id string, gold long, label long")
    r = pairwise_pr(df, gold_col="gold", label_col="label").collect()[0]
    # T = 9+1 = 10; P = 4+4 = 8; TP = |{a,b}|^2 + |{c}|^2 + |{d}|^2 = 4+1+1 = 6
    assert (r["t_mass"], r["p_mass"], r["tp_mass"]) == (10, 8, 6)
    assert r["precision_ppm"] == 750000
    assert r["recall_ppm"] == 600000


def test_canonicalize(spark):
    docs = spark.createDataFrame(
        [(1, "short", "en"), (2, "the longest text here", "de"), (3, "mid text", "de")],
        "doc_id long, text string, lang string",
    )
    assign = spark.createDataFrame([(1, 100), (2, 100), (3, 100)], "doc_id long, cluster_id long")
    r = canonical_members(assign, docs).collect()[0]
    assert r["canonical_id"] == 2 and r["cluster_size"] == 3
    m = merge_clusters_grouped(docs.join(assign, "doc_id")).collect()[0]
    assert m["canonical_id"] == 2 and m["member_ids"] == [1, 2, 3]
    mv = majority_vote_fields(docs.join(assign, "doc_id"), "cluster_id", ["lang"]).collect()[0]
    assert mv["lang"] == "de"


def test_logistic_scorer(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 90, 100), (3, 4, 5, 100)], "id1 long, id2 long, inter_size long, union_size long"
    )
    scorer = LogisticPairScorer(weights={"jaccard": 12.0}, bias=-5.5588, threshold=0.5)
    rows = {(r["id1"], r["id2"]): r for r in score_pairs(pairs, scorer).collect()}
    z = 12.0 * 0.9 - 5.5588
    want = math.floor(1e6 / (1 + math.exp(-z)))
    assert rows[(1, 2)]["score_ppm"] == want
    assert rows[(1, 2)]["is_equivalent"] and not rows[(3, 4)]["is_equivalent"]


def test_within_cluster_pairs(spark):
    a = spark.createDataFrame([(1, 9), (2, 9), (3, 9), (4, 8)], "doc_id long, cluster_id long")
    got = {(r["id1"], r["id2"]) for r in within_cluster_pairs(a).collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"imgbytes"), 0, 0, 0), (2, "audio", bytearray(b"au"), 0, 0, 0)],
        "media_id long, modality string, content binary, meta_width int, meta_height int, meta_duration_ms int",
    )
    feats = extract_features(media, feature_dim=8).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 8 and len(by_id[1]["feature"]) == 8
    # deterministic across invocations
    again = {r["media_id"]: r["feature"] for r in extract_features(media, feature_dim=8).collect()}
    assert again[1] == by_id[1]["feature"]
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        extract_features(media, deterministic_fake=False).collect()


def test_streaming_incremental(spark, tmp_path):
    from outcite_duplicate_detecting_spark.streaming.incremental import (
        incremental_new_rows,
        stream_signatures,
    )

    snap = spark.createDataFrame([("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, text string")
    manifest = spark.createDataFrame([("u1",)], "url string")
    assert {r["url"] for r in incremental_new_rows(snap, manifest).collect()} == {"u2", "u3"}

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    pages = spark.createDataFrame(
        [("u1", None, None, "hello world text", "en"), ("u2", None, None, "other text", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    pages.write.parquet(src)
    q = stream_signatures(spark, src, out, ck)
    q.awaitTermination(120)
    sigs = spark.read.parquet(out)
    assert sigs.count() == 2
    assert len(sigs.first()["minhash_sig"]) == 128


def test_pairwise_pr_grid_matches_single_slices(spark):
    from outcite_duplicate_detecting_spark.operators.evaluate import (
        pairwise_pr,
        pairwise_pr_grid,
    )

    rows = [
        (1, "g1", "a"), (2, "g1", "a"), (3, "g1", "b"),
        (4, "g2", "b"), (5, "g2", "b"),
        (6, "g3", "c"),
    ]
    df = spark.createDataFrame(rows, "id long, gold string, label string")
    grid = [(1, None, None), (2, None, None), (1, 2, 2)]
    got = {
        (r["min_gold_size"], r["max_gold_size"], r["max_label_size"]): r
        for r in pairwise_pr_grid(df, grid).collect()
    }
    for mn, mxg, mxl in grid:
        single = pairwise_pr(
            df, min_gold_size=mn, max_gold_size=mxg, max_label_size=mxl
        ).collect()[0]
        g = got[(mn, mxg, mxl)]
        for c in ("t_mass", "p_mass", "tp_mass", "precision_ppm", "recall_ppm", "f1_ppm"):
            assert g[c] == single[c], (mn, mxg, mxl, c, g[c], single[c])


def test_ann_ivf_matches_numpy_ivf(spark):
    """IVF-Flat vs an independent numpy recomputation of the exact same
    semantics (sampled centroids, argmax-cosine assignment with centroid-id
    tie-break, n_probe cells, exact in-cell top-k); and the degenerate
    1-cell/1-probe config equals brute-force kNN."""
    from outcite_duplicate_detecting_spark.operators.similarity import (
        AnnIvfConfig,
        ann_ivf_cosine,
    )

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(50)], "vec_id long, embedding array<float>"
    )
    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_cells, n_probe, k = 8, 3, 4
    got = ann_ivf_cosine(df, q, AnnIvfConfig(n_cells=n_cells, n_probe=n_probe, k=k)).collect()

    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    cos = (v @ v.T) / np.outer(norms, norms)
    cent = list(range(n_cells))  # sampled centroids = smallest ids
    assign = {
        i: min(cent, key=lambda c: (-cos[i, c], c)) for i in range(50)
    }
    for qid in range(3):
        probed = sorted(cent, key=lambda c: (-cos[qid, c], c))[:n_probe]
        cands = [i for i in range(50) if assign[i] in probed and i != qid]
        want = sorted(cands, key=lambda j: (-cos[qid, j], j))[:k]
        mine = sorted(
            [(r["rank"], r["neighbor_id"]) for r in got if r["query_id"] == qid]
        )
        assert [n for _, n in mine] == want, qid

    # degenerate config: one cell probed = exact brute-force kNN
    got1 = ann_ivf_cosine(df, q, AnnIvfConfig(n_cells=1, n_probe=1, k=k)).collect()
    brute = knn_cosine_brute(df, q, k=k).collect()
    as_set = lambda rows: {(r["query_id"], r["rank"], r["neighbor_id"]) for r in rows}
    assert as_set(got1) == as_set(brute)


def test_stream_dedup_first_seen_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState dedup-on-arrival: dup_rank continues across
    a query RESTART (state recovered from the checkpointed state store),
    so a text first seen in batch 1 is flagged duplicate in batch 2."""
    from datetime import datetime, timedelta

    from outcite_duplicate_detecting_spark.streaming.incremental import (
        stream_dedup_first_seen,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    t0 = datetime(2020, 1, 1)
    batch1 = spark.createDataFrame(
        [
            ("u1", t0, None, "shared text", "en"),
            ("u2", t0 + timedelta(minutes=1), None, "shared text", "en"),
            ("u3", t0, None, "unique one", "en"),
        ],
        schema,
    )
    batch1.write.mode("append").parquet(src)
    q = stream_dedup_first_seen(spark, src, out, ck)
    q.awaitTermination(180)

    got1 = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert got1["u1"]["dup_rank"] == 0 and not got1["u1"]["is_duplicate"]
    assert got1["u2"]["dup_rank"] == 1 and got1["u2"]["is_duplicate"]
    assert got1["u3"]["dup_rank"] == 0

    # restart with new files: state must carry over
    batch2 = spark.createDataFrame(
        [
            ("u4", t0, None, "shared text", "en"),
            ("u5", t0, None, "brand new", "en"),
        ],
        schema,
    )
    batch2.write.mode("append").parquet(src)
    q2 = stream_dedup_first_seen(spark, src, out, ck)
    q2.awaitTermination(180)
    got2 = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert got2["u4"]["dup_rank"] == 2 and got2["u4"]["is_duplicate"]
    assert got2["u5"]["dup_rank"] == 0 and not got2["u5"]["is_duplicate"]
