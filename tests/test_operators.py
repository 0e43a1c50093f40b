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


LANG_FIXTURES = {
    "default": [
        "The quick brown fox jumps over the lazy dog and runs into the forest.",
        "This paper was presented at the international conference on machine learning.",
        "We introduce a new method for detecting duplicate documents in web archives.",
        "In this section we describe the experimental setup and evaluation metrics used.",
    ],
    "de": [
        "Der schnelle braune Fuchs springt über den faulen Hund und läuft in den Wald.",
        "Diese Arbeit wurde auf der internationalen Konferenz vorgestellt und diskutiert.",
        "Wir stellen eine neue Methode zur Erkennung von doppelten Dokumenten vor.",
    ],
    "fr": [
        "Le renard brun rapide saute par-dessus le chien paresseux et court dans la forêt.",
        "Cet article a été présenté lors de la conférence internationale sur l'apprentissage.",
        "Nous présentons une nouvelle méthode pour détecter les documents en double.",
    ],
    "es": [
        "El rápido zorro marrón salta sobre el perro perezoso y corre hacia el bosque.",
        "Este artículo fue presentado en la conferencia internacional de aprendizaje automático.",
        "Presentamos un nuevo método para detectar documentos duplicados en archivos web.",
    ],
    "it": [
        "La rapida volpe marrone salta sopra il cane pigro e corre nella foresta.",
        "Questo articolo è stato presentato alla conferenza internazionale di apprendimento.",
        "Presentiamo un nuovo metodo per rilevare documenti duplicati negli archivi web.",
    ],
    "ru": [
        "Быстрая коричневая лиса прыгает через ленивую собаку и бежит в лес.",
        "Эта статья была представлена на международной конференции по машинному обучению.",
        "Мы представляем новый метод обнаружения дубликатов документов в веб-архивах.",
    ],
}


def test_language_id_multilingual_accuracy(spark):
    """Planted fixtures in every collapse-set language (reference set
    {de,fr,ru,es,it,default}, B2_process_features.py:125-132): the trigram
    multinomial must classify all of them, plus degenerate inputs →
    'default'."""
    rows = [
        (f"{want}:{i}", t)
        for want, texts in LANG_FIXTURES.items()
        for i, t in enumerate(texts)
    ] + [("deg:empty", ""), ("deg:null", None), ("deg:junk", "xq zr vw")]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r["lang_pred"] for r in language_id(df).collect()}
    for key, pred in got.items():
        want = key.split(":")[0]
        if want == "deg":
            assert pred == "default", (key, pred)
        else:
            assert pred == want, (key, pred)


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


def test_multimodal_real_decode_with_codec(spark):
    """Real decode path — runs only where Pillow is installed (skipped in
    this container); valid PNGs decode to a normalized intensity
    histogram, corrupt payloads come back decode_ok=false (drop-accounted,
    not raised)."""
    PIL = pytest.importorskip("PIL")
    import io

    buf = io.BytesIO()
    PIL.Image.new("L", (4, 4), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(png), 4, 4, 0),
         (2, "image/png", bytearray(b"corrupt"), 0, 0, 0)],
        "media_id long, modality string, content binary, meta_width int, "
        "meta_height int, meta_duration_ms int",
    )
    rows = {r["media_id"]: r for r in
            extract_features(media, feature_dim=8, deterministic_fake=False).collect()}
    assert rows[1]["decode_ok"] and abs(sum(rows[1]["feature"]) - 1.0) < 1e-6
    assert rows[1]["feature"][4] == 1.0  # all 16 px = 128 -> bin 4 of 8
    assert not rows[2]["decode_ok"] and rows[2]["feature"] is None


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
    ivf = ann_ivf_cosine(df, q, AnnIvfConfig(n_cells=n_cells, n_probe=n_probe, k=k))
    # default centroids must come from a distributed TakeOrdered (orderBy +
    # limit), never a global single-partition sort/window over the table
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan
    got = ivf.collect()

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


def test_ann_ivf_trained_centroids(spark):
    """The centroids= injection path with a REAL trained coarse quantizer
    (pyspark.ml KMeans cluster centers): results must re-rank exactly (every
    returned cos_ppm equals the brute-force value for that pair) and recall
    vs brute-force top-k must clear the bar a trained quantizer is used
    for. Skips when pyspark.ml (mllib jar) is unavailable."""
    pytest.importorskip("pyspark.ml")
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except Exception:  # pragma: no cover - environment dependent
        pytest.skip("pyspark.ml unavailable")
    from outcite_duplicate_detecting_spark.operators.similarity import (
        AnnIvfConfig,
        ann_ivf_cosine,
    )

    rng = np.random.RandomState(11)
    # 4 well-separated gaussian blobs -> KMeans finds real structure
    centers = rng.standard_normal((4, 8)) * 4
    vecs = np.concatenate(
        [centers[i % 4] + 0.3 * rng.standard_normal(8) for i in range(60)]
    ).reshape(60, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = df.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    km = KMeans(k=4, seed=3, featuresCol="_features").fit(
        df.withColumn("_features", array_to_vector("embedding"))
    )
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())],
        "centroid_id long, centroid_vec array<double>",
    )
    k = 4
    got = ann_ivf_cosine(
        df, q, AnnIvfConfig(n_cells=4, n_probe=2, k=k), centroids=cents
    ).collect()
    brute = knn_cosine_brute(df, q, k=k).collect()
    brute_by_q: dict[int, list] = {}
    brute_cos = {}
    for r in brute:
        brute_by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        brute_cos[(r["query_id"], r["neighbor_id"])] = r["cos_ppm"]
    hits = total = 0
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_cos:  # exact re-rank: identical cosine arithmetic
            assert r["cos_ppm"] == brute_cos[key], key
    for qid, want in brute_by_q.items():
        found = {r["neighbor_id"] for r in got if r["query_id"] == qid}
        hits += len(found & set(want))
        total += len(want)
    # blob data + trained centroids + 2-of-4 probes: near-total recall
    assert hits / total >= 0.9, f"recall {hits}/{total}"


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


def test_whitespace_lm_matches_reference_generator(spark):
    """Context counts equal an independent python re-implementation of the
    reference generator (M_train_whitespace_LM.py:36-45: across = last/
    first nchar of consecutive words, within = every in-word split)."""
    from collections import Counter

    from outcite_duplicate_detecting_spark.operators.whitespace_lm import whitespace_lm

    texts = [
        "The qui\nck brown fox",
        "jumps OVER the lazy\r\ndog again",
        "a ab abc abcd",
        "",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["across"], r["h"], r["w"]): r["freq"]
        for r in whitespace_lm(df, nchar=3, min_freq=1).collect()
    }
    c = Counter()
    for t in texts:
        words = (t or "").replace("\n", " ").replace("\r", " ").lower().split()
        for i in range(1, len(words)):
            c[(True, words[i - 1][-3:], words[i][:3])] += 1
        for word in words:
            for i in range(1, len(word)):
                c[(False, word[:i][-3:], word[i:][:3])] += 1
    assert got == dict(c)


def test_whitespace_lm_p_separate_decisions(spark):
    """Train on a corpus where 'foo bar' is always separated and 'qux'
    splits only within-word; the scorer must mirror the reference's
    check_sep rule (separate iff p > 0.01, together iff p < 0.01)."""
    from outcite_duplicate_detecting_spark.operators.whitespace_lm import (
        p_separate,
        whitespace_lm,
    )

    corpus = spark.createDataFrame(
        [("foo bar baz foo bar",), ("quxquxqux zap",), ("foo bar",)], "text string"
    )
    model = whitespace_lm(corpus, nchar=3, min_freq=1)
    pairs = spark.createDataFrame(
        [("foo", "bar"), ("quxq", "uxqux"), ("zz", "yy")], "w1 string, w2 string"
    )
    got = {(r["w1"], r["w2"]): r for r in p_separate(pairs, model, nchar=3).collect()}
    assert got[("foo", "bar")]["decision"] == "separate"
    # 'q' + 'uxq' boundary has within-word evidence only -> p_sep == 0
    assert got[("quxq", "uxqux")]["p_separate_ppm"] == 0
    assert got[("quxq", "uxqux")]["decision"] == "together"
    # never-seen context: sep = 0 -> p = 0 -> 'together' (reference rule:
    # prob_sep returns [0, 0.01] and 0 < 0.01)
    assert got[("zz", "yy")]["decision"] == "together"

    # exact=False (double-precision, for beyond-decimal(38,0) corpora) must
    # agree with the exact path on this small model — identical ppm floors
    # away from 2^-52-of-a-boundary corner cases, identical decisions
    approx = {
        (r["w1"], r["w2"]): r
        for r in p_separate(pairs, model, nchar=3, exact=False).collect()
    }
    for key, r in got.items():
        assert approx[key]["p_separate_ppm"] == r["p_separate_ppm"], key
        assert approx[key]["decision"] == r["decision"], key


def test_whitespace_lm_overflow_guard(spark):
    """p_separate(exact=True) must FAIL LOUDLY (not NULL-ppm silently) when
    the trained model's frequencies would overflow decimal(38,0) — the
    10^12-doc scale case; exact=False handles the same model fine."""
    from outcite_duplicate_detecting_spark.operators.whitespace_lm import p_separate

    huge = 10**13
    model = spark.createDataFrame(
        [
            (True, "foo", "bar", huge),   # fh = fw = 1e13
            (True, "xxx", "yyy", huge),
            (False, "foo", "bar", huge),  # SUM1 = 3e13
            (False, "aaa", "bbb", 2 * huge),
        ],
        "across boolean, h string, w string, freq long",
    )
    pairs = spark.createDataFrame([("foo", "bar")], "w1 string, w2 string")
    with pytest.raises(ValueError, match="overflow decimal"):
        p_separate(pairs, model, nchar=3).collect()
    row = p_separate(pairs, model, nchar=3, exact=False).collect()[0]
    # sep = 1e13*1e13*3e13 = 3e39, tog = 1e13*(2e13)^2 = 4e39 -> p ~ 0.4286
    assert row["decision"] == "separate"
    assert abs(row["p_separate_ppm"] - 428_571) <= 1
