"""Driver contract: entry / queries / oracle_sql.

``entry`` runs the flagship end-to-end dedup pipeline on sf0.001.
``queries`` registers every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup family, similarity search, text
analysis, multimodal plumbing); ``oracle_sql`` carries the DuckDB twin for
every SQL-expressible one. Column names and exact arithmetic (integer ppm
ratios, decimal sums) are aligned on both sides so the driver's
order-insensitive value-hash matches.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.functions.text import (
    duck_char_ngrams,
    duck_word_shingles,
)
from outcite_duplicate_detecting_spark.operators import dedup as _dedup
from outcite_duplicate_detecting_spark.operators import textstats as _ts
from outcite_duplicate_detecting_spark.operators.classify import (
    LogisticPairScorer,
    score_pairs,
)
from outcite_duplicate_detecting_spark.operators.components import connected_components
from outcite_duplicate_detecting_spark.operators.evaluate import pairwise_pr
from outcite_duplicate_detecting_spark.operators.minhash import (
    MinHashConfig,
    minhash_lsh_pairs,
)
from outcite_duplicate_detecting_spark.operators.multimodal import extract_features
from outcite_duplicate_detecting_spark.operators.similarity import (
    AnnLshConfig,
    ann_lsh_cosine,
    knn_cosine_brute,
)
from outcite_duplicate_detecting_spark.operators.simhash import SimHashConfig, simhash_pairs
from outcite_duplicate_detecting_spark.operators.substring import (
    SubstringConfig,
    substring_pairs,
)
from outcite_duplicate_detecting_spark.plans.pipeline import PipelineConfig, dedup_pipeline
from outcite_duplicate_detecting_spark.sources.tables import documents_as_pages, load_table

JACCARD_THRESHOLD = 0.8
SHINGLE_N = 3

# committed parquet of per-candidate-pair SequenceMatcher ingredients
# (tools/make_pairverify_fixture.py) — the pairwise_verify oracle's
# difflib stand-in; path resolved relative to this file so the oracle SQL
# works from any checkout location
_PAIRVERIFY_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "pairverify_overlaps.parquet"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-duplicate clustering pipeline on sf0.001."""
    pages = documents_as_pages(spark, "/root/testdata/sf0.001")
    return dedup_pipeline(spark, pages, PipelineConfig(), run_id="entry")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------- queries

def q_group_count(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def q_filter_project(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.where((F.col("n_chars").between(100, 300)) & (F.col("lang") == "en")).select(
        "doc_id", "source", "n_chars"
    )


def q_topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
        .select("lang", "doc_id", "n_chars", "rn")
    )


def q_agg_lineitem(spark, sf_dir):
    # money/quantity as exact integer cents: decimal cast is exact on 2dp
    # inputs and the integer sum hash-matches across engines
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents("l_quantity")).cast("long").alias("sum_qty_cents"),
        F.sum(cents("l_extendedprice")).cast("long").alias("sum_price_cents"),
        F.count("*").cast("long").alias("n_rows"),
    )


def q_join_revenue_by_nation(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(cents).cast("long").alias("revenue_cents"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


def q_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; route through ltz (session TZ pinned UTC)
    # so epoch seconds equal DuckDB's epoch() over the naive value
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events")
    )


def q_histogram(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("source")
        .agg(F.count("*").alias("group_size"))
        .groupBy("group_size")
        .agg(F.count("*").cast("long").alias("n_groups"))
        .select(F.col("group_size").cast("long"), "n_groups")
    )


def q_dedup_exact(spark, sf_dir):
    """Exact (byte-identical) dedup. The sf corpora carry no byte-identical
    texts, which made this row vacuously green (r4 verdict) — so the query
    deterministically plants replicas (every doc_id % 20 == 0 re-keyed at
    +1e6, same bytes) before collapsing; the oracle plants identically.
    The operator itself is also pytest-covered on planted dups."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.where(F.col("doc_id") % 20 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return _dedup.exact_duplicates(d.unionByName(planted)).select(
        "text_sha", F.col("freq").cast("long"), "canonical_id"
    )


def q_dedup_jaccard(spark, sf_dir):
    return _dedup.jaccard_pairs(
        _docs(spark, sf_dir), n=SHINGLE_N, threshold=JACCARD_THRESHOLD
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    verified, _drops = minhash_lsh_pairs(
        _docs(spark, sf_dir),
        MinHashConfig(shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD),
    )
    return verified


def q_dedup_simhash(spark, sf_dir):
    verified, _drops = simhash_pairs(_docs(spark, sf_dir), SimHashConfig())
    return verified


def q_dedup_substring(spark, sf_dir):
    verified, _drops = substring_pairs(_docs(spark, sf_dir), SubstringConfig())
    return verified


def q_connected_components(spark, sf_dir):
    d = _docs(spark, sf_dir)
    edges = _dedup.jaccard_pairs(d, n=SHINGLE_N, threshold=JACCARD_THRESHOLD)
    return connected_components(
        edges,
        src="id1",
        dst="id2",
        nodes=d.select(F.col("doc_id").alias("id")),
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("component_id"))


def q_text_quality(spark, sf_dir):
    return _ts.text_quality(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_chars_txt",
        "n_tokens",
        "punct_ppm",
        "stopword_ppm",
        "distinct_ppm",
        "mean_token_len_ppm",
        "quality_score",
    )


def q_language_id(spark, sf_dir):
    return _ts.language_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_token_count(spark, sf_dir):
    return _ts.token_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_alpha_tokens", "n_distinct_tokens"
    )


def q_whitespace_lm(spark, sf_dir):
    """Whitespace-LM context trainer (ref M_train_whitespace_LM.py:25-61):
    (across, h, w) 3-char context counts as one distributed groupBy."""
    from outcite_duplicate_detecting_spark.operators.whitespace_lm import whitespace_lm

    return whitespace_lm(_docs(spark, sf_dir), nchar=3, min_freq=2)


def q_doc_fingerprint(spark, sf_dir):
    return _ts.doc_fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def q_knn_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_cosine_brute(emb, queries_df, k=5)


def q_ann_lsh_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # short codes + more tables: the testdata embeddings have no strong
    # planted neighbors (max cos ≈ 0.4), so recall needs OR-amplification
    return ann_lsh_cosine(emb, queries_df, AnnLshConfig(n_planes=6, n_tables=12, k=5))


def q_ann_ivf_cosine(spark, sf_dir):
    """IVF-Flat ANN (sampled coarse centroids, n_probe cell fan-out,
    exact in-cell re-rank) — the scale path for similarity search."""
    from outcite_duplicate_detecting_spark.operators.similarity import (
        AnnIvfConfig,
        ann_ivf_cosine,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_ivf_cosine(emb, queries_df, AnnIvfConfig(n_cells=16, n_probe=4, k=5))


def q_eval_pairwise_pr(spark, sf_dir):
    d = _docs(spark, sf_dir)
    labels = q_connected_components(spark, sf_dir)
    assign = d.select("doc_id", F.col("source").alias("gold")).join(
        labels.select("doc_id", F.col("component_id").alias("label")), "doc_id"
    )
    return pairwise_pr(assign, id_col="doc_id", gold_col="gold", label_col="label")


def q_cluster_logistic(spark, sf_dir):
    pairs = _dedup.jaccard_pairs(
        _docs(spark, sf_dir), n=SHINGLE_N, threshold=0.5
    )
    return score_pairs(pairs, LogisticPairScorer(weights={"jaccard": 12.0})).select(
        "id1", "id2", "score_ppm", "is_equivalent"
    )


def q_majority_vote(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("majority_lang"), F.col("n").cast("long").alias("votes"))
    )


def q_top_terms(spark, sf_dir):
    from outcite_duplicate_detecting_spark.functions.text import words

    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    counts = (
        d.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 20)
        .select("term", F.col("freq").cast("long"), "rank")
    )


def q_multimodal_features(spark, sf_dir):
    d = _docs(spark, sf_dir)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-blob").alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.lit(0).alias("meta_width"),
        F.lit(0).alias("meta_height"),
        F.lit(0).alias("meta_duration_ms"),
    )
    return extract_features(media, feature_dim=8).select("media_id", "modality", "n_bytes")


def q_incremental_newrows(spark, sf_dir):
    from outcite_duplicate_detecting_spark.streaming.incremental import incremental_new_rows

    d = _docs(spark, sf_dir)
    manifest = d.where(F.pmod(F.col("doc_id"), F.lit(3)) == 0).select("doc_id")
    return incremental_new_rows(d, manifest, key="doc_id").select("doc_id", "source")


def q_containment_join(spark, sf_dir):
    """Poset set-containment join (SURVEY §2.3): word-set(A) ⊆ word-set(B)."""
    from outcite_duplicate_detecting_spark.functions.text import words
    from outcite_duplicate_detecting_spark.operators.containment import containment_pairs

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"), words("text").alias("features")
    )
    return containment_pairs(d)


def q_minimal_elements(spark, sf_dir):
    """Min-el reduction (SURVEY §2.9): subsets that are nobody's superset."""
    from outcite_duplicate_detecting_spark.functions.text import words
    from outcite_duplicate_detecting_spark.operators.containment import (
        containment_pairs,
        minimal_elements,
    )

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"), words("text").alias("features")
    )
    return minimal_elements(containment_pairs(d)).select(F.col("id").alias("doc_id"))


def q_paired_years(spark, sf_dir):
    """Reference year1/year2 encoding (B2_process_features.py:202-203)."""
    from outcite_duplicate_detecting_spark.functions.textnorm import paired_years

    ev = load_table(spark, sf_dir, "events")
    y = F.year(F.col("ts").cast("timestamp_ltz"))
    y1, y2 = paired_years(y)
    return (
        ev.select(
            "event_id", y.cast("int").alias("year"), y1.alias("year1"), y2.alias("year2")
        )
    )


def q_rep_id(spark, sf_dir):
    """Canonicalized representation id (bundle + digest; the reference uses
    SHA-1 — md5 here because the DuckDB oracle lacks sha1; same semantics)."""
    from outcite_duplicate_detecting_spark.functions.textnorm import bundle

    d = _docs(spark, sf_dir)
    b = bundle(["lang", "source"])
    return d.select(
        "doc_id",
        F.md5(F.array_join(b, "#+*", null_replacement="None")).alias("rep_id"),
    )


def q_spell_correct(spark, sf_dir):
    """SymSpell-style token correction against a corpus-derived dictionary
    (top-100 terms). Oracle: brute-force argmin-levenshtein in DuckDB —
    symmetric-deletion retrieval is exact for Levenshtein ≤ cap, so the two
    agree identically. Output counts corrected occurrences per doc."""
    from outcite_duplicate_detecting_spark.functions.spell import (
        SymSpellIndex,
        correct_tokens_udf,
    )
    from outcite_duplicate_detecting_spark.functions.text import words

    d = _docs(spark, sf_dir)
    top = (
        d.select(F.explode(words("text")).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), F.asc("t"))
        .limit(100)
        .collect()
    )
    idx = SymSpellIndex({r["t"]: r["count"] for r in top}, max_edits=2)
    toks = words("text").alias("a")
    corrected = correct_tokens_udf(idx)(words("text")).alias("b")
    zipped = F.arrays_zip(toks, corrected)
    n_changed = F.size(F.filter(zipped, lambda s: s["a"] != s["b"]))
    return d.select(
        "doc_id",
        F.size(words("text")).cast("long").alias("n_tokens"),
        n_changed.cast("long").alias("n_corrected"),
    )


def q_canonical_merge(spark, sf_dir):
    """Reference stage 4: one canonical record per multi-member cluster
    (4_index_duplicates.py:188-254) — longest text wins, member list kept."""
    from outcite_duplicate_detecting_spark.plans.writeback import (
        build_duplicates_table,
    )

    d = _docs(spark, sf_dir)
    labels = q_connected_components(spark, sf_dir)
    assignments = labels.select("doc_id", F.col("component_id").alias("cluster_id"))
    dups = build_duplicates_table(assignments, d.select("doc_id", "text"))
    return dups.select(
        "cluster_id",
        "canonical_id",
        F.col("n_members").cast("long").alias("n_members"),
        F.array_join(F.col("member_ids"), ",").alias("members"),
    )


def q_writeback_roundtrip(spark, sf_dir):
    """Reference stage 5 writeback THROUGH the MERGE-upsert parquet sink:
    canonical text replaces every duplicate member's text (original kept
    as text_original), then the updates MERGE into a copy of the source
    table and the result is read back (5_update_references.py:56-116 +
    the streaming_bulk partial-update analogue)."""
    import tempfile

    from outcite_duplicate_detecting_spark.plans.writeback import (
        build_duplicates_table,
        merge_upsert_parquet,
        writeback_canonical,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    labels = q_connected_components(spark, sf_dir)
    assignments = labels.select("doc_id", F.col("component_id").alias("cluster_id"))
    dups = build_duplicates_table(assignments, d)
    wb = writeback_canonical(d, assignments, dups)
    target = tempfile.mkdtemp(prefix="wb_roundtrip_") + "/docs"
    # the target table carries the stage-5 bookkeeping columns up front
    # (the reference's references index has them; MERGE fills them in)
    d.select(
        "doc_id",
        "text",
        F.lit(None).cast("string").alias("text_original"),
        F.lit(None).cast("long").alias("duplicate_of"),
        F.lit(False).alias("is_canonical"),
    ).write.mode("overwrite").parquet(target)
    updates = wb.select(
        "doc_id", "text", "text_original", "duplicate_of", "is_canonical"
    )
    merge_upsert_parquet(spark, target, updates, key_cols=["doc_id"])
    out = spark.read.parquet(target)
    return out.select(
        "doc_id",
        "text",
        "text_original",
        "duplicate_of",
        F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
    )


def q_canonical_fields(spark, sf_dir):
    """NULL-wildcard majority vote (reference majority_vote,
    4_index_duplicates.py:122-133): winning (lang, bucket) tuple per source
    group, where bucket is NULL for some rows to exercise the wildcard."""
    from outcite_duplicate_detecting_spark.operators.canonicalize import (
        majority_vote_wildcard,
    )

    d = _docs(spark, sf_dir).select(
        F.col("source").alias("cluster_id"),
        F.col("lang").alias("f_lang"),
        F.when(F.pmod("n_chars", F.lit(7)) >= 2, F.pmod("n_chars", F.lit(3)).cast("string")).alias(
            "f_bucket"
        ),
    )
    return majority_vote_wildcard(d, "cluster_id", ["f_lang", "f_bucket"]).select(
        "cluster_id",
        "f_lang",
        "f_bucket",
        F.col("support").cast("long").alias("support"),
    )


def q_generalize_expand(spark, sf_dir):
    """Generalization-lattice fan-out (generalize_representations.py:101-115)
    with a 2-ftype scheme: every (lang, source) row expands to its two
    1-field generalizations."""
    from outcite_duplicate_detecting_spark.operators.generalize import (
        GeneralizationScheme,
        generalize_expand,
    )

    scheme = GeneralizationScheme(
        groups={"lang": ["lang"], "src": ["source"]},
        rules={(1, 1): [(1, 0), (0, 1)]},
        restrictions=[["lang", "source"]],
    )
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    return generalize_expand(d, scheme, id_col="doc_id")


def q_specify_surrogates(spark, sf_dir):
    """Surrogate-key specification (specify_mentions.py:15-23): rows whose
    restriction columns are all NULL get their own id as the feature."""
    from outcite_duplicate_detecting_spark.operators.generalize import (
        specify_surrogates,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.nullif("lang", F.lit("en")).alias("f1")
    )
    return specify_surrogates(d, [["f1"]], id_col="doc_id")


def _wordset_containment(spark, sf_dir):
    from outcite_duplicate_detecting_spark.functions.text import words
    from outcite_duplicate_detecting_spark.operators.containment import (
        containment_pairs,
        minel_superset_edges,
    )

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"), words("text").alias("features")
    )
    pairs = containment_pairs(d)
    return d, minel_superset_edges(pairs)


def q_minel_stats(spark, sf_dir):
    """Min-el fan-in diagnostics (find_components_disk.py:224-250)."""
    from outcite_duplicate_detecting_spark.operators.containment import (
        minel_fanin_stats,
    )

    _, edges = _wordset_containment(spark, sf_dir)
    return minel_fanin_stats(edges)


def q_lattice_recall(spark, sf_dir):
    """Micro/macro lattice reachability recall
    (evaluate_minels_v3.py:158-200), gold = source."""
    from outcite_duplicate_detecting_spark.operators.containment import (
        lattice_pair_recall,
        minimal_elements,
    )
    from outcite_duplicate_detecting_spark.functions.text import words
    from outcite_duplicate_detecting_spark.operators.containment import (
        containment_pairs,
        minel_superset_edges,
    )

    d = _docs(spark, sf_dir)
    feats = d.select(F.col("doc_id").alias("id"), words("text").alias("features"))
    pairs = containment_pairs(feats)
    edges = minel_superset_edges(pairs)
    minels = minimal_elements(pairs)
    nodes = minels.join(
        d.select(F.col("doc_id").alias("id"), F.col("source").alias("gold")), "id"
    )
    return lattice_pair_recall(edges, nodes)


def q_gold_labels(spark, sf_dir):
    """Gold-link bipartite join → goldID (B3_add_goldID.py:38-74); the
    synthetic target id is the source collection, so gold groups equal
    source groups — output maps each doc to its group's min doc_id."""
    from outcite_duplicate_detecting_spark.operators.goldlinks import gold_labels

    d = _docs(spark, sf_dir).select("doc_id", "source")
    lab = gold_labels(d, "doc_id", ["source"])
    reps = lab.groupBy("gold_id").agg(F.min("doc_id").alias("gold_rep"))
    return lab.join(reps, "gold_id").select("doc_id", "gold_rep")


def q_eval_grid(spark, sf_dir):
    """The reference evaluation grid (8a_evaluate_all.sh:14-31): pairwise
    P/R over size slices, one pass for all slices."""
    from outcite_duplicate_detecting_spark.operators.evaluate import (
        pairwise_pr_grid,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.col("source").alias("gold"), F.col("lang").alias("label")
    )
    grid = [(1, None, None), (2, None, None), (1, 30, 1000)]
    return pairwise_pr_grid(d, grid, id_col="doc_id")


def q_best_rep(spark, sf_dir):
    """Weighted top-grams + best-representative selection (reference
    4_index_duplicates.py:71-99): per source group, the 40-char text prefix
    whose char-3-gram set maximizes Jaccard with the group's top grams."""
    from outcite_duplicate_detecting_spark.operators.bestrep import (
        best_representative,
        weighted_top_grams,
    )

    d = _docs(spark, sf_dir)
    values = d.select(
        F.col("source").alias("cluster_id"),
        F.substring("text", 1, 40).alias("value"),
    )
    top = weighted_top_grams(
        values, group_col="cluster_id", value_col="value", n=3, min_share_ppm=10_000
    )
    return best_representative(
        values, top, group_col="cluster_id", value_col="value", n=3
    ).select(
        "cluster_id",
        "best_value",
        F.col("inter_size").cast("long").alias("inter_size"),
        F.col("value_gram_size").cast("long").alias("value_gram_size"),
    )


def q_melt_attrs(spark, sf_dir):
    """flatten/pairfy (3_update_duplicateIDs.py:153-183): nested record →
    long-format attribute-value pairs, one schema-driven explode."""
    from outcite_duplicate_detecting_spark.operators.reshape import melt_attrs

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.struct(
            F.col("lang"),
            F.col("source"),
            F.struct(F.col("n_chars").alias("chars")).alias("meta"),
        ).alias("rec"),
    )
    return melt_attrs(d, "doc_id", "rec")


def q_clean_int(spark, sf_dir):
    """Integer-range clean (4_index_duplicates.py:102-119) over event years."""
    from outcite_duplicate_detecting_spark.functions.textnorm import clean_int

    ev = load_table(spark, sf_dir, "events")
    y = F.year(F.col("ts").cast("timestamp_ltz")).cast("string")
    return ev.select(
        "event_id", clean_int(y, 2020, 2022).alias("year_clean")
    )


def q_gold_histogram(spark, sf_dir):
    """Gold component-size histogram (core_goldstandard.py:106-109) over
    the source-derived gold groups."""
    from outcite_duplicate_detecting_spark.sources.gold import (
        component_size_histogram,
    )

    labels = q_gold_labels(spark, sf_dir).select(
        "doc_id", F.col("gold_rep").alias("gold_id")
    )
    return component_size_histogram(labels)


def q_chargrams(spark, sf_dir):
    """Per-word ascii-context char-4-grams (B2_process_features.py:134-142),
    non-distinct, short words contribute nothing."""
    from outcite_duplicate_detecting_spark.functions.wordnorm import (
        chargrams_per_word,
    )

    d = _docs(spark, sf_dir)
    g = chargrams_per_word(F.col("text"), n=4)
    return d.select(
        "doc_id",
        F.size(g).cast("long").alias("n_grams"),
        F.element_at(g, 1).alias("first_gram"),
    )


_SECTION_STOPWORDS = ["the", "of", "and"]


def q_text_sections(spark, sf_dir):
    """Subtitle/stopword section split (B2_process_features.py:76-77,
    160-161): per doc, section count and first section."""
    from outcite_duplicate_detecting_spark.functions.textnorm import text_sections

    d = _docs(spark, sf_dir)
    sec = text_sections(F.col("text"), _SECTION_STOPWORDS)
    return d.select(
        "doc_id",
        F.size(sec).cast("long").alias("n_sections"),
        F.element_at(sec, 1).alias("first_section"),
    )


def q_gold_samples(spark, sf_dir):
    """Bounded equal/different gold pair sampling (reference get_samples,
    common.py:376-403) over source-derived gold groups; caps chosen so
    every cap binds at sf0.01."""
    from outcite_duplicate_detecting_spark.operators.evaluate import (
        gold_pair_samples,
    )

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.col("source").alias("gold")
    )
    return gold_pair_samples(
        d,
        max_equivs_per_gold_label=5,
        max_equivs=60,
        max_diffs_per_gold_pair=3,
        max_diffs=40,
    )


def q_pairwise_verify(spark, sf_dir):
    """Reference stage-3 rule classifier over within-cluster pairs
    (difflib distances → rows-only check)."""
    from outcite_duplicate_detecting_spark.operators.pairverify import (
        PairRules,
        verify_cluster_pairs,
    )

    d = _docs(spark, sf_dir)
    labels = q_connected_components(spark, sf_dir)
    docs = d.join(labels, "doc_id").select(
        "doc_id", F.col("component_id").alias("cluster_id"), "text"
    )
    multi = (
        docs.groupBy("cluster_id").count().where(F.col("count") > 1).select("cluster_id")
    )
    return verify_cluster_pairs(docs.join(multi, "cluster_id"), PairRules())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "group_count": q_group_count,
        "filter_project": q_filter_project,
        "topk_per_group": q_topk_per_group,
        "agg_lineitem": q_agg_lineitem,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "sessionize": q_sessionize,
        "histogram": q_histogram,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_substring": q_dedup_substring,
        "connected_components": q_connected_components,
        "text_quality": q_text_quality,
        "language_id": q_language_id,
        "token_count": q_token_count,
        "whitespace_lm": q_whitespace_lm,
        "doc_fingerprint": q_doc_fingerprint,
        "knn_cosine": q_knn_cosine,
        "ann_lsh_cosine": q_ann_lsh_cosine,
        "ann_ivf_cosine": q_ann_ivf_cosine,
        "eval_pairwise_pr": q_eval_pairwise_pr,
        "cluster_logistic": q_cluster_logistic,
        "majority_vote": q_majority_vote,
        "top_terms": q_top_terms,
        "multimodal_features": q_multimodal_features,
        "incremental_newrows": q_incremental_newrows,
        "containment_join": q_containment_join,
        "minimal_elements": q_minimal_elements,
        "paired_years": q_paired_years,
        "rep_id": q_rep_id,
        "spell_correct": q_spell_correct,
        "pairwise_verify": q_pairwise_verify,
        "canonical_merge": q_canonical_merge,
        "writeback_roundtrip": q_writeback_roundtrip,
        "canonical_fields": q_canonical_fields,
        "generalize_expand": q_generalize_expand,
        "specify_surrogates": q_specify_surrogates,
        "minel_stats": q_minel_stats,
        "lattice_recall": q_lattice_recall,
        "gold_labels": q_gold_labels,
        "chargrams": q_chargrams,
        "best_rep": q_best_rep,
        "eval_grid": q_eval_grid,
        "melt_attrs": q_melt_attrs,
        "clean_int": q_clean_int,
        "gold_histogram": q_gold_histogram,
        "text_sections": q_text_sections,
        "gold_samples": q_gold_samples,
    }


# ------------------------------------------------------------- oracle SQL

_SHINGLES = duck_word_shingles("text", SHINGLE_N)


def _simhash_oracle_sql() -> str:
    """DuckDB twin of the full simhash detector at SimHashConfig()
    defaults (word bigrams, wordhash kernel, hamming ≤ 7): FNV-1a 64 per
    word via list_reduce over code points (the testdata is ASCII, so code
    points equal UTF-8 bytes), the shifted-multiply gram combiner of
    hashing.hash_shingles_from_word_hashes, the strict-majority bit fold
    of hashing.simhash64, then brute-force bit_count(xor) ≤ k pairs — the
    band join is pigeonhole-exact, so the sets agree identically. 64-bit
    wraparound is emulated with HUGEINT intermediates mod 2^64."""
    offset, prime, m64 = 14695981039346656037, 1099511628211, 2**64
    fnv = (
        "list_reduce("
        f"list_prepend({offset}::HUGEINT, "
        "list_transform(range(1, length(w) + 1), i -> unicode(substring(w, i, 1))::HUGEINT)), "
        f"(h, b) -> (xor(h::UBIGINT, b::UBIGINT)::HUGEINT * {prime}) % {m64}::HUGEINT)"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {_WORDS} AS ws FROM documents
),
hashed AS (
  SELECT doc_id, len(ws) AS m,
         list_transform(ws, w -> ({fnv})::UBIGINT) AS wh
  FROM docs
),
sh AS (
  SELECT doc_id,
         CASE WHEN m = 0 THEN [{offset}::UBIGINT]
              WHEN m = 1 THEN [wh[1]]
              ELSE list_distinct(list_transform(range(1, m),
                i -> xor(((wh[i]::HUGEINT * {prime}) % {m64})::UBIGINT, wh[i + 1])))
         END AS hs
  FROM hashed
),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b::INT) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE 0 END) AS cnt,
         count(*) AS n
  FROM (SELECT doc_id, unnest(hs) AS h FROM sh), range(0, 64) t(b)
  GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id,
         sum(CASE WHEN cnt * 2 > n THEN (1::UBIGINT << b::INT)::HUGEINT ELSE 0::HUGEINT END) AS sig_u
  FROM bits GROUP BY doc_id
),
signed AS (
  SELECT doc_id,
         (CASE WHEN sig_u >= {m64 // 2}::HUGEINT THEN sig_u - {m64}::HUGEINT ELSE sig_u END)::BIGINT AS sig
  FROM sigs
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       bit_count(xor(a.sig, b.sig))::INT AS hamming_dist
FROM signed a JOIN signed b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 7
"""

_JACCARD_PAIRS = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS shingles FROM documents
),
sized AS (SELECT doc_id, shingles, len(shingles) AS sz FROM sh),
ex AS (SELECT doc_id, sz, unnest(shingles) AS shingle FROM sized),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sz AS sz1, b.sz AS sz2,
         count(*) AS inter_size
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id1, id2, inter_size::BIGINT AS inter_size,
       (sz1 + sz2 - inter_size)::BIGINT AS union_size
FROM inter
WHERE inter_size * 1000000 >= (sz1 + sz2 - inter_size) * {int(JACCARD_THRESHOLD * 1e6)}
"""

_CC = f"""
WITH RECURSIVE pairs AS ({_JACCARD_PAIRS}),
edges AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION SELECT id2, id1 FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS component_id
FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
"""

_WORDS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
_STOP_LIST = "[" + ",".join(f"'{s}'" for s in _ts.STOPWORDS_EN) + "]"


def _language_sql() -> str:
    # same trigram profiles + tie-break as operators/textstats.language_id;
    # trigrams are regenerated from LANG_TRIGRAMS so the two can't drift
    def lst(tris: list[str]) -> str:
        return "[" + ",".join("'" + t.replace("'", "''") + "'" for t in tris) + "]"

    scores = ",\n".join(
        f"count(*) FILTER (WHERE list_contains({lst(tris)}, gram)) AS s_{lang}"
        for lang, tris in _ts.LANG_TRIGRAMS.items()
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in _ts.LANG_TRIGRAM_ORDER) + ")"
    whens = "\n".join(
        f"WHEN best > 0 AND s_{lang} = best THEN '{lang}'"
        for lang in _ts.LANG_TRIGRAM_ORDER
    )
    return f"""
WITH norm AS (
  SELECT doc_id, ' ' || regexp_replace(lower(text), '\\s+', ' ', 'g') || ' ' AS n
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(length(n) - 2, 0) + 1),
                               i -> substr(n, i::INT, 3))) AS gram
  FROM norm
),
scored AS (
  SELECT doc_id, {scores}
  FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       CASE {whens} ELSE 'default' END AS lang_pred
FROM norm d LEFT JOIN (SELECT *, {best} AS best FROM scored) s USING (doc_id)
"""


def _eval_grid_slice_sql(mn: int, mxg, mxl) -> str:
    gcond = f"gsz >= {mn}" + (f" AND gsz <= {mxg}" if mxg is not None else "")
    lcond = f"lsz <= {mxl}" if mxl is not None else "TRUE"
    lit = lambda v: "NULL::BIGINT" if v is None else f"{v}::BIGINT"  # noqa: E731
    return f"""
      SELECT {mn}::BIGINT AS min_gold_size, {lit(mxg)} AS max_gold_size,
             {lit(mxl)} AS max_label_size, t_mass, p_mass, tp_mass,
             (CASE WHEN p_mass > 0 THEN tp_mass * 1000000 // p_mass ELSE 0 END)::BIGINT AS precision_ppm,
             (CASE WHEN t_mass > 0 THEN tp_mass * 1000000 // t_mass ELSE 0 END)::BIGINT AS recall_ppm,
             (CASE WHEN p_mass + t_mass > 0 THEN 2 * tp_mass * 1000000 // (p_mass + t_mass) ELSE 0 END)::BIGINT AS f1_ppm
      FROM (
        WITH sized AS (
          SELECT d.doc_id, d.source AS gold, d.lang AS label, g.gsz, l.lsz
          FROM documents d
          JOIN (SELECT source, count(*) AS gsz FROM documents GROUP BY source) g
            ON d.source = g.source
          JOIN (SELECT lang, count(*) AS lsz FROM documents GROUP BY lang) l
            ON d.lang = l.lang
        ),
        kept AS (SELECT * FROM sized WHERE {gcond} AND {lcond}),
        t AS (SELECT coalesce(sum(n * n), 0)::BIGINT AS t_mass
              FROM (SELECT count(*) AS n FROM kept GROUP BY gold)),
        p AS (SELECT coalesce(sum(n * n), 0)::BIGINT AS p_mass
              FROM (SELECT count(*) AS n FROM kept GROUP BY label)),
        tp AS (SELECT coalesce(sum(n * n), 0)::BIGINT AS tp_mass
               FROM (SELECT count(*) AS n FROM kept GROUP BY gold, label))
        SELECT t_mass, p_mass, tp_mass FROM t, p, tp
      )
    """


def oracle_sql() -> dict[str, str]:
    ppm = "CASE WHEN {den} > 0 THEN (({num}) * 1000000) // ({den}) ELSE 0 END"
    return {
        "group_count": "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang",
        "filter_project": (
            "SELECT doc_id, source, n_chars FROM documents "
            "WHERE n_chars BETWEEN 100 AND 300 AND lang = 'en'"
        ),
        "topk_per_group": """
            SELECT lang, doc_id, n_chars, rn::INT AS rn FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) t
            WHERE rn <= 3
        """,
        "agg_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   sum((l_quantity::DECIMAL(18,2) * 100)::BIGINT)::BIGINT AS sum_qty_cents,
                   sum((l_extendedprice::DECIMAL(18,2) * 100)::BIGINT)::BIGINT AS sum_price_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem GROUP BY 1, 2
        """,
        "join_revenue_by_nation": """
            SELECT n_name,
                   sum((o_totalprice::DECIMAL(18,2) * 100)::BIGINT)::BIGINT AS revenue_cents,
                   count(*)::BIGINT AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "sessionize": """
            WITH marked AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                          OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
              FROM marked
            )
            SELECT user_id, session_id, count(*)::BIGINT AS n_events
            FROM sess GROUP BY 1, 2
        """,
        "histogram": """
            SELECT group_size::BIGINT AS group_size, count(*)::BIGINT AS n_groups FROM (
              SELECT source, count(*) AS group_size FROM documents GROUP BY source) t
            GROUP BY group_size
        """,
        "dedup_exact": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
            )
            SELECT sha256(text) AS text_sha, count(*)::BIGINT AS freq,
                   min(doc_id) AS canonical_id
            FROM corpus GROUP BY sha256(text) HAVING count(*) > 1
        """,
        "dedup_jaccard": _JACCARD_PAIRS,
        "dedup_minhash_lsh": _JACCARD_PAIRS,
        "dedup_simhash": _simhash_oracle_sql(),
        "dedup_substring": """
            SELECT a.doc_id AS inner_id, b.doc_id AS outer_id
            FROM documents a JOIN documents b
              ON a.doc_id != b.doc_id
             AND length(a.text) >= 50
             AND strpos(b.text, a.text) > 0
        """,
        "connected_components": _CC,
        "text_quality": f"""
            WITH base AS (
              SELECT doc_id, text,
                     length(text)::BIGINT AS n_chars_txt,
                     len({_WORDS})::BIGINT AS n_tokens,
                     len(list_filter({_WORDS}, x -> list_contains({_STOP_LIST}, x)))::BIGINT AS stop_hits,
                     (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS punct,
                     coalesce(list_sum(list_transform({_WORDS}, x -> length(x))), 0)::BIGINT AS tok_chars,
                     len(list_distinct({_WORDS}))::BIGINT AS distinct_toks
              FROM documents
            )
            SELECT doc_id, n_chars_txt, n_tokens,
                   ({ppm.format(num='punct', den='n_chars_txt')})::BIGINT AS punct_ppm,
                   ({ppm.format(num='stop_hits', den='n_tokens')})::BIGINT AS stopword_ppm,
                   ({ppm.format(num='distinct_toks', den='n_tokens')})::BIGINT AS distinct_ppm,
                   ({ppm.format(num='tok_chars', den='n_tokens')})::BIGINT AS mean_token_len_ppm,
                   ((CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
                  + (CASE WHEN ({ppm.format(num='tok_chars', den='n_tokens')}) BETWEEN 3000000 AND 12000000 THEN 1 ELSE 0 END)
                  + (CASE WHEN ({ppm.format(num='punct', den='n_chars_txt')}) <= 100000 THEN 1 ELSE 0 END)
                  + (CASE WHEN ({ppm.format(num='distinct_toks', den='n_tokens')}) >= 100000 THEN 1 ELSE 0 END))::INT AS quality_score
            FROM base
        """,
        "language_id": _language_sql(),
        "token_count": f"""
            SELECT doc_id,
                   len({_WORDS})::BIGINT AS n_tokens,
                   len(list_filter({_WORDS}, x -> regexp_full_match(x, '[a-zà-ÿ]+')))::BIGINT AS n_alpha_tokens,
                   len(list_distinct({_WORDS}))::BIGINT AS n_distinct_tokens
            FROM documents
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents
        """,
        # whitespace-LM trainer: ACROSS = word-boundary contexts, WITHIN =
        # in-word split contexts; suffix() mirrors the Spark clamp
        # substr(s, greatest(len-2,1), 3) == python s[-3:]
        "whitespace_lm": """
            WITH norm AS (
              SELECT list_filter(
                       string_split_regex(lower(regexp_replace(text, '[\\n\\r]', ' ', 'g')), '\\s+'),
                       x -> x != '') AS ws
              FROM documents
            ),
            across AS (
              SELECT TRUE AS across,
                     substr(ws[(i-1)::INT], greatest(length(ws[(i-1)::INT]) - 2, 1)::INT, 3) AS h,
                     substr(ws[i::INT], 1, 3) AS w
              FROM (SELECT ws, unnest(range(2, len(ws) + 1)) AS i FROM norm)
            ),
            within AS (
              SELECT FALSE AS across,
                     substr(substr(word, 1, i::INT), greatest(i - 2, 1)::INT, 3) AS h,
                     substr(word, (i + 1)::INT, 3) AS w
              FROM (
                SELECT word, unnest(range(1, length(word))) AS i
                FROM (SELECT unnest(ws) AS word FROM norm)
              )
            )
            SELECT across, h, w, count(*)::BIGINT AS freq
            FROM (SELECT * FROM across UNION ALL SELECT * FROM within)
            GROUP BY across, h, w
            HAVING count(*) >= 2
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_sum(list_transform(range(1, len(e.embedding)+1),
                       i -> (q.qv[i]::DOUBLE) * (e.embedding[i]::DOUBLE)))
                     / (sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> (q.qv[i]::DOUBLE)^2)))
                      * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1), i -> (e.embedding[i]::DOUBLE)^2)))) AS cos
              FROM embeddings e, q WHERE e.vec_id != q.query_id
            )
            SELECT query_id, neighbor_id, rn::INT AS rank, floor(cos * 1000000)::BIGINT AS cos_ppm
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
                  FROM scored) t
            WHERE rn <= 5
        """,
        "ann_ivf_cosine": """
            WITH cos_base AS (
              SELECT vec_id, embedding FROM embeddings
            ),
            cent AS (
              SELECT vec_id AS centroid_id, embedding AS centroid_vec
              FROM embeddings ORDER BY vec_id LIMIT 16
            ),
            assign AS (
              SELECT vec_id AS neighbor_id, embedding AS cv, centroid_id FROM (
                SELECT e.vec_id, e.embedding, c.centroid_id,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_sum(list_transform(range(1, len(e.embedding)+1),
                           i -> (e.embedding[i]::DOUBLE) * (c.centroid_vec[i]::DOUBLE)))
                         / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1), i -> (e.embedding[i]::DOUBLE)^2)))
                          * sqrt(list_sum(list_transform(range(1, len(c.centroid_vec)+1), i -> (c.centroid_vec[i]::DOUBLE)^2)))) DESC,
                         c.centroid_id) AS rn
                FROM cos_base e, cent c) t
              WHERE rn = 1
            ),
            probes AS (
              SELECT query_id, qv, centroid_id FROM (
                SELECT e.vec_id AS query_id, e.embedding AS qv, c.centroid_id,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_sum(list_transform(range(1, len(e.embedding)+1),
                           i -> (e.embedding[i]::DOUBLE) * (c.centroid_vec[i]::DOUBLE)))
                         / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1), i -> (e.embedding[i]::DOUBLE)^2)))
                          * sqrt(list_sum(list_transform(range(1, len(c.centroid_vec)+1), i -> (c.centroid_vec[i]::DOUBLE)^2)))) DESC,
                         c.centroid_id) AS rn
                FROM cos_base e, cent c
                WHERE e.vec_id < 5) t
              WHERE rn <= 4
            ),
            cand AS (
              SELECT DISTINCT p.query_id, a.neighbor_id, p.qv, a.cv
              FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
              WHERE a.neighbor_id != p.query_id
            ),
            scored AS (
              SELECT query_id, neighbor_id,
                     list_sum(list_transform(range(1, len(cv)+1),
                       i -> (qv[i]::DOUBLE) * (cv[i]::DOUBLE)))
                     / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> (qv[i]::DOUBLE)^2)))
                      * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> (cv[i]::DOUBLE)^2)))) AS cos
              FROM cand
            )
            SELECT query_id, neighbor_id, rn::INT AS rank,
                   floor(cos * 1000000)::BIGINT AS cos_ppm
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rn FROM scored) t
            WHERE rn <= 5
        """,
        "eval_pairwise_pr": f"""
            WITH RECURSIVE pairs AS ({_JACCARD_PAIRS}),
            edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
            ),
            labels AS (
              SELECT d.doc_id, d.source AS gold,
                     least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS label
              FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id, d.source
            ),
            t AS (SELECT sum(n * n)::BIGINT AS t_mass FROM (SELECT count(*) AS n FROM labels GROUP BY gold)),
            p AS (SELECT sum(n * n)::BIGINT AS p_mass FROM (SELECT count(*) AS n FROM labels GROUP BY label)),
            tp AS (SELECT sum(n * n)::BIGINT AS tp_mass FROM (SELECT count(*) AS n FROM labels GROUP BY gold, label))
            SELECT t_mass, p_mass, tp_mass,
                   (CASE WHEN p_mass > 0 THEN tp_mass * 1000000 // p_mass ELSE 0 END)::BIGINT AS precision_ppm,
                   (CASE WHEN t_mass > 0 THEN tp_mass * 1000000 // t_mass ELSE 0 END)::BIGINT AS recall_ppm,
                   (CASE WHEN p_mass + t_mass > 0 THEN 2 * tp_mass * 1000000 // (p_mass + t_mass) ELSE 0 END)::BIGINT AS f1_ppm
            FROM t, p, tp
        """,
        "cluster_logistic": f"""
            WITH pairs AS ({_JACCARD_PAIRS.replace(str(int(JACCARD_THRESHOLD * 1e6)), "500000")})
            SELECT id1, id2,
                   floor(1000000.0 / (1.0 + exp(-(12.0 * (inter_size::DOUBLE / union_size::DOUBLE) - 5.5588))))::BIGINT AS score_ppm,
                   (1.0 / (1.0 + exp(-(12.0 * (inter_size::DOUBLE / union_size::DOUBLE) - 5.5588)))) > 0.5 AS is_equivalent
            FROM pairs
        """,
        "majority_vote": """
            SELECT source, lang AS majority_lang, n::BIGINT AS votes FROM (
              SELECT source, lang, count(*) AS n,
                     row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
              FROM documents GROUP BY source, lang) t
            WHERE rn = 1
        """,
        "top_terms": f"""
            SELECT term, freq::BIGINT AS freq, rank::INT AS rank FROM (
              SELECT term, count(*) AS freq,
                     row_number() OVER (ORDER BY count(*) DESC, term) AS rank
              FROM (SELECT unnest({_WORDS}) AS term FROM documents) t
              GROUP BY term) r
            WHERE rank <= 20
        """,
        "multimodal_features": """
            SELECT doc_id AS media_id, 'text-blob' AS modality,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents
        """,
        "incremental_newrows": """
            SELECT doc_id, source FROM documents WHERE doc_id % 3 != 0
        """,
        "containment_join": f"""
            WITH d AS (SELECT doc_id AS id, list_distinct({_WORDS}) AS fs FROM documents),
            ex AS (SELECT id, len(fs) AS sz, unnest(fs) AS feat FROM d)
            SELECT a.id AS sub_id, b.id AS sup_id
            FROM ex a JOIN ex b ON a.feat = b.feat
             AND a.id != b.id
             AND (a.sz < b.sz OR (a.sz = b.sz AND a.id < b.id))
            GROUP BY a.id, b.id, a.sz
            HAVING count(*) = a.sz
        """,
        "minimal_elements": f"""
            WITH d AS (SELECT doc_id AS id, list_distinct({_WORDS}) AS fs FROM documents),
            ex AS (SELECT id, len(fs) AS sz, unnest(fs) AS feat FROM d),
            pairs AS (
              SELECT a.id AS sub_id, b.id AS sup_id
              FROM ex a JOIN ex b ON a.feat = b.feat
               AND a.id != b.id
               AND (a.sz < b.sz OR (a.sz = b.sz AND a.id < b.id))
              GROUP BY a.id, b.id, a.sz
              HAVING count(*) = a.sz
            )
            SELECT DISTINCT sub_id AS doc_id FROM pairs
            WHERE sub_id NOT IN (SELECT sup_id FROM pairs)
        """,
        "paired_years": """
            SELECT event_id, year(ts)::INT AS year,
                   concat(year(ts) - 1, year(ts))::BIGINT AS year1,
                   concat(year(ts), year(ts) + 1)::BIGINT AS year2
            FROM events
        """,
        "rep_id": """
            WITH b AS (
              SELECT doc_id,
                     list_sort(list_filter([lang, source], x -> x IS NOT NULL))
                     || list_transform(list_filter([lang, source], x -> x IS NULL), x -> 'None')
                     AS bundled
              FROM documents
            )
            SELECT doc_id, md5(array_to_string(bundled, '#+*')) AS rep_id FROM b
        """,
        "spell_correct": """
            WITH toks AS (
              SELECT doc_id, unnest({words}) AS tok FROM documents
            ),
            dict AS (
              SELECT tok AS term, count(*) AS freq FROM toks
              GROUP BY tok ORDER BY freq DESC, term LIMIT 100
            ),
            distinct_toks AS (SELECT DISTINCT tok FROM toks),
            unknown AS (
              SELECT tok, least(2, greatest(1, (0.2 * length(tok))::INT)) AS cap
              FROM distinct_toks WHERE tok NOT IN (SELECT term FROM dict)
            ),
            cand AS (
              SELECT u.tok, d.term, levenshtein(u.tok, d.term) AS dist, d.freq
              FROM unknown u CROSS JOIN dict d
              WHERE levenshtein(u.tok, d.term) <= u.cap
            ),
            best AS (
              SELECT tok, term FROM (
                SELECT tok, term,
                       row_number() OVER (PARTITION BY tok
                         ORDER BY dist, freq DESC, term) AS rn
                FROM cand) t WHERE rn = 1
            ),
            corrected AS (
              SELECT t.doc_id, t.tok,
                     coalesce(b.term, t.tok) AS fixed
              FROM toks t LEFT JOIN best b ON t.tok = b.tok
            )
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   sum(CASE WHEN tok != fixed THEN 1 ELSE 0 END)::BIGINT AS n_corrected
            FROM corrected GROUP BY doc_id
        """.format(words=_WORDS),
        "canonical_merge": f"""
            WITH RECURSIVE pairs AS ({_JACCARD_PAIRS}),
            edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
            ),
            labels AS (
              SELECT d.doc_id, d.text,
                     least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
              FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id, d.text
            ),
            multi AS (
              SELECT cluster_id FROM labels GROUP BY cluster_id HAVING count(*) > 1
            ),
            ranked AS (
              SELECT l.cluster_id, l.doc_id, l.text,
                     row_number() OVER (PARTITION BY l.cluster_id
                       ORDER BY length(l.text) DESC, l.doc_id) AS rn
              FROM labels l JOIN multi m ON l.cluster_id = m.cluster_id
            )
            SELECT r.cluster_id,
                   max(CASE WHEN rn = 1 THEN doc_id END)::BIGINT AS canonical_id,
                   count(*)::BIGINT AS n_members,
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS members
            FROM ranked r GROUP BY r.cluster_id
        """,
        "writeback_roundtrip": f"""
            WITH RECURSIVE pairs AS ({_JACCARD_PAIRS}),
            edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
            ),
            labels AS (
              SELECT d.doc_id, d.text,
                     least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
              FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id, d.text
            ),
            sizes AS (SELECT cluster_id, count(*) AS n FROM labels GROUP BY cluster_id),
            canon AS (
              SELECT cluster_id, doc_id AS canonical_id, text AS canon_text FROM (
                SELECT l.*, row_number() OVER (PARTITION BY cluster_id
                  ORDER BY length(text) DESC, doc_id) AS rn FROM labels l) t
              WHERE rn = 1
            )
            SELECT l.doc_id,
                   CASE WHEN s.n > 1 THEN c.canon_text ELSE l.text END AS text,
                   CASE WHEN s.n > 1 THEN l.text END AS text_original,
                   CASE WHEN s.n > 1 THEN c.canonical_id END::BIGINT AS duplicate_of,
                   coalesce(s.n > 1 AND c.canonical_id = l.doc_id, FALSE) AS is_canonical
            FROM labels l
            JOIN sizes s ON l.cluster_id = s.cluster_id
            JOIN canon c ON l.cluster_id = c.cluster_id
        """,
        "canonical_fields": """
            WITH base AS (
              SELECT source AS cluster_id, lang AS f_lang,
                     CASE WHEN n_chars % 7 >= 2 THEN (n_chars % 3)::VARCHAR END AS f_bucket
              FROM documents
            ),
            vals AS (
              SELECT cluster_id, f_lang, f_bucket, count(*) AS freq
              FROM base GROUP BY 1, 2, 3
            ),
            supp AS (
              SELECT c.cluster_id, c.f_lang, c.f_bucket, sum(s.freq) AS support
              FROM vals c JOIN vals s ON s.cluster_id = c.cluster_id
               AND (s.f_lang IS NULL OR s.f_lang = c.f_lang)
               AND (s.f_bucket IS NULL OR s.f_bucket = c.f_bucket)
              GROUP BY 1, 2, 3
            )
            SELECT cluster_id, f_lang, f_bucket, support::BIGINT AS support FROM (
              SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY
                support DESC,
                (CASE WHEN f_lang IS NULL THEN 1 ELSE 0 END
               + CASE WHEN f_bucket IS NULL THEN 1 ELSE 0 END),
                (f_lang IS NULL), f_lang, (f_bucket IS NULL), f_bucket) AS rn
              FROM supp) t
            WHERE rn = 1
        """,
        "generalize_expand": """
            SELECT doc_id, lang, NULL AS source FROM documents
            UNION ALL
            SELECT doc_id, NULL AS lang, source FROM documents
        """,
        "specify_surrogates": """
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN doc_id::VARCHAR ELSE lang END AS f1
            FROM documents
        """,
        "minel_stats": f"""
            WITH d AS (SELECT doc_id AS id, list_distinct({_WORDS}) AS fs FROM documents),
            ex AS (SELECT id, len(fs) AS sz, unnest(fs) AS feat FROM d),
            pairs AS (
              SELECT a.id AS sub_id, b.id AS sup_id
              FROM ex a JOIN ex b ON a.feat = b.feat
               AND a.id != b.id
               AND (a.sz < b.sz OR (a.sz = b.sz AND a.id < b.id))
              GROUP BY a.id, b.id, a.sz
              HAVING count(*) = a.sz
            ),
            minels AS (
              SELECT DISTINCT sub_id FROM pairs
              WHERE sub_id NOT IN (SELECT sup_id FROM pairs)
            ),
            edges AS (
              SELECT p.sub_id AS src, p.sup_id AS dst FROM pairs p
              JOIN minels m ON p.sub_id = m.sub_id
            ),
            fanin AS (SELECT dst, count(*) AS fan_in FROM edges GROUP BY dst)
            SELECT e.src AS minel_id,
                   count(*)::BIGINT AS num_any,
                   sum(CASE WHEN f.fan_in > 1 THEN 1 ELSE 0 END)::BIGINT AS num_multi,
                   sum(CASE WHEN f.fan_in = 1 THEN 1 ELSE 0 END)::BIGINT AS num_single,
                   (CASE WHEN count(*) > 0
                    THEN (sum(CASE WHEN f.fan_in > 1 THEN 1 ELSE 0 END) * 1000000) // count(*)
                    ELSE 0 END)::BIGINT AS prob_multi_ppm
            FROM edges e JOIN fanin f ON e.dst = f.dst
            GROUP BY e.src
        """,
        "lattice_recall": f"""
            WITH d AS (SELECT doc_id AS id, list_distinct({_WORDS}) AS fs FROM documents),
            ex AS (SELECT id, len(fs) AS sz, unnest(fs) AS feat FROM d),
            pairs AS (
              SELECT a.id AS sub_id, b.id AS sup_id
              FROM ex a JOIN ex b ON a.feat = b.feat
               AND a.id != b.id
               AND (a.sz < b.sz OR (a.sz = b.sz AND a.id < b.id))
              GROUP BY a.id, b.id, a.sz
              HAVING count(*) = a.sz
            ),
            minels AS (
              SELECT DISTINCT sub_id AS id FROM pairs
              WHERE sub_id NOT IN (SELECT sup_id FROM pairs)
            ),
            nodes AS (
              SELECT m.id, doc.source AS gold, 1 AS freq
              FROM minels m JOIN documents doc ON doc.doc_id = m.id
            ),
            edges AS (
              SELECT p.sub_id AS src, p.sup_id AS dst FROM pairs p
              JOIN minels m ON p.sub_id = m.id
              UNION
              SELECT id, id FROM nodes
            ),
            reached AS (
              SELECT DISTINCT a.src AS m1, b.src AS m2
              FROM edges a JOIN edges b ON a.dst = b.dst
            ),
            paired AS (
              SELECT n1.gold, n1.freq AS f1, n2.freq AS f2
              FROM reached r
              JOIN nodes n1 ON r.m1 = n1.id
              JOIN nodes n2 ON r.m2 = n2.id AND n1.gold = n2.gold
            ),
            tp_g AS (SELECT gold, sum(f1 * f2) AS tp FROM paired GROUP BY gold),
            t_g AS (SELECT gold, sum(freq) * sum(freq) AS t FROM nodes GROUP BY gold),
            per_gold AS (
              SELECT t_g.gold, coalesce(tp_g.tp, 0) AS tp, t_g.t,
                     (CASE WHEN t_g.t > 0
                      THEN (coalesce(tp_g.tp, 0) * 1000000) // t_g.t ELSE 0 END) AS recall_ppm
              FROM t_g LEFT JOIN tp_g ON t_g.gold = tp_g.gold
            )
            SELECT sum(tp)::BIGINT AS tp, sum(t)::BIGINT AS t,
                   (CASE WHEN sum(t) > 0 THEN (sum(tp) * 1000000) // sum(t) ELSE 0 END)::BIGINT AS micro_recall_ppm,
                   (sum(recall_ppm) // count(*))::BIGINT AS macro_recall_ppm,
                   count(*)::BIGINT AS n_groups
            FROM per_gold
        """,
        "gold_labels": """
            SELECT doc_id, min(doc_id) OVER (PARTITION BY source)::BIGINT AS gold_rep
            FROM documents
        """,
        "chargrams": """
            WITH g AS (
              SELECT doc_id,
                     flatten(list_transform(
                       string_split(replace(lower(text), ' ', '_'), '_'),
                       w -> CASE WHEN length(w) >= 4
                            THEN list_transform(range(1, length(w) - 2),
                                                i -> substring(w, i, 4))
                            ELSE [] END)) AS grams
              FROM documents
            )
            SELECT doc_id, len(grams)::BIGINT AS n_grams, grams[1] AS first_gram
            FROM g
        """,
        "best_rep": f"""
            WITH raw AS (
              SELECT source AS cluster_id, substring(text, 1, 40) AS value
              FROM documents
            ),
            vals AS (SELECT DISTINCT cluster_id, value FROM raw),
            grams_raw AS (
              SELECT cluster_id,
                     unnest({duck_char_ngrams("value", 3)}) AS gram
              FROM raw
            ),
            gw AS (
              SELECT cluster_id, gram, count(*) AS gw
              FROM grams_raw GROUP BY 1, 2
            ),
            tot AS (SELECT cluster_id, sum(gw) AS tot FROM gw GROUP BY 1),
            top AS (
              SELECT g.cluster_id, g.gram
              FROM gw g JOIN tot t ON g.cluster_id = t.cluster_id
              WHERE g.gw * 1000000 >= t.tot * 10000
            ),
            topsz AS (SELECT cluster_id, count(*) AS top_sz FROM top GROUP BY 1),
            vgrams AS (
              SELECT cluster_id, value,
                     unnest({duck_char_ngrams("value", 3)}) AS gram
              FROM vals
            ),
            inter AS (
              SELECT vg.cluster_id, vg.value, count(*) AS inter_size
              FROM vgrams vg JOIN top tp
                ON vg.cluster_id = tp.cluster_id AND vg.gram = tp.gram
              GROUP BY 1, 2
            ),
            cand AS (
              SELECT v.cluster_id, v.value,
                     coalesce(i.inter_size, 0) AS inter_size,
                     len({duck_char_ngrams("v.value", 3)}) AS gsz,
                     ts.top_sz
              FROM vals v
              JOIN topsz ts ON v.cluster_id = ts.cluster_id
              LEFT JOIN inter i
                ON v.cluster_id = i.cluster_id AND v.value = i.value
            ),
            scored AS (
              SELECT cluster_id, value, inter_size, gsz,
                     CASE WHEN gsz + top_sz - inter_size > 0
                          THEN (inter_size * 1000000) // (gsz + top_sz - inter_size)
                          ELSE 0 END AS jacc_ppm
              FROM cand
            )
            SELECT cluster_id, value AS best_value,
                   inter_size::BIGINT AS inter_size,
                   gsz::BIGINT AS value_gram_size
            FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                    ORDER BY jacc_ppm DESC, value) AS rn FROM scored) t
            WHERE rn = 1
        """,
        "eval_grid": " UNION ALL ".join(
            _eval_grid_slice_sql(mn, mxg, mxl)
            for mn, mxg, mxl in [(1, None, None), (2, None, None), (1, 30, 1000)]
        ),
        "melt_attrs": """
            SELECT doc_id, attr, value FROM (
              SELECT doc_id, 'lang' AS attr, lang::VARCHAR AS value FROM documents
              UNION ALL
              SELECT doc_id, 'source', source::VARCHAR FROM documents
              UNION ALL
              SELECT doc_id, 'meta_chars', n_chars::VARCHAR FROM documents
            ) t WHERE value IS NOT NULL
        """,
        "clean_int": """
            SELECT event_id,
                   CASE WHEN year(ts) BETWEEN 2020 AND 2022 AND year(ts) != 0
                        THEN year(ts) END::BIGINT AS year_clean
            FROM events
        """,
        "gold_histogram": """
            SELECT n::BIGINT AS component_size, count(*)::BIGINT AS n_components
            FROM (SELECT source, count(*) AS n FROM documents GROUP BY source) t
            GROUP BY n
        """,
        "text_sections": r"""
            WITH s AS (
              SELECT doc_id,
                     flatten(list_transform(
                       string_split_regex(text, '\. |: | -+ |\? '),
                       t -> string_split_regex(t, '&|\.|\,|\bthe\b|\bof\b|\band\b')
                     )) AS secs
              FROM documents
            )
            SELECT doc_id, len(secs)::BIGINT AS n_sections, secs[1] AS first_section
            FROM s
        """,
        "gold_samples": """
            WITH m AS (SELECT doc_id AS m, source AS g FROM documents),
            mem AS (
              SELECT m, g, row_number() OVER (PARTITION BY g ORDER BY m) AS mrank
              FROM m
            ),
            labr AS (
              SELECT g, n, row_number() OVER (ORDER BY first_m) AS lrank FROM (
                SELECT g, min(m) AS first_m, count(*) AS n FROM m GROUP BY g) t
            ),
            eqlab AS (
              SELECT g, n, least(n * (n - 1) // 2, 5) AS mass,
                     coalesce(sum(least(n * (n - 1) // 2, 5)) OVER (
                       ORDER BY lrank ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS prior
              FROM labr
            ),
            eqpairs AS (
              SELECT a.m AS m1, b.m AS m2
              FROM mem a
              JOIN mem b ON a.g = b.g AND a.mrank < b.mrank
              JOIN eqlab e ON a.g = e.g
              WHERE e.prior < 60 AND e.mass > 0
                AND (a.mrank - 1) * e.n - a.mrank * (a.mrank - 1) // 2
                    + (b.mrank - a.mrank) <= 5
            ),
            dpairs AS (
              SELECT l1.g AS g1, l2.g AS g2, l1.n AS n1, l2.n AS n2,
                     l1.lrank AS r1, l2.lrank AS r2,
                     least(l1.n * l2.n, 3) AS mass
              FROM labr l1 JOIN labr l2 ON l1.lrank < l2.lrank
            ),
            dkeep AS (
              SELECT * FROM (
                SELECT *, coalesce(sum(mass) OVER (
                  ORDER BY r1, r2 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS prior FROM dpairs) t
              WHERE prior < 40
            ),
            marr AS (
              SELECT g, list_sort(list(m)) AS ms FROM mem WHERE mrank <= 4 GROUP BY g
            ),
            dexp AS (
              SELECT d.n2, ma.ms AS ms1, mb.ms AS ms2,
                     unnest(range(0, d.mass)) AS k
              FROM dkeep d
              JOIN marr ma ON d.g1 = ma.g
              JOIN marr mb ON d.g2 = mb.g
            )
            SELECT m1, m2, TRUE AS is_equivalent FROM eqpairs
            UNION ALL
            SELECT ms1[(k // n2)::INT + 1] AS m1,
                   ms2[(k % n2)::INT + 1] AS m2,
                   FALSE AS is_equivalent
            FROM dexp
        """,
        # Hyperplane LSH: the ±1 Rademacher plane entries regenerate from
        # the same two-round LCG the pandas UDF uses (similarity.py
        # rademacher_planes — every intermediate < 2^63, so BIGINT-safe),
        # then bucket join + exact cosine re-rank, all in SQL.
        "ann_lsh_cosine": """
            WITH dots AS (
              -- projection summed by list_sum over ASCENDING dimension
              -- index (not an unordered group SUM, whose accumulation
              -- order varies with execution parallelism): float addition
              -- is non-associative, and a near-zero projection summed in
              -- a different order could flip sign and change a bucket.
              -- The Spark UDF's einsum also accumulates sequentially over
              -- j (no BLAS dispatch for this contraction), so the orders
              -- agree. Plane entries regenerate from the same two-round
              -- LCG the pandas UDF uses (similarity.py rademacher_planes;
              -- every intermediate < 2^63, BIGINT-safe).
              SELECT e.vec_id, t.range AS t, p.range AS p,
                     list_sum(list_transform(range(1, len(e.embedding) + 1),
                       i -> (1 - 2 * ((((((((42::BIGINT * 131071 + t.range) * 131071
                                            + p.range) * 131071 + (i - 1))
                                          % 2147483648) * 2654435761 % 4294967296)
                                        % 2147483648) * 2246822519 % 4294967296 // 32768) % 2))::DOUBLE
                            * (e.embedding[i]::DOUBLE))) AS dp
              FROM embeddings e, range(12) t, range(6) p
            ),
            sigs AS (
              SELECT vec_id, t,
                     SUM(CASE WHEN dp > 0 THEN 1::BIGINT << p::INT ELSE 0 END) * 12 + t AS bucket
              FROM dots GROUP BY vec_id, t
            ),
            cand AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM sigs q JOIN sigs c ON q.bucket = c.bucket
              WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
            ),
            scored AS (
              SELECT cand.query_id, cand.neighbor_id,
                     list_sum(list_transform(range(1, len(ce.embedding)+1),
                       i -> (qe.embedding[i]::DOUBLE) * (ce.embedding[i]::DOUBLE)))
                     / (sqrt(list_sum(list_transform(range(1, len(qe.embedding)+1), i -> (qe.embedding[i]::DOUBLE)^2)))
                      * sqrt(list_sum(list_transform(range(1, len(ce.embedding)+1), i -> (ce.embedding[i]::DOUBLE)^2)))) AS cos
              FROM cand
              JOIN embeddings qe ON qe.vec_id = cand.query_id
              JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
            )
            SELECT query_id, neighbor_id, rn::INT AS rank,
                   floor(cos * 1000000)::BIGINT AS cos_ppm
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rn FROM scored) t
            WHERE rn <= 5
        """,
        # pairwise_verify: difflib's matching-block overlap is not
        # SQL-expressible, but it IS a pure function of the two candidate
        # texts — so a precomputed parquet fixture carries (sha1, sha2,
        # len1, len2, overlap) per candidate pair (tools/
        # make_pairverify_fixture.py, committed under fixtures/), keyed by
        # text SHA so it can only match the exact texts it was built
        # from, and every piece of classifier arithmetic (the distance
        # formula 1 − overlap/max(len), the ppm floor, the 0.5
        # max_title_diff gate — reference 3_update_duplicateIDs.py:132-137,
        # configs.json:68) runs in SQL. An uncovered pair inner-join-drops
        # to a loud row-count mismatch, never a silent pass.
        "pairwise_verify": f"""
            WITH clusters AS ({_CC}),
            multi AS (
              SELECT component_id FROM clusters
              GROUP BY component_id HAVING count(*) > 1
            ),
            docs AS (
              SELECT c.component_id AS cluster_id, c.doc_id, d.text
              FROM clusters c
              JOIN multi m ON c.component_id = m.component_id
              JOIN documents d ON d.doc_id = c.doc_id
            ),
            cand AS (
              SELECT a.cluster_id, a.doc_id AS id1, b.doc_id AS id2,
                     a.text AS t1, b.text AS t2
              FROM docs a JOIN docs b
                ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id
            ),
            fx AS (SELECT * FROM read_parquet('{_PAIRVERIFY_FIXTURE}')),
            scored AS (
              SELECT c.cluster_id, c.id1, c.id2,
                     CASE WHEN f.len1 = 0 AND f.len2 = 0 THEN 0.0
                          ELSE 1.0 - f.overlap::DOUBLE
                               / greatest(f.len1, f.len2, 1)::DOUBLE
                     END AS d
              FROM cand c
              JOIN fx f ON f.sha1 = sha256(c.t1) AND f.sha2 = sha256(c.t2)
            )
            SELECT cluster_id, id1, id2,
                   trunc(d * 1000000)::BIGINT AS title_diff_ppm,
                   (d <= 0.5) AS is_equivalent
            FROM scored
        """,
    }
