"""Canonicalization votes (NULL-wildcard / positional-name / priority) and
the duplicates-table + MERGE writeback path, vs hand-computed cases."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.operators.canonicalize import (
    best_value_priority,
    majority_vote_wildcard,
    positional_name_vote,
)
from outcite_duplicate_detecting_spark.plans.writeback import (
    build_duplicates_table,
    merge_upsert_parquet,
    sql_update_copy_column,
    writeback_canonical,
)


def test_majority_vote_wildcard_hand_case(spark):
    # reference semantics: (1958, None) supports both (1958, 'x') and
    # (1958, 'y'); with freqs below, ('1958','x') wins via wildcard support
    rows = [
        (1, "1958", "x"),
        (1, "1958", None),
        (1, "1958", None),
        (1, None, "y"),
        (1, "1959", "y"),
        (1, "1959", "y"),
    ]
    df = spark.createDataFrame(rows, "cluster_id long, year string, place string")
    got = majority_vote_wildcard(df, "cluster_id", ["year", "place"]).collect()[0]
    # supports: ('1958','x') ← itself(1) + ('1958',None)(2) + (None,'y')? no
    # (year mismatch is not allowed: supporter year '1958'≠None and must
    # equal) wait: supporter (None,'y') has year NULL → wildcard, place 'y'
    # ≠ 'x' → not compatible. So support('1958','x') = 1+2 = 3.
    # support('1959','y') = 2 + (None,'y')(1) = 3. support('1958',None)=2+...
    # compatible supporters of ('1958',None): ('1958',None)(2) only
    # (others have non-null place or different year... ('1958','x') has
    # place 'x' not NULL and not equal NULL-key? key_=('1958',None):
    # supporter ('1958','x'): check key[i]==key_[i] or key[i]==None →
    # place: 'x' != None and 'x' not None → fails) = 2.
    # (None,'y') support: itself(1)+('1959','y')? year '1959'!=None, not
    # None → no. +('1958',None)? place None==...: supporter ('1958',None):
    # year '1958' != None fails. = 1.
    # tie 3 vs 3 → fewer NULLs tie is equal (0 each) → values asc:
    # ('1958','x') < ('1959','y')
    assert (got["year"], got["place"], got["support"]) == ("1958", "x", 3)


def test_majority_vote_wildcard_null_tuple_outvoted(spark):
    # all-NULL tuples support everyone but lose to any concrete tuple
    rows = [(1, None), (1, None), (1, None), (1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, "cluster_id long, f string")
    got = majority_vote_wildcard(df, "cluster_id", ["f"]).collect()[0]
    # support('a') = 1 + 3 = 4, support('b') = 4, support(None) = 3
    assert got["f"] == "a" and got["support"] == 4


def test_positional_name_vote(spark):
    mk = lambda sur, ini, first: Row(surname=sur, initials=ini, firstnames=first)  # noqa: E731
    rows = [
        Row(cluster_id=1, authors=[mk("Smith", ["J"], ["John"]), mk("Doe", ["A"], None)]),
        Row(cluster_id=1, authors=[mk("smith", ["J"], None)]),
        Row(cluster_id=1, authors=[mk("Smith", None, ["John"])]),
    ]
    df = spark.createDataFrame(rows)
    got = {r["slot"]: r for r in positional_name_vote(df, "cluster_id").collect()}
    # slot 0: tuples (Smith,J,John), (smith,J,None), (Smith,None,John) are
    # pairwise compatible (case-insensitive, NULL both ways) → all support 3
    # → tie → values asc NULLs-last: ("Smith","J",...,"John",...) wins
    assert got[0]["surname_0"] == "Smith"
    assert got[0]["initials_0"] == "J"
    assert got[0]["firstnames_0"] == "John"
    assert got[0]["support"] == 3
    # slot 1 only present in one row
    assert got[1]["surname_0"] == "Doe" and got[1]["support"] == 1


def test_best_value_priority(spark):
    rows = [
        (1, "crossref", "u1"),
        (1, "crossref", "u2"),
        (1, "crossref", "u2"),
        (1, "sowiport", "s1"),
        (2, "general", "g1"),
    ]
    df = spark.createDataFrame(rows, "cluster_id long, coll string, url string")
    got = {
        r["cluster_id"]: r
        for r in best_value_priority(
            df, "cluster_id", "coll", "url", ["sowiport", "crossref", "general"]
        ).collect()
    }
    # cluster 1: sowiport present (priority first) → s1 even though
    # crossref has more rows
    assert got[1]["collection"] == "sowiport" and got[1]["best_value"] == "s1"
    assert got[2]["collection"] == "general" and got[2]["best_value"] == "g1"


@pytest.fixture()
def mini_cluster(spark):
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the longest canonical text"),
            (3, "middle text"),
            (4, "unrelated single"),
        ],
        "doc_id long, text string",
    )
    assignments = spark.createDataFrame(
        [(1, 1, True), (2, 1, True), (3, 1, True), (4, 4, False)],
        "doc_id long, cluster_id long, is_duplicate boolean",
    )
    return docs, assignments


def test_build_duplicates_table(spark, mini_cluster):
    docs, assignments = mini_cluster
    got = build_duplicates_table(assignments.where("is_duplicate"), docs).collect()
    assert len(got) == 1
    r = got[0]
    assert r["canonical_id"] == 2
    assert r["member_ids"] == [1, 2, 3]
    assert r["n_members"] == 3
    assert r["text"] == "the longest canonical text"


def test_writeback_canonical(spark, mini_cluster):
    docs, assignments = mini_cluster
    dups = build_duplicates_table(assignments.where("is_duplicate"), docs)
    out = writeback_canonical(docs, assignments, dups).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 4  # one row per input row
    for i in (1, 2, 3):
        assert by_id[i]["text"] == "the longest canonical text"
        assert by_id[i]["duplicate_of"] == 2
        assert by_id[i]["has_duplicate_ids"]
    assert by_id[1]["text_original"] == "short"
    assert by_id[2]["is_canonical"] is True
    assert by_id[1]["is_canonical"] is False
    # non-duplicate row passes through untouched
    assert by_id[4]["text"] == "unrelated single"
    assert by_id[4]["text_original"] is None
    assert not by_id[4]["has_duplicate_ids"]


def test_merge_upsert_parquet(spark, tmp_path):
    target = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, v long"
    ).write.parquet(target)
    updates = spark.createDataFrame(
        [(2, "B", 99), (3, "c", 30)], "id long, name string, v long"
    )
    n = merge_upsert_parquet(spark, target, updates, key_cols=["id"])
    assert n == 3
    got = {r["id"]: r for r in spark.read.parquet(target).collect()}
    assert got[1]["name"] == "a" and got[1]["v"] == 10  # untouched
    assert got[2]["name"] == "B" and got[2]["v"] == 99  # updated
    assert got[3]["name"] == "c" and got[3]["v"] == 30  # inserted
    # partial-column update preserves non-updated columns
    n = merge_upsert_parquet(
        spark,
        target,
        spark.createDataFrame([(1, 777)], "id long, v long"),
        key_cols=["id"],
        update_cols=["v"],
    )
    assert n == 3
    got = {r["id"]: r for r in spark.read.parquet(target).collect()}
    assert got[1]["v"] == 777 and got[1]["name"] == "a"


def test_merge_upsert_creates_missing_target(spark, tmp_path):
    target = str(tmp_path / "fresh")
    n = merge_upsert_parquet(
        spark, target, spark.createDataFrame([(1, "x")], "id long, s string"), ["id"]
    )
    assert n == 1 and os.path.exists(target)


def test_sql_update_copy_column(spark, tmp_path):
    target = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, 100, 0), (2, 200, 0)], "id long, cluster_id long, duplicate_id2 long"
    ).write.parquet(target)
    n = sql_update_copy_column(spark, target, "cluster_id", "duplicate_id2")
    assert n == 2
    got = {r["id"]: r["duplicate_id2"] for r in spark.read.parquet(target).collect()}
    assert got == {1: 100, 2: 200}
