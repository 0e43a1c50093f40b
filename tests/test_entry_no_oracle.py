"""Brute-force pytest oracles for the driver queries that have no DuckDB
twin (dedup_simhash / ann_lsh_cosine are covered in their operator tests;
here the registered ``pairwise_verify`` query is checked end-to-end against
an independent pure-python recomputation on the real sf0.001 parquet)."""

import itertools
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from outcite_duplicate_detecting_spark.operators.pairverify import (  # noqa: E402
    seq_distance,
)

SF = "/root/testdata/sf0.001"


def _brute_clusters(rows, n=3, threshold=0.8):
    """Exact jaccard pairs + union-find — independent of the Spark path."""
    def shingles(t):
        w = [x for x in t.lower().split() if x]
        if not w:
            return {""}
        if len(w) <= n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sh = {r[0]: shingles(r[1]) for r in rows}
    parent = {i: i for i in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sh)
    for a, b in itertools.combinations(ids, 2):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        union = len(sh[a]) + len(sh[b]) - inter
        if inter * 10**6 >= union * 800000:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_pairwise_verify_query_brute_oracle(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    comp = _brute_clusters(rows)
    text = dict(rows)
    by_cluster = {}
    for i, c in comp.items():
        by_cluster.setdefault(c, []).append(i)
    expected = {}
    for c, members in by_cluster.items():
        if len(members) < 2:
            continue
        for a, b in itertools.combinations(sorted(members), 2):
            d = seq_distance(str(text[a] or ""), str(text[b] or ""))
            expected[(a, b)] = (c, int(d * 1_000_000), d <= 0.5)

    got = {
        (r["id1"], r["id2"]): (
            r["cluster_id"],
            r["title_diff_ppm"],
            r["is_equivalent"],
        )
        for r in entrymod.q_pairwise_verify(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == expected[k], f"pair {k}: {got[k]} != {expected[k]}"
