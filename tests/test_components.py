"""Connected components vs a Python union-find oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from outcite_duplicate_detecting_spark.operators.components import connected_components


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def oracle_labels(edges, nodes):
    uf = UnionFind()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    # label every node with min of its component
    comp = {}
    for n in nodes:
        comp.setdefault(uf.find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 30, 20), (1, 200, 150), (2, 500, 900)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = np.random.RandomState(seed)
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, n_nodes, size=(n_edges, 2))
    ]
    nodes = list(range(n_nodes))
    want = oracle_labels(edges, nodes)

    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == want


def test_cc_long_chain(spark):
    # worst case for label propagation; log-round algorithms handle it fast
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(edf).collect()
    assert {r["component"] for r in got} == {0}
    assert {r["id"] for r in got} == set(range(n))


def test_cc_star_skew(spark):
    # one hot node connected to everything
    edges = [(0, i) for i in range(1, 300)] + [(500, 501)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(edf).collect()}
    assert all(got[i] == 0 for i in range(1, 300))
    assert got[501] == 500
