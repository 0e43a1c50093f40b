"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators beyond the reference's scope (the
reference's nearest analogue is its sparse-feature cosine kernel,
/root/reference/code/common.py:280-312 — dot products as relational
algebra; here vectors are dense).

- ``knn_cosine_brute``: exact top-k per query — broadcast the (small)
  query set, one JVM-side F.aggregate dot product per (candidate, query)
  pair, window row_number for the top-k. All arithmetic in double with a
  fixed summation order (array index order) so results reproduce across
  engines and partitionings.
- ``ann_lsh_cosine``: random-hyperplane LSH (Charikar '02) — signatures
  via one matmul in a pandas UDF, candidates restricted to same-bucket
  pairs, exact cosine re-rank. The 10^12-scale path: bucket join replaces
  the full cross product; recall tunable by bands/bits. Hyperplane entries
  are hash-derived Rademacher ±1 (sign of a dot with iid symmetric
  entries is the same LSH family as Gaussian planes, Charikar '02 §3 /
  Achlioptas '01 sparse projections) — chosen over ``standard_normal``
  because the two-round LCG below is exactly reproducible in ANSI SQL, so
  the whole operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def knn_cosine_brute(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_ppm) — top-k by cosine, self
    excluded, ties broken by neighbor id. cos scaled to ppm (long) for
    engine-stable comparison; ranking uses full double precision."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    crossed = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    cos = (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias(
        "cos"
    )
    scored = crossed.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int"),
            F.floor(F.col("cos") * 1000000).cast("long").alias("cos_ppm"),
        )
    )


def rademacher_planes(
    n_tables: int, n_planes: int, dim: int, seed: int
) -> np.ndarray:
    """(n_tables, n_planes, dim) float64 matrix of ±1 hyperplane entries.

    Two-round multiplicative LCG over the flattened (seed, table, plane,
    dim) key. Constants are the classic Knuth/Fibonacci-hash multipliers;
    every intermediate stays below 2^63 (max (2^31−1)·2654435761 ≈
    5.7e18), so DuckDB BIGINT arithmetic — which raises on overflow
    rather than wrapping — evaluates the identical expression and a SQL
    oracle reproduces the planes bit-for-bit."""
    t = np.arange(n_tables, dtype=np.int64)[:, None, None]
    p = np.arange(n_planes, dtype=np.int64)[None, :, None]
    j = np.arange(dim, dtype=np.int64)[None, None, :]
    key = ((np.int64(seed) * 131071 + t) * 131071 + p) * 131071 + j
    r1 = (key % 2**31) * 2654435761 % 2**32
    r2 = (r1 % 2**31) * 2246822519 % 2**32
    return (1 - 2 * ((r2 // 32768) % 2)).astype(np.float64)


@dataclass
class AnnLshConfig:
    n_planes: int = 16  # bits per signature
    n_tables: int = 8  # independent hash tables (OR-amplification)
    seed: int = 42
    k: int = 5


def ann_lsh_cosine(
    df: DataFrame,
    queries: DataFrame,
    cfg: AnnLshConfig | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: same output shape as knn_cosine_brute, candidates
    limited to vectors sharing ≥1 LSH bucket with the query."""
    cfg = cfg or AnnLshConfig()
    n_tables, n_planes, seed = cfg.n_tables, cfg.n_planes, cfg.seed

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        # hyperplanes derive deterministically from (seed, dim) INSIDE the
        # UDF — no driver-side `first()` action to learn the dimensionality
        # (identical planes on every worker/batch for a given dim). Entries
        # are ±1 from rademacher_planes — every intermediate of that mix
        # fits signed-64 arithmetic, so a SQL oracle regenerates the exact
        # same planes. An explicit `dim` argument pins the expectation.
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        if dim is not None and m.shape[1] != dim:
            raise ValueError(f"embedding dim {m.shape[1]} != declared {dim}")
        planes = rademacher_planes(n_tables, n_planes, m.shape[1], seed)
        proj = np.einsum("bd,tpd->btp", m, planes) > 0  # (batch, T, P)
        weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)
        code = (proj * weights[None, None, :]).sum(axis=2, dtype=np.int64)
        bucket = code * np.int64(n_tables) + np.arange(n_tables, dtype=np.int64)[None, :]
        return pd.Series([row.tolist() for row in bucket])

    cand = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    pairs = (
        cand.join(F.broadcast(qb), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cos")
    scored = pairs.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cfg.k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int"),
            F.floor(F.col("cos") * 1000000).cast("long").alias("cos_ppm"),
        )
    )


@dataclass
class AnnIvfConfig:
    n_cells: int = 16  # coarse centroids
    n_probe: int = 4  # cells probed per query
    k: int = 5


def ann_ivf_cosine(
    df: DataFrame,
    queries: DataFrame,
    cfg: AnnIvfConfig | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat ANN: coarse quantization into ``n_cells`` cells, queries
    probe their ``n_probe`` nearest cells, exact cosine re-rank within the
    probed cells. Same output shape as ``knn_cosine_brute``.

    ``centroids`` (optional, (centroid_id, centroid_vec)): pass a trained
    coarse quantizer (e.g. pyspark.ml KMeans cluster centers). The default
    is *sampled* centroids — the embeddings of the ``n_cells`` smallest
    ids — which keeps the operator a deterministic function of the input
    (engine-reproducible, DuckDB-oracle-checkable) while exercising the
    exact IVF dataflow; recall is tuned by ``n_probe``.

    Scale path (10^12 vectors): assignment is a map-side broadcast
    cross-product against ``n_cells`` centroids (one JVM dot product per
    (vector, centroid)); the only shuffle is the posting-list join on
    cell_id, whose fan-in per cell is n/n_cells — choose n_cells ≈ √n and
    cap hot cells with the usual bucket machinery if the quantizer skews.
    """
    cfg = cfg or AnnIvfConfig()
    if centroids is None:
        # orderBy().limit(n) compiles to TakeOrderedAndProject — every
        # partition keeps its local n smallest, the driver merges n_cells
        # tiny rows. No global single-partition sort/window exchange (a
        # row_number() over an unpartitioned Window here would funnel the
        # entire embedding table through one task before any IVF work).
        centroids = (
            df.select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
            )
            .orderBy(F.col("centroid_id").asc())
            .limit(cfg.n_cells)
        )
    cent = F.broadcast(centroids)

    def nearest_cells(side: DataFrame, sid: str, svec: str, n_keep: int) -> DataFrame:
        crossed = side.crossJoin(cent)
        cos = _dot(F.col(svec), F.col("centroid_vec")) / (
            _norm(F.col(svec)) * _norm(F.col("centroid_vec"))
        )
        scored = crossed.select(sid, svec, "centroid_id", cos.alias("ccos"))
        w = Window.partitionBy(sid).orderBy(F.desc("ccos"), F.asc("centroid_id"))
        return (
            scored.withColumn("_crn", F.row_number().over(w))
            .where(F.col("_crn") <= n_keep)
            .drop("ccos", "_crn")
        )

    postings = nearest_cells(
        df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id",
        "cv",
        1,
    )
    probes = nearest_cells(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
        cfg.n_probe,
    )
    pairs = (
        postings.join(probes, "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cos")
    scored = pairs.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cfg.k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int"),
            F.floor(F.col("cos") * 1000000).cast("long").alias("cos_ppm"),
        )
    )
