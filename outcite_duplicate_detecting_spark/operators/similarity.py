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
  the full cross product; recall tunable by bands/bits.
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
        # (identical planes on every worker/batch for a given dim; the
        # regeneration cost is a few KB of randn per Arrow batch). An
        # explicit `dim` argument just pins the expectation.
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        if dim is not None and m.shape[1] != dim:
            raise ValueError(f"embedding dim {m.shape[1]} != declared {dim}")
        planes = np.random.RandomState(seed).standard_normal(
            (n_tables, n_planes, m.shape[1])
        )
        bits_per_table = []
        for t in range(planes.shape[0]):
            proj = m @ planes[t].T > 0  # (batch, n_planes) bools
            key = np.packbits(proj, axis=1, bitorder="little")
            width = key.shape[1]
            val = np.zeros(len(m), dtype=np.int64)
            for j in range(width):
                val |= key[:, j].astype(np.int64) << (8 * j)
            bits_per_table.append(val * np.int64(planes.shape[0]) + t)
        stacked = np.stack(bits_per_table, axis=1)
        return pd.Series([row.tolist() for row in stacked])

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
        w_ids = Window.orderBy(F.col(id_col).asc())
        centroids = (
            df.withColumn("_rn", F.row_number().over(w_ids))
            .where(F.col("_rn") <= cfg.n_cells)
            .select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
            )
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
