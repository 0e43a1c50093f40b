"""Connected components via iterative large-star / small-star DataFrame joins.

Replaces every scipy ``connected_components`` call site in the reference
(six of them — SURVEY.md §2.9: gold links code/B3_add_goldID.py:60,
similarity graph code/common.py:367, classifier graph
code/3_update_duplicateIDs.py:99, min-el graph
code/blocking/code/find_components_disk.py:273, simhash graph
code/blocking/code/simhash_components_disk_v3.py:332, gold CC
code/blocking/code/core_goldstandard.py:99). The reference materializes a
boolean adjacency matrix in driver memory; that caps it at one machine.
Here the graph stays a distributed edge DataFrame and converges in
O(log n) rounds of the Kiveris et al. (SoCC'14) alternating star
operations:

- large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u})
- small-star: every neighbor v ≤ u (edges oriented big→small) links to m(u)

Each round is two shuffles (groupBy min + join); ``localCheckpoint``
truncates lineage per round so plans stay flat. Convergence = edge-set
fixpoint, detected with a cheap order-insensitive digest
(count + sum of per-edge hashes) instead of a full set comparison.

Driver-barrier budget: exactly ONE job per round. The round's
``localCheckpoint`` is lazy (eager=False) and the digest aggregation is
the action that materializes it — checkpoint and convergence check share
a single job instead of running back-to-back (the serialized per-round
driver time is what caps N→4N scaling on small graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _id_col(df: DataFrame, name: str, alias: str):
    """Id columns stay whatever orderable type the caller uses (long ids,
    128-bit struct<h1,h2> ids, strings); integral types are widened to long
    so mixed int/long callers keep the legacy behavior."""
    c = F.col(name)
    if dict(df.dtypes).get(name) in _INTEGRAL:
        c = c.cast("long")
    return c.alias(alias)


def _normalize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(_id_col(edges, src, "src"), _id_col(edges, dst, "dst"))
    return (
        e.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def _symmetric(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(e: DataFrame) -> DataFrame:
    nbrs = _symmetric(e)
    mins = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", "src").alias("m"))
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient big -> small; every small neighbor (and the center) links to min
    ed = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    mins = ed.groupBy("src").agg(F.min("dst").alias("m"))
    linked = (
        ed.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("src"), F.col("m").alias("dst")))
    )
    return linked.where(F.col("src") != F.col("dst")).distinct()


def _digest(e: DataFrame) -> tuple[int, int, int]:
    # order-insensitive set digest: count + two modular hash sums
    # (moduli keep the ANSI-mode sum far from long overflow at any scale)
    h = F.xxhash64("src", "dst")
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.pmod(h, F.lit(1_000_003))), F.lit(0)).alias("h1"),
        F.coalesce(F.sum(F.pmod(h, F.lit(999_983))), F.lit(0)).alias("h2"),
    ).collect()[0]
    return int(row["n"]), int(row["h1"]), int(row["h2"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) — component = minimum node id of the component.

    ``nodes`` (optional, one column ``id_col``) adds isolated vertices,
    which label themselves.
    """
    # lazy checkpoint + digest-as-materializer: one job per round. No
    # pre-loop digest of the input — the first round's digest doubles as
    # the baseline (an already-converged input just takes its one
    # confirmation round, same as before; every other input saves a job)
    import os
    import time

    timing = bool(os.environ.get("SPARK_GRAFT_STAGE_TIMING"))
    e = _normalize(edges, src, dst).localCheckpoint(eager=False)
    prev: tuple[int, int, int] | None = None
    for _round in range(max_iter):
        t0 = time.time()
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _digest(e2)
        if timing:
            print(
                f"STAGE_TIMING cc_round_{_round} {time.time() - t0:.2f}s"
                f" edges={cur[0]}",
                flush=True,
            )
        e = e2
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    labels = (
        _symmetric(e)
        .groupBy("src")
        .agg(F.min("dst").alias("component"))
        .select(
            F.col("src").alias(id_col),
            F.least("component", "src").alias("component"),
        )
    )
    if nodes is not None:
        all_nodes = nodes.select(_id_col(nodes, id_col, id_col)).distinct()
        labels = all_nodes.join(labels, id_col, "left").select(
            id_col, F.coalesce("component", F.col(id_col)).alias("component")
        )
    return labels
