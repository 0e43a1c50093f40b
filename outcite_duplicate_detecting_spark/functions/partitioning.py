"""Scale-adaptive input spreading for compute-heavy map stages.

The engine's per-row work (shingling HOFs, regex stats, Arrow-batched
signature UDFs) is orders of magnitude more expensive than the bytes it
reads, so its parallelism is capped by the SCAN's partition count, not by
data volume. A small parquet table (one file, one row group) scans as ONE
task, serializing the whole map stage on one core no matter how many the
session has (guide §2: choose a partitioning that matches the work, §6:
input split size governs scan parallelism).

``spread_small_input`` repartitions ONLY when the plan's current
parallelism is below the session's core count — a metadata decision, no
job. At real scale (thousands of splits) the condition is false and the
function is a no-op, so this is not a local-mode constant: the trigger
derives from the actual scan layout vs ``defaultParallelism`` every time.
The repartition hash-keys on the caller's id column, which is
deterministic under task retries (guide §2.5 warns round-robin/rand keys
can duplicate or lose rows when a fetch failure re-runs map tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_small_input(
    df: DataFrame, key: str | None = None, factor: int = 2
) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` iff its current
    partition count is below ``defaultParallelism`` — i.e. the downstream
    per-row compute could not occupy the session's cores.

    ``key``: hash-partition column (deterministic); None → round-robin
    (Spark's sort-before-repartition keeps that retry-safe, at the cost of
    a local sort)."""
    try:
        sc = df.sparkSession.sparkContext
        cores = sc.defaultParallelism
        cur = df.rdd.getNumPartitions()
    except Exception:  # non-classic session / cannot inspect — leave as-is
        return df
    if cur >= cores:
        return df
    target = max(cores * factor, 8)
    return df.repartition(target, F.col(key)) if key else df.repartition(target)
