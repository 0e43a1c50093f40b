"""End-to-end near-duplicate clustering pipeline over ``pages``.

The Spark re-founding of the reference's full DUPLICATE_DETECTING.sh run
(/root/reference/code/DUPLICATE_DETECTING.sh:16-59 — download → normalize →
block → cluster → verify → canonicalize → writeback), collapsed into one
declarative dataflow (SURVEY.md §3.1):

    pages(url, warc_ts, html, text, lang)
      └─ stage ids:        url → 64-bit doc id (xxhash64), text untouched
      └─ stage collapse:   byte-identical texts → one representative
                           (reference analogue: SHA-1 repID freq upsert)
      └─ stage minhash:    MinHash/LSH verified Jaccard pairs
      └─ stage simhash:    SimHash Hamming-≤k pairs
      └─ stage substring:  winnowing containment pairs
      └─ stage components: large-star/small-star CC over the edge union
      └─ stage expand:     labels back onto every url via the exact-dup
                           membership; cluster_id = min url-hash in cluster

Every stage checkpoints through plans/manifest.run_stage (per-partition
lineage + counters; resume on matching fingerprints). The per-row invariant
holds by construction: ``text`` is never rewritten, and the output joins
labels onto the original rows.

Scale design (10^12 docs, 1000 executors):
- the only wide operations are the three candidate joins and CC; everything
  before them is map-side (signatures are per-row pandas UDFs),
- exact-dup collapse runs FIRST so web-scale boilerplate/exact reposts never
  reach a pairwise join as hot bands,
- candidate joins carry bucket caps + optional salting (operators/joins.py),
- CC rounds localCheckpoint to keep plans flat; edges are a tiny fraction
  of corpus size after verification,
- doc ids are xxhash64(url): at 10^12 urls expect ~a few 10^4 random 64-bit
  collisions (birthday bound) — these can only over-merge a handful of
  clusters; switch to dual-seed 128-bit ids if that matters.
"""

from __future__ import annotations

import hashlib
import json
import tempfile
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.dedup import collapse_exact
from ..operators.minhash import MinHashConfig, minhash_lsh_pairs
from ..operators.simhash import SimHashConfig, simhash_pairs
from ..operators.substring import SubstringConfig, substring_pairs
from .manifest import run_stage


@dataclass
class PipelineConfig:
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    # 16-bit simhash bands: the web-scale setting (collisions 1/65536 vs
    # 1/256 ⇒ candidate volume drops ~256×). Pigeonhole-exact for hamming
    # ≤ 3; the 4..7 tail is partially covered here and overlaps the MinHash
    # detector's Jaccard regime. Reference-parity 8×8 (exact ≤ 7) remains
    # the SimHashConfig() default for standalone use.
    simhash: SimHashConfig = field(
        default_factory=lambda: SimHashConfig(bits_per_band=16)
    )
    substring: SubstringConfig = field(default_factory=SubstringConfig)
    use_minhash: bool = True
    use_simhash: bool = True
    use_substring: bool = True
    min_text_chars: int = 1  # drop empty texts from pairwise detectors
    # run detector stages concurrently (overlaps their serialized tails);
    # 0 → one thread per detector, 1 → sequential
    detector_threads: int = 0

    def fingerprint(self) -> str:
        return hashlib.sha1(
            json.dumps(asdict(self), sort_keys=True, default=str).encode()
        ).hexdigest()


def dedup_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    workdir: str | None = None,
    input_fingerprint: str | None = None,
    run_id: str = "run",
) -> DataFrame:
    """Cluster assignments: (url, doc_id, cluster_id, is_duplicate).

    ``cluster_id`` is the minimum doc_id of the connected component under
    the union of (exact, minhash, simhash, substring) duplicate relations.
    ``input_fingerprint``: pass a cheap stable token (e.g. an Iceberg
    snapshot id or source path + mtime) to enable cross-run resume; when
    omitted, stages still checkpoint but are keyed to this run only.
    """
    cfg = cfg or PipelineConfig()
    workdir = workdir or tempfile.mkdtemp(prefix="dedup_pipeline_")
    in_fp = input_fingerprint or f"volatile-{run_id}"
    cfg_fp = cfg.fingerprint()

    def stage(name: str, compute, extra_cfg: str = "") -> tuple[DataFrame, bool]:
        return run_stage(
            spark, workdir, name, in_fp, cfg_fp + extra_cfg, compute, run_id=run_id
        )

    # --- ids: url → 64-bit id; keep text as-is (byte-identity invariant)
    docs, _ = stage(
        "ids",
        lambda: pages.select(
            F.col("url"),
            F.xxhash64("url").alias("doc_id"),
            F.col("text"),
        ),
    )

    # --- collapse exact duplicates before any pairwise work
    def _collapse() -> DataFrame:
        reps, membership = collapse_exact(docs, text_col="text", id_col="doc_id")
        return reps.join(
            membership.groupBy("rep_id").agg(F.collect_list("id").alias("member_ids")),
            "rep_id",
        )

    collapsed, _ = stage("collapse", _collapse)
    # detectors are UDF-bound, not byte-bound: spread them over the cores
    # rather than letting AQE coalesce the (small-on-disk) checkpoint files
    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    # eager checkpoint: all three detectors consume reps concurrently;
    # materializing once avoids three reads + repartitions of the collapse
    # checkpoint
    reps = (
        collapsed.select("rep_id", "text", "freq")
        .where(F.length("text") >= cfg.min_text_chars)
        .repartition(n_parts, "rep_id")
        .localCheckpoint(eager=True)
    )

    # the three detectors are independent given reps — submit their stage
    # jobs concurrently so one detector's serialized tail (AQE re-plans,
    # driver round-trips, small final stages) overlaps another's map work.
    # This is what lifts cluster utilization (and N→4N scaling): the
    # scheduler interleaves their tasks instead of idling between stages.
    detector_work: list[tuple[str, object, object]] = []
    if cfg.use_minhash:
        detector_work.append(
            (
                "minhash",
                lambda: minhash_lsh_pairs(reps, cfg.minhash, id_col="rep_id", text_col="text")[0],
                lambda df: df.select("id1", "id2"),
            )
        )
    if cfg.use_simhash:
        detector_work.append(
            (
                "simhash",
                lambda: simhash_pairs(reps, cfg.simhash, id_col="rep_id", text_col="text")[0],
                lambda df: df.select("id1", "id2"),
            )
        )
    if cfg.use_substring:
        detector_work.append(
            (
                "substring",
                lambda: substring_pairs(reps, cfg.substring, id_col="rep_id", text_col="text")[0],
                lambda df: df.select(
                    F.col("inner_id").alias("id1"), F.col("outer_id").alias("id2")
                ),
            )
        )

    edge_frames: list[DataFrame] = []
    n_threads = cfg.detector_threads or max(len(detector_work), 1)
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        futures = [
            (post, pool.submit(stage, name, compute))
            for name, compute, post in detector_work
        ]
        for post, fut in futures:
            df, _resumed = fut.result()
            edge_frames.append(post(df))

    def _components() -> DataFrame:
        if not edge_frames:
            return reps.select(
                F.col("rep_id").alias("id"), F.col("rep_id").alias("component")
            )
        edges = edge_frames[0]
        for e in edge_frames[1:]:
            edges = edges.unionByName(e)
        return connected_components(
            edges, src="id1", dst="id2", nodes=reps.select(F.col("rep_id").alias("id"))
        )

    labels, _ = stage("components", _components)

    # --- expand back to every url through the exact-dup membership
    def _expand() -> DataFrame:
        membership = collapsed.select(
            "rep_id", F.explode("member_ids").alias("doc_id")
        )
        rep_labels = labels.select(
            F.col("id").alias("rep_id"), F.col("component").alias("cluster_id")
        )
        per_doc = membership.join(rep_labels, "rep_id", "left").select(
            "doc_id",
            F.coalesce("cluster_id", F.col("rep_id")).alias("cluster_id"),
        )
        out = docs.join(per_doc, "doc_id", "left").select(
            "url",
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        cluster_sizes = out.groupBy("cluster_id").agg(F.count("*").alias("_sz"))
        return out.join(cluster_sizes, "cluster_id").select(
            "url", "doc_id", "cluster_id", (F.col("_sz") > 1).alias("is_duplicate")
        )

    assignments, _ = stage("expand", _expand)
    return assignments
