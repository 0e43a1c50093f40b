"""Incremental / streaming ingestion.

The reference's incrementality is flag-based rescanning
(has_*/processed_* + recheck — /root/reference/code/0_update_blockIDs.py:
34-35,65-66; periodic index refresh :121-123). Spark mapping
(SURVEY.md §2.10):

- ``incremental_new_rows``: batch-incremental — anti-join the current
  snapshot against the processed manifest (exactly the must_not-flag scan,
  but set-based instead of per-doc flags).
- ``stream_signatures``: Structured Streaming — readStream over the input
  directory with ``Trigger.AvailableNow``, per-row signature computation
  (the same pandas UDFs as batch — code reuse is total since signatures are
  map-side), ``foreachBatch`` writing signature snapshots. Candidate joins
  and CC stay batch jobs over the accumulated signature table: pair
  generation is a set operation, not a per-event one — the standard
  lambda-ish split for dedup at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.minhash import MinHashConfig, add_signature


def incremental_new_rows(
    snapshot: DataFrame, processed_manifest: DataFrame, key: str = "url"
) -> DataFrame:
    """Rows of ``snapshot`` whose key is not in the manifest (left_anti)."""
    return snapshot.join(processed_manifest.select(key), key, "left_anti")


def stream_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    cfg: MinHashConfig | None = None,
):
    """Start an AvailableNow stream: parquet dir → minhash signatures →
    parquet signature table. Returns the StreamingQuery (caller awaits)."""
    cfg = cfg or MinHashConfig()
    stream = spark.readStream.schema(schema).parquet(input_dir)
    signed = add_signature(
        stream.select("url", "text").withColumn("doc_id", F.xxhash64("url")),
        cfg,
        text_col="text",
    ).select("url", "doc_id", "minhash_sig")

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (
        signed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
