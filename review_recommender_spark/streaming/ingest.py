"""Structured Streaming ingest path.

The reference is strictly batch (SURVEY.md §2.15); its chunked readers and
resume-by-rowcount appends (etl/02:117-126, nlp/11:127-167) are the batch
seeds of this module. For a live page feed the natural Spark shape is:

  readStream(pages) → watermark on warc_ts → dropDuplicates(url) within
  the watermark → windowed ingest stats → foreachBatch appending to the
  staging table the (batch) index builder consumes incrementally.

These functions are plain stream-DataFrame transformations so tests can
drive them with a file source + `processAllAvailable()` (synchronous
drain), and production would swap in kafka/kinesis sources unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_pages_stream(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-url within the watermark horizon."""
    return (pages.withWatermark("warc_ts", watermark)
            .dropDuplicates(["url"]))


def windowed_ingest_stats(pages: DataFrame, watermark: str = "1 hour",
                          window: str = "10 minutes") -> DataFrame:
    """Tumbling-window ingest metrics per language (append-mode safe)."""
    return (pages.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"), "lang")
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.length("text")).alias("n_chars")))


def stage_for_indexing(pages: DataFrame, staging_path: str,
                       checkpoint_path: str):
    """foreachBatch append into the staging table the chunked index build
    resumes from — each micro-batch is idempotent via epoch subdirs."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{staging_path}/epoch={epoch_id}"))

    return (pages.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True))
