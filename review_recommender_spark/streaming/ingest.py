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


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      ts_col: str = "ts", key_col: str = "user_id"
                      ) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running sessionization with the same gap rule as the batch
    ``q_sessionize`` entry (new session when > gap since the previous
    event). State per user = (last event time, session count, event
    count); each micro-batch emits the user's updated running totals.

    Ordering contract: events are sorted by time WITHIN each micro-batch
    only. When the feed delivers micro-batches in event-time order (file
    sources over time-partitioned data, or any at-least-once log replayed
    in order), a full drain equals the batch computation on the same data
    (asserted cross-engine in tests/test_streaming.py under exactly that
    feed). A late event that lands in a later micro-batch than a newer one
    is counted in arrival order — it can open a spurious session (and a
    negative gap never decrements ``last_us``). Feeds without cross-batch
    time order need a watermark + event-time buffer upstream of this
    operator; the streaming-vs-batch equality claim does NOT extend to
    them.

    State is O(1) per user — three longs — so 10^9 users is ~24 GB of
    state across the fleet, well inside the state store's envelope."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = f"{key_col} long, n_sessions long, n_events long"
    state_schema = "last_us long, n_sessions long, n_events long"

    def update(key, pdfs, state):
        import pandas as pd
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = None, 0, 0
        ts_all = []
        for pdf in pdfs:
            ts_all.append(pd.to_datetime(pdf[ts_col]).astype("int64")
                          // 1000)
        for t in sorted(pd.concat(ts_all)) if ts_all else []:
            t = int(t)
            if last_us is None or t - last_us > gap_us:
                n_sessions += 1
            n_events += 1
            last_us = t
        state.update((int(last_us or 0), int(n_sessions), int(n_events)))
        yield pd.DataFrame({key_col: [key[0]],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events]})

    import pandas as pd  # noqa: F401  (kernel dependency, imported lazily)
    return (events.groupBy(key_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


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


def merge_staged_epochs(spark, main, staging_path: str, out_io, *,
                        doc_id_col: str = "doc_id",
                        ts_col: str = "warc_ts",
                        text_col: str = "text",
                        shuffle_partitions: int | None = None):
    """Fold EVERY staged epoch into the index in ONE delta merge.

    ``stage_for_indexing`` lands micro-batches as ``epoch=N`` partition
    dirs; merging them one epoch at a time rewrites the untouched main
    blocks once PER EPOCH, so a staging backlog of k epochs costs k
    full-snapshot rewrites. This helper reads the whole staging table
    (Spark discovers ``epoch`` as a partition column), resolves
    re-crawls WITHIN the backlog keep-latest per doc — by event time
    ``ts_col``, then ``epoch`` arrival order, then a content hash as a
    deterministic last tie-break — and runs a single
    ``delta_merge_index(mode='upsert')``, so the snapshot rewrite and
    the global stats recompute are paid once regardless of backlog
    depth. The dedup shuffle is over the BACKLOG only (delta-sized),
    never the main corpus.

    Byte-identity with a from-scratch rebuild over (main ∪ final
    versions) is gated in tests/test_streaming.py alongside the
    single-epoch staged-stream test."""
    from pyspark.sql import Window

    from ..index.build import delta_merge_index

    staged = spark.read.parquet(staging_path)
    if "epoch" not in staged.columns:
        staged = staged.withColumn("epoch", F.lit(0))
    w = (Window.partitionBy(doc_id_col)
         .orderBy(F.desc(ts_col), F.desc("epoch"),
                  F.desc(F.crc32(F.col(text_col)))))
    latest = (staged.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn", "epoch"))
    return delta_merge_index(spark, main, latest, out_io,
                             doc_id_col=doc_id_col, text_col=text_col,
                             shuffle_partitions=shuffle_partitions,
                             mode="upsert")
