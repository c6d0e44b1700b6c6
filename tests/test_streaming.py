"""Structured Streaming smoke: file source → watermark dedup / windowed
aggregation / foreachBatch staging, drained synchronously."""

import os

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.corpus.pages import PAGES_SCHEMA, pages_pdf
from review_recommender_spark.streaming.ingest import (dedup_pages_stream,
                                                       stage_for_indexing,
                                                       windowed_ingest_stats)


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    import numpy as np
    root = tmp_path_factory.mktemp("stream_src")
    pdf = pages_pdf(np.arange(300))
    # plant duplicate urls (same url re-crawled)
    dup = pdf.iloc[:30].copy()
    spark.createDataFrame(pdf, schema=PAGES_SCHEMA).write.parquet(
        str(root / "batch1"))
    spark.createDataFrame(dup, schema=PAGES_SCHEMA).write.parquet(
        str(root / "batch2"))
    return str(root)


def _read_stream(spark, src):
    from pyspark.sql import types as T
    schema = spark.read.parquet(src + "/batch1").schema
    return (spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true").parquet(src))


def test_stream_dedup_by_url(spark, stream_src, tmp_path):
    stream = dedup_pages_stream(_read_stream(spark, stream_src))
    q = (stream.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck1")).start())
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT url, count(*) n FROM dedup_out GROUP BY url "
                    "HAVING count(*) > 1").collect()
    assert out == []  # every url exactly once
    total = spark.sql("SELECT count(*) n FROM dedup_out").collect()[0]["n"]
    assert total == 300


def test_stream_windowed_stats(spark, stream_src, tmp_path):
    stats = windowed_ingest_stats(_read_stream(spark, stream_src),
                                  window="30 days")
    q = (stats.writeStream.format("memory").queryName("win_out")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM win_out").collect()
    assert rows
    assert sum(r["n_pages"] for r in rows) == 330  # dups counted pre-dedup
    assert {r["lang"] for r in rows} <= {"en", "es", "de", "zh"}


def test_stream_staging_for_index(spark, stream_src, tmp_path):
    staging = str(tmp_path / "staging")
    q = stage_for_indexing(_read_stream(spark, stream_src), staging,
                           str(tmp_path / "ck3")).start()
    q.awaitTermination(60)
    staged = spark.read.option("recursiveFileLookup", "true").parquet(staging)
    assert staged.count() == 330
    assert set(staged.columns) == {"doc_id", "url", "warc_ts", "html",
                                   "text", "lang"}


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: after draining a multi-batch
    stream, per-user running totals equal the BATCH sessionization of the
    same events (30-min gap rule) — a cross-engine consistency gate."""
    from review_recommender_spark.streaming.ingest import sessionize_stream

    events = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                      "event_id"))
    # two time-ordered file batches so state genuinely carries across
    # micro-batches
    cut = events.agg(F.expr("percentile(unix_micros(ts), 0.5)")) \
        .collect()[0][0]
    src = tmp_path / "sess_src"
    (events.filter(F.unix_micros("ts") <= cut).coalesce(1)
     .write.parquet(str(src / "b1")))
    (events.filter(F.unix_micros("ts") > cut).coalesce(1)
     .write.parquet(str(src / "b2")))

    schema = events.schema
    stream = (spark.readStream.schema(schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = (sessionize_stream(stream).writeStream.format("memory")
         .queryName("sess_out").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck_sess")).start())
    q.processAllAvailable()
    q.stop()
    # running totals are monotone; the final state per user is the max
    got = {r["user_id"]: (r["ns"], r["ne"]) for r in spark.sql(
        "SELECT user_id, max(n_sessions) ns, max(n_events) ne "
        "FROM sess_out GROUP BY user_id").collect()}

    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_sess = F.when(F.lag(us).over(w).isNull()
                      | ((us - F.lag(us).over(w)) > 1800 * 1_000_000), 1) \
        .otherwise(0)
    exp = {r["user_id"]: (r["ns"], r["ne"]) for r in
           (events.withColumn("s", new_sess).groupBy("user_id")
            .agg(F.sum("s").alias("ns"), F.count("*").alias("ne"))
            .collect())}
    assert got == exp
