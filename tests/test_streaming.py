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


def test_stream_to_index_roundtrip_with_kills(spark, tmp_path):
    """End-to-end composition a real user runs: a page stream staged via
    ``stage_for_indexing`` — KILLED mid-stream and restarted from its
    checkpoint — feeds a chunked ``build_index(path, n_chunks=3,
    resume=True)`` that is itself KILLED mid-build and resumed. The final
    index must equal a one-shot batch build over the same pages
    byte-for-byte (postings blocks + term stats)."""
    import numpy as np

    from review_recommender_spark.config import EngineConfig, bm25_north
    from review_recommender_spark.index.build import (
        LOCAL_TF, LOCAL_TF_FORMAT_VERSION, _doc_rows, _file_chunk_groups,
        _tokens_df, build_index)
    from review_recommender_spark.index.tableio import (ChunkedWriter,
                                                        TableIO,
                                                        config_fingerprint)
    import dataclasses

    cfg = EngineConfig(bm25=bm25_north())
    cfg = dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, range_shift=6,
                                       term_buckets=8))

    pdf = pages_pdf(np.arange(600))
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    src = tmp_path / "rt_src"
    for lo, hi, name in [(0, 200, "b1"), (200, 400, "b2"), (400, 600, "b3")]:
        (spark.createDataFrame(pdf.iloc[lo:hi], schema=PAGES_SCHEMA)
         .coalesce(1).write.parquet(str(src / name)))

    staging = str(tmp_path / "rt_staging")
    ck = str(tmp_path / "rt_ck")
    schema = spark.read.parquet(str(src / "b1")).schema

    def stream():
        s = (spark.readStream.schema(schema)
             .option("recursiveFileLookup", "true")
             .option("maxFilesPerTrigger", "1").parquet(str(src)))
        return stage_for_indexing(s, staging, ck).start()

    # run once, drain, stop — then "kill & restart": a second start from
    # the same checkpoint must not duplicate epochs (idempotent staging)
    q = stream()
    q.awaitTermination(120)
    q = stream()  # restart: no new files → no new epochs
    q.awaitTermination(60)
    staged = spark.read.option("recursiveFileLookup", "true") \
        .parquet(staging)
    assert staged.count() == 600

    # mid-build kill: pre-complete only chunk 0 (exactly what a killed
    # chunked build leaves behind), then resume over the remaining chunks
    groups, digest = _file_chunk_groups(staging, 3)
    fp = config_fingerprint(
        format_version=LOCAL_TF_FORMAT_VERSION, tokenizer="simple_en_v1",
        cap=cfg.index.token_cap, block=cfg.index.block_size,
        shift=cfg.index.range_shift, n_chunks=3, files=digest)
    io_s = TableIO(str(tmp_path / "rt_idx_stream"))
    writer = ChunkedWriter(io=io_s, name=LOCAL_TF, n_chunks=3,
                           input_fingerprint=fp)
    chunk0 = spark.read.schema(staged.schema).parquet(*groups[0])
    writer.write_chunk(
        _doc_rows(_tokens_df(chunk0, cfg, "doc_id", "text")), 0)
    assert writer.pending_chunks() == [1, 2]
    idx_stream = build_index(spark, staging, io_s, cfg, n_chunks=3,
                             resume=True)
    assert writer.pending_chunks() == []

    idx_batch = build_index(spark, pages,
                            TableIO(str(tmp_path / "rt_idx_batch")), cfg,
                            n_chunks=1)
    from tests.test_resume import _collect_index
    assert _collect_index(spark, idx_stream) == _collect_index(spark,
                                                               idx_batch)
    assert (idx_stream.n_docs, idx_stream.avgdl, idx_stream.vocab_size) \
        == (idx_batch.n_docs, idx_batch.avgdl, idx_batch.vocab_size)


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


def _delta_cfg():
    import dataclasses

    from review_recommender_spark.config import EngineConfig, bm25_north
    cfg = EngineConfig(bm25=bm25_north())
    return dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, range_shift=6,
                                       term_buckets=8))


def test_delta_merge_append_byte_identical_with_lineage(spark, tmp_path):
    """Incremental maintenance, the common shape: an epoch of NEW doc_ids
    beyond the main corpus (mostly-new ranges → most main groups pass
    through untouched). The merged index must equal a from-scratch build
    over corpus+delta BYTE-FOR-BYTE, and the new snapshot's lineage must
    point at the parent index's postings snapshot."""
    import numpy as np

    from review_recommender_spark.index.build import (POSTINGS, build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO
    from tests.test_resume import _collect_index

    cfg = _delta_cfg()
    main_pages = spark.createDataFrame(pages_pdf(np.arange(600)),
                                       schema=PAGES_SCHEMA)
    delta_pages = spark.createDataFrame(pages_pdf(np.arange(600, 800)),
                                        schema=PAGES_SCHEMA)
    all_pages = spark.createDataFrame(pages_pdf(np.arange(800)),
                                      schema=PAGES_SCHEMA)

    main = build_index(spark, main_pages, TableIO(str(tmp_path / "main")),
                       cfg)
    parent_snap = main.io.current_snapshot(POSTINGS)["snapshot_id"]
    merged = delta_merge_index(spark, main, delta_pages,
                               TableIO(str(tmp_path / "merged")))
    scratch = build_index(spark, all_pages,
                          TableIO(str(tmp_path / "scratch")), cfg)

    assert _collect_index(spark, merged) == _collect_index(spark, scratch)
    assert (merged.n_docs, merged.avgdl, merged.vocab_size) \
        == (scratch.n_docs, scratch.avgdl, scratch.vocab_size)
    snap = merged.io.current_snapshot(POSTINGS)
    assert snap["lineage"]["parent"] == parent_snap
    assert snap["lineage"]["mode"] == "delta_merge"


def test_delta_merge_interleaved_ranges_byte_identical(spark, tmp_path):
    """Worst case for the merge kernel: delta doc_ids INTERLEAVE with the
    main corpus inside existing ranges, so touched groups must re-sort
    main + delta postings together and re-cut every block boundary."""
    import numpy as np

    from review_recommender_spark.index.build import (build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO
    from tests.test_resume import _collect_index

    cfg = _delta_cfg()
    ids = np.arange(500)
    main_pages = spark.createDataFrame(pages_pdf(ids[ids % 5 != 0]),
                                       schema=PAGES_SCHEMA)
    delta_pages = spark.createDataFrame(pages_pdf(ids[ids % 5 == 0]),
                                        schema=PAGES_SCHEMA)
    all_pages = spark.createDataFrame(pages_pdf(ids), schema=PAGES_SCHEMA)

    main = build_index(spark, main_pages, TableIO(str(tmp_path / "mi")),
                       cfg)
    merged = delta_merge_index(spark, main, delta_pages,
                               TableIO(str(tmp_path / "me")))
    scratch = build_index(spark, all_pages, TableIO(str(tmp_path / "sc")),
                          cfg)
    assert _collect_index(spark, merged) == _collect_index(spark, scratch)


def _recrawled(ids: "np.ndarray", salt: int = 10_000):
    """New-version pages for existing doc_ids: content generated from a
    shifted id stream (deterministically DIFFERENT text), doc_id set back
    to the re-crawled id — the 'same url, new text' shape."""
    import numpy as np  # noqa: F401
    pdf = pages_pdf(ids + salt)
    pdf["doc_id"] = ids
    return pdf


def test_delta_merge_upsert_byte_identical(spark, tmp_path):
    """Re-crawled docs (same doc_id, NEW text) merged with mode='upsert'
    must equal a from-scratch build over (unchanged docs + new versions +
    new docs) byte-for-byte: the old versions' postings are purged from
    touched groups, their doc_stats rows replaced, idf/avgdl recomputed."""
    import numpy as np
    import pandas as pd

    from review_recommender_spark.index.build import (POSTINGS, build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO
    from tests.test_resume import _collect_index

    cfg = _delta_cfg()
    main_pdf = pages_pdf(np.arange(600))
    re_pdf = _recrawled(np.arange(550, 600))     # replaced versions
    new_pdf = pages_pdf(np.arange(600, 650))     # brand-new docs
    delta_pdf = pd.concat([re_pdf, new_pdf], ignore_index=True)
    scratch_pdf = pd.concat([main_pdf.iloc[:550], re_pdf, new_pdf],
                            ignore_index=True)

    main = build_index(spark,
                       spark.createDataFrame(main_pdf, schema=PAGES_SCHEMA),
                       TableIO(str(tmp_path / "um")), cfg)
    merged = delta_merge_index(
        spark, main, spark.createDataFrame(delta_pdf, schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "ume")), mode="upsert")
    scratch = build_index(
        spark, spark.createDataFrame(scratch_pdf, schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "usc")), cfg)
    assert _collect_index(spark, merged) == _collect_index(spark, scratch)
    assert (merged.n_docs, merged.avgdl, merged.vocab_size) \
        == (scratch.n_docs, scratch.avgdl, scratch.vocab_size)
    snap = merged.io.current_snapshot(POSTINGS)
    assert snap["lineage"]["purged"] == 50
    # staging tables are dropped after the commit (not part of the
    # index table contract)
    assert not merged.io.exists("delta_local_tf")
    assert not merged.io.exists("delta_partials")


def test_delta_merge_delete_only_byte_identical(spark, tmp_path):
    """Tombstone-only merge (empty delta + delete_doc_ids) must equal a
    from-scratch build over the surviving docs — postings purged,
    doc_stats rows gone, n_docs/avgdl/idf all shrunk."""
    import numpy as np

    from review_recommender_spark.index.build import (build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO
    from tests.test_resume import _collect_index

    cfg = _delta_cfg()
    ids = np.arange(500)
    dead = np.concatenate([[10, 100], np.arange(250, 261)])
    main = build_index(
        spark, spark.createDataFrame(pages_pdf(ids), schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "dm0")), cfg)
    empty = spark.createDataFrame([], PAGES_SCHEMA)
    merged = delta_merge_index(
        spark, main, empty, TableIO(str(tmp_path / "dme")),
        delete_doc_ids=[int(x) for x in dead])
    scratch = build_index(
        spark,
        spark.createDataFrame(pages_pdf(ids[~np.isin(ids, dead)]),
                              schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "dsc")), cfg)
    assert _collect_index(spark, merged) == _collect_index(spark, scratch)
    assert (merged.n_docs, merged.avgdl, merged.vocab_size) \
        == (scratch.n_docs, scratch.avgdl, scratch.vocab_size)
    # deleting a doc that never existed is a no-op, not an error
    merged2 = delta_merge_index(
        spark, main, empty, TableIO(str(tmp_path / "dme2")),
        delete_doc_ids=[int(x) for x in dead] + [999_999])
    assert _collect_index(spark, merged2) == _collect_index(spark, scratch)


def test_delta_merge_upsert_plus_delete_byte_identical(spark, tmp_path):
    """The full incremental shape in one epoch: new docs + re-crawled
    docs + tombstones, vs a scratch rebuild of the resulting corpus."""
    import numpy as np
    import pandas as pd

    from review_recommender_spark.index.build import (build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO
    from tests.test_resume import _collect_index

    cfg = _delta_cfg()
    main_pdf = pages_pdf(np.arange(400))
    re_ids = np.arange(100, 130)
    dead = np.arange(300, 320)
    re_pdf = _recrawled(re_ids)
    new_pdf = pages_pdf(np.arange(400, 450))
    delta_pdf = pd.concat([re_pdf, new_pdf], ignore_index=True)
    keep = ~np.isin(np.arange(400), np.concatenate([re_ids, dead]))
    scratch_pdf = pd.concat([main_pdf.iloc[keep], re_pdf, new_pdf],
                            ignore_index=True)

    main = build_index(
        spark, spark.createDataFrame(main_pdf, schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "xm")), cfg)
    merged = delta_merge_index(
        spark, main, spark.createDataFrame(delta_pdf, schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "xme")), mode="upsert",
        delete_doc_ids=[int(x) for x in dead])
    scratch = build_index(
        spark, spark.createDataFrame(scratch_pdf, schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "xsc")), cfg)
    assert _collect_index(spark, merged) == _collect_index(spark, scratch)
    assert (merged.n_docs, merged.avgdl, merged.vocab_size) \
        == (scratch.n_docs, scratch.avgdl, scratch.vocab_size)


def test_merge_staged_epochs_one_pass_latest_wins(spark, tmp_path):
    """A k-epoch staging backlog folds into the index in ONE upsert merge
    with keep-latest-per-doc semantics: event time (warc_ts) wins over
    epoch arrival order, epoch order breaks ts ties. Byte-identical to a
    from-scratch build over (main with the final versions + new docs),
    paying the snapshot rewrite once, not once per epoch."""
    import numpy as np
    import pandas as pd

    from review_recommender_spark.index.build import POSTINGS, build_index
    from review_recommender_spark.index.tableio import TableIO
    from review_recommender_spark.streaming.ingest import merge_staged_epochs
    from tests.test_resume import _collect_index

    cfg = _delta_cfg()
    main_pdf = pages_pdf(np.arange(400))

    # epoch 0: new docs 400..440 + re-crawl v1 of 100..120 (ts +Jan-2024;
    # doc 119's v1 carries a LATER event time than its epoch-1 v2 — an
    # out-of-order arrival whose event time must still win)
    v1 = _recrawled(np.arange(100, 120), salt=10_000)
    v1["warc_ts"] = pd.Timestamp("2024-01-01")
    v1.loc[v1["doc_id"] == 119, "warc_ts"] = pd.Timestamp("2024-06-01")
    ep0 = pd.concat([pages_pdf(np.arange(400, 440)), v1],
                    ignore_index=True)
    # epoch 1: new docs 440..480 + re-crawl v2 of 110..130 (ts Feb-2024)
    v2 = _recrawled(np.arange(110, 130), salt=20_000)
    v2["warc_ts"] = pd.Timestamp("2024-02-01")
    ep1 = pd.concat([pages_pdf(np.arange(440, 480)), v2],
                    ignore_index=True)

    staging = tmp_path / "bk_staging"
    for i, ep in enumerate((ep0, ep1)):
        (spark.createDataFrame(ep, schema=PAGES_SCHEMA).coalesce(1)
         .write.parquet(str(staging / f"epoch={i}")))

    main = build_index(spark,
                       spark.createDataFrame(main_pdf, schema=PAGES_SCHEMA),
                       TableIO(str(tmp_path / "bkm")), cfg)
    merged = merge_staged_epochs(spark, main, str(staging),
                                 TableIO(str(tmp_path / "bkmerged")))

    # expected final text per doc: v2 wins the 110..129 overlap EXCEPT
    # doc 119 (its v1 event time is later); v1 keeps 100..109
    final = pd.concat([
        main_pdf[(main_pdf["doc_id"] < 100) | (main_pdf["doc_id"] >= 130)],
        v1[v1["doc_id"] < 110],
        v1[v1["doc_id"] == 119],
        v2[v2["doc_id"] != 119],
        pages_pdf(np.arange(400, 480)),
    ], ignore_index=True)
    scratch = build_index(
        spark, spark.createDataFrame(final, schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "bksc")), cfg)
    assert _collect_index(spark, merged) == _collect_index(spark, scratch)
    assert (merged.n_docs, merged.avgdl, merged.vocab_size) \
        == (scratch.n_docs, scratch.avgdl, scratch.vocab_size)
    # one merge = one child snapshot, 30 purged (the re-crawled doc set)
    snap = merged.io.current_snapshot(POSTINGS)
    assert snap["lineage"]["mode"] == "delta_merge"
    assert snap["lineage"]["purged"] == 30


def test_delta_merge_guards(spark, tmp_path):
    """Ambiguous/unsound epochs must be rejected: a doc both deleted and
    delivered, and duplicate doc_ids within one delta."""
    import numpy as np
    import pandas as pd

    from review_recommender_spark.index.build import (build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO

    cfg = _delta_cfg()
    main = build_index(
        spark,
        spark.createDataFrame(pages_pdf(np.arange(200)),
                              schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "gm")), cfg)
    delta = spark.createDataFrame(pages_pdf(np.arange(200, 250)),
                                  schema=PAGES_SCHEMA)
    with pytest.raises(ValueError, match="both the delta and delete"):
        delta_merge_index(spark, main, delta,
                          TableIO(str(tmp_path / "g1")),
                          delete_doc_ids=[220])
    dup_pdf = pd.concat([pages_pdf(np.arange(200, 230))] * 2,
                        ignore_index=True)
    with pytest.raises(ValueError, match="duplicate doc_ids"):
        delta_merge_index(spark, main,
                          spark.createDataFrame(dup_pdf,
                                                schema=PAGES_SCHEMA),
                          TableIO(str(tmp_path / "g2")))


def test_delta_merge_rejects_duplicate_doc_ids(spark, tmp_path):
    """Re-indexing an existing doc through the merge would double-count
    its tf — the guard must refuse."""
    import numpy as np

    from review_recommender_spark.index.build import (build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO

    cfg = _delta_cfg()
    pages = spark.createDataFrame(pages_pdf(np.arange(300)),
                                  schema=PAGES_SCHEMA)
    main = build_index(spark, pages, TableIO(str(tmp_path / "dm")), cfg)
    dup = spark.createDataFrame(pages_pdf(np.arange(250, 350)),
                                schema=PAGES_SCHEMA)
    with pytest.raises(ValueError, match="already in the main index"):
        delta_merge_index(spark, main, dup, TableIO(str(tmp_path / "dd")))


def test_delta_merge_from_staged_stream(spark, tmp_path):
    """The composition the operator exists for: new pages arrive on a
    stream, ``stage_for_indexing`` lands them in a staging table, and
    ``delta_merge_index`` folds the staged epoch into the main index —
    equal to a from-scratch rebuild over main+staged."""
    import numpy as np

    from review_recommender_spark.index.build import (build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO
    from tests.test_resume import _collect_index

    cfg = _delta_cfg()
    main_pdf = pages_pdf(np.arange(400))
    delta_pdf = pages_pdf(np.arange(400, 520))
    main = build_index(spark,
                       spark.createDataFrame(main_pdf, schema=PAGES_SCHEMA),
                       TableIO(str(tmp_path / "sm")), cfg)

    src = tmp_path / "sd_src"
    (spark.createDataFrame(delta_pdf, schema=PAGES_SCHEMA)
     .coalesce(1).write.parquet(str(src / "b1")))
    staging = str(tmp_path / "sd_staging")
    schema = spark.read.parquet(str(src / "b1")).schema
    s = (spark.readStream.schema(schema)
         .option("recursiveFileLookup", "true").parquet(str(src)))
    q = stage_for_indexing(s, staging, str(tmp_path / "sd_ck")).start()
    q.awaitTermination(120)

    staged = spark.read.option("recursiveFileLookup", "true") \
        .parquet(staging)
    merged = delta_merge_index(spark, main, staged,
                               TableIO(str(tmp_path / "smerged")))
    scratch = build_index(
        spark,
        spark.createDataFrame(pages_pdf(np.arange(520)),
                              schema=PAGES_SCHEMA),
        TableIO(str(tmp_path / "sscratch")), cfg)
    assert _collect_index(spark, merged) == _collect_index(spark, scratch)
