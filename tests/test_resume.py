"""Resumable index build: partition-level checkpoints with lineage, the
Spark-native replacement for the reference's resume-by-rowcount
(nlp/11_build_product_embeddings.py:127-167)."""

import dataclasses
import json
import os

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.config import EngineConfig, bm25_north
from review_recommender_spark.index.build import (LOCAL_TF, build_index,
                                                  term_bucket_py)
from review_recommender_spark.index.tableio import (ChunkedWriter, TableIO,
                                                    config_fingerprint)


def _cfg():
    cfg = EngineConfig(bm25=bm25_north())
    return dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, range_shift=6,
                                       term_buckets=8))


def _collect_index(spark, idx):
    posts = sorted(
        (r["term"], r["range_id"], r["block_id"], bytes(r["doc_bytes"]),
         bytes(r["tf_bytes"]), bytes(r["dl_bytes"]))
        for r in idx.postings(spark).collect())
    stats = sorted((r["term"], r["df"], r["idf"])
                   for r in idx.term_stats(spark).collect())
    return posts, stats


def test_resume_skips_completed_chunks_and_matches(spark, small_pages,
                                                   tmp_path):
    cfg = _cfg()
    io_full = TableIO(str(tmp_path / "full"))
    idx_full = build_index(spark, small_pages, io_full, cfg, n_chunks=4)

    # simulate a killed build: write only chunks 0 and 2, then "crash"
    io_part = TableIO(str(tmp_path / "partial"))
    from review_recommender_spark.index.build import LOCAL_TF_FORMAT_VERSION
    fp = config_fingerprint(format_version=LOCAL_TF_FORMAT_VERSION,
                            tokenizer="simple_en_v1", cap=cfg.index.token_cap,
                            block=cfg.index.block_size,
                            shift=cfg.index.range_shift, n_chunks=4)
    from review_recommender_spark.index.build import _doc_rows, _tokens_df
    writer = ChunkedWriter(io=io_part, name=LOCAL_TF, n_chunks=4,
                           input_fingerprint=fp)
    for i in (0, 2):
        chunk = small_pages.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
        writer.write_chunk(
            _doc_rows(_tokens_df(chunk, cfg, "doc_id", "text")), i)
    assert writer.pending_chunks() == [1, 3]

    # resume: build_index must only run the missing chunks, then finish
    idx_res = build_index(spark, small_pages, io_part, cfg, n_chunks=4)
    assert writer.pending_chunks() == []

    assert _collect_index(spark, idx_res) == _collect_index(spark, idx_full)
    assert idx_res.n_docs == idx_full.n_docs
    assert idx_res.avgdl == idx_full.avgdl


def test_file_aligned_chunks_single_input_pass(spark, small_pages, tmp_path):
    """Path-mode chunked build: chunk groups PARTITION the input file set
    (each chunk scans ~1/n of the files, one total input pass — no
    per-chunk full rescan), the result is identical to an unchunked build,
    and changing the input invalidates resume."""
    from review_recommender_spark.index.build import _file_chunk_groups

    src = str(tmp_path / "pages_src")
    small_pages.repartition(8).write.parquet(src)
    cfg = _cfg()

    groups, digest = _file_chunk_groups(src, 4)
    allf = [f for g in groups for f in g]
    assert len(allf) == len(set(allf)) == 8          # disjoint + complete
    assert max(len(g) for g in groups) <= 2           # balanced: ~1/n each

    idx_f = build_index(spark, src, TableIO(str(tmp_path / "bychunkf")),
                        cfg, n_chunks=4)
    idx_1 = build_index(spark, small_pages,
                        TableIO(str(tmp_path / "bychunk1")), cfg, n_chunks=1)
    assert _collect_index(spark, idx_f) == _collect_index(spark, idx_1)
    assert (idx_f.n_docs, idx_f.avgdl) == (idx_1.n_docs, idx_1.avgdl)

    # appending a file to the input changes the listing digest → the old
    # chunk checkpoints no longer match and a resume must redo everything
    small_pages.limit(1).write.mode("append").parquet(src)
    _, digest2 = _file_chunk_groups(src, 4)
    assert digest2 != digest


def test_fingerprint_mismatch_forces_rebuild(tmp_path, spark, small_pages):
    cfg = _cfg()
    io = TableIO(str(tmp_path / "fp"))
    build_index(spark, small_pages, io, cfg, n_chunks=2)
    # a config change (different cap) must invalidate every chunk
    cfg2 = dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, token_cap=4999))
    from review_recommender_spark.index.build import LOCAL_TF_FORMAT_VERSION
    fp2 = config_fingerprint(format_version=LOCAL_TF_FORMAT_VERSION,
                             tokenizer="simple_en_v1",
                             cap=cfg2.index.token_cap,
                             block=cfg2.index.block_size,
                             shift=cfg2.index.range_shift, n_chunks=2)
    w = ChunkedWriter(io=io, name=LOCAL_TF, n_chunks=2,
                      input_fingerprint=fp2)
    assert w.pending_chunks() == [0, 1]


def test_snapshot_lineage_and_metrics(spark, small_index):
    io = small_index.io
    for table in ["local_tf", "doc_stats", "postings", "term_stats",
                  "corpus_stats"]:
        snap = io.current_snapshot(table)
        assert snap is not None, table
        assert snap["snapshot_id"]
        assert "lineage" in snap and "metrics" in snap
    # chain: corpus_stats ← term_stats ← postings ← local_tf
    assert (io.current_snapshot("term_stats")["lineage"]["parent"]
            == io.current_snapshot("postings")["snapshot_id"])
    ts = io.current_snapshot("term_stats")
    assert ts["metrics"]["vocab_size"] == small_index.vocab_size
    # row-count metrics ride every snapshot (footer-derived, no scan)
    for table in ["doc_stats", "postings"]:
        assert io.current_snapshot(table)["metrics"].get("rows", 0) > 0, \
            table
    # chunk manifests carry the input fingerprint + per-chunk row counts
    chunk_manifest = os.path.join(io.path("local_tf"), "chunk=0",
                                  "_MANIFEST.json")
    with open(chunk_manifest) as f:
        m = json.load(f)
    assert m["input_fingerprint"]
    assert m["metrics"].get("rows", 0) > 0


def test_term_bucket_partition_layout(spark, small_index):
    """postings are physically partitioned by term_bucket and the bucket
    function is reproducible driver-side (query-time pruning contract)."""
    root = small_index.io.path("postings")
    buckets = [d for d in os.listdir(root) if d.startswith("term_bucket=")]
    assert len(buckets) > 1
    rows = small_index.postings(spark).select("term", "term_bucket") \
        .limit(200).collect()
    nb = small_index.cfg.index.term_buckets
    for r in rows:
        assert r["term_bucket"] == term_bucket_py(r["term"], nb)
