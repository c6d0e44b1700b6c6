"""Determinism across partitioning/parallelism: the same corpus must
produce byte-identical index tables and identical top-k regardless of how
work is split (the sandbox analogue of local[8] == local[32] results —
SURVEY.md §5.2 item 4)."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.config import EngineConfig, bm25_north
from review_recommender_spark.index.build import build_index
from review_recommender_spark.index.tableio import TableIO
from review_recommender_spark.query.bm25 import bm25_topk_exact


def _cfg():
    cfg = EngineConfig(bm25=bm25_north())
    return dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, range_shift=6,
                                       term_buckets=8))


def _fingerprint_index(spark, idx):
    posts = sorted(
        (r["term"], r["range_id"], r["block_id"], bytes(r["doc_bytes"]),
         bytes(r["tf_bytes"]), bytes(r["dl_bytes"]), r["max_tf"], r["min_dl"])
        for r in idx.postings(spark).collect())
    stats = sorted((r["term"], r["df"], round(r["idf"], 15))
                   for r in idx.term_stats(spark).collect())
    return posts, stats


def test_index_identical_across_partitioning(spark, small_pages, tmp_path):
    """2 vs 13 input partitions, 5 vs 17 shuffle partitions, 1 vs 3 chunks
    → byte-identical posting blocks and term stats."""
    cfg = _cfg()
    a = build_index(spark, small_pages.repartition(2),
                    TableIO(str(tmp_path / "a")), cfg, n_chunks=1,
                    shuffle_partitions=5)
    b = build_index(spark, small_pages.repartition(13),
                    TableIO(str(tmp_path / "b")), cfg, n_chunks=3,
                    shuffle_partitions=17)
    assert _fingerprint_index(spark, a) == _fingerprint_index(spark, b)
    assert (a.n_docs, a.avgdl, a.vocab_size) == (b.n_docs, b.avgdl,
                                                 b.vocab_size)


def test_stage_c_modes_byte_identical(spark, small_pages, tmp_path):
    """The packed Stage C (map-side partial posting arrays merged
    shuffle-side) must produce byte-identical postings + term stats to
    the raw-occurrence path, including across different partitioning —
    and with a tiny pack chunk size so map-side chunk flushes SPLIT
    (doc, term) runs and exercise the merge kernel's tf re-sum."""
    from unittest import mock

    from review_recommender_spark.index import build as B

    cfg = _cfg()  # stage_c_mode defaults to 'packed'
    raw_cfg = dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, stage_c_mode="raw"))
    a = build_index(spark, small_pages.repartition(7),
                    TableIO(str(tmp_path / "p")), cfg, n_chunks=1,
                    shuffle_partitions=5)
    b = build_index(spark, small_pages.repartition(3),
                    TableIO(str(tmp_path / "r")), raw_cfg, n_chunks=1,
                    shuffle_partitions=11)
    assert _fingerprint_index(spark, a) == _fingerprint_index(spark, b)
    orig = B._pack_partials_arrow
    with mock.patch.object(
            B, "_pack_partials_arrow",
            lambda c, chunk_tokens=2_000_000: orig(c, chunk_tokens=64)):
        c = build_index(spark, small_pages.repartition(4),
                        TableIO(str(tmp_path / "s")), cfg, n_chunks=1,
                        shuffle_partitions=7)
    assert _fingerprint_index(spark, c) == _fingerprint_index(spark, b)


def test_merge_kernel_resums_split_runs(spark):
    """The shuffle-side merge kernel must tf-SUM duplicate (group, doc)
    postings — the contract that makes partial granularity irrelevant.
    (The r7 arrow pack never splits a doc across flushes, so this is
    exercised directly at the kernel level rather than via a build.)"""
    import numpy as np
    import pandas as pd
    from review_recommender_spark.index import build as B
    from review_recommender_spark.index.codec import decode_block

    def part(docs, tfs, dls):
        return (np.asarray(docs, np.int64).tobytes(),
                np.asarray(tfs, np.int32).tobytes(),
                np.asarray(dls, np.int32).tobytes())

    d1, t1, l1 = part([5, 9], [2, 1], [40, 50])
    d2, t2, l2 = part([9, 11], [3, 4], [50, 60])   # doc 9 split across partials
    pdf = pd.DataFrame({
        "term": ["alpha", "alpha"], "range_id": [0, 0], "n": [2, 2],
        "doc_arr": [d1, d2], "tf_arr": [t1, t2], "dl_arr": [l1, l2]})
    out = list(B._merge_encode_partials(B.EngineConfig())([pdf]))
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    docs, tfs, dls = decode_block(bytes(row["doc_bytes"]),
                                  bytes(row["tf_bytes"]),
                                  bytes(row["dl_bytes"]), int(row["n"]))
    assert list(docs) == [5, 9, 11]
    assert list(tfs) == [2, 4, 4]      # doc 9: 1 + 3 re-summed
    assert list(dls) == [40, 50, 60]


def test_topk_stable_across_runs(spark, small_index):
    """Repeated execution of the same query must return identical rows
    (ties broken by doc_id, float sums stable at comparison precision)."""
    q = "wireless bluetooth headphones"
    runs = [bm25_topk_exact(spark, small_index, q, k=20).collect()
            for _ in range(3)]
    base = [(r["doc_id"], round(r["score"], 10)) for r in runs[0]]
    for other in runs[1:]:
        assert [(r["doc_id"], round(r["score"], 10)) for r in other] == base


def test_hybrid_stable_across_partitioning(spark, small_pages, small_index):
    """Dense pool selection uses a partition-invariant total order
    (float32 desc, doc_id asc) — repartitioning embeddings must not change
    hybrid results."""
    from review_recommender_spark.corpus.pages import page_meta_cols
    from review_recommender_spark.query.encoder import embed_documents
    from review_recommender_spark.query.search import hybrid_search

    emb = embed_documents(small_pages.select("doc_id", "text")) \
        .select("doc_id", "embedding")
    meta = (small_pages.select("doc_id", F.col("text").alias("agg_text"))
            .join(page_meta_cols(small_pages.select("doc_id")), "doc_id"))
    q = "organic green tea"
    r1 = hybrid_search(spark, small_index, emb.repartition(2), meta, q,
                       k=10).collect()
    r2 = hybrid_search(spark, small_index, emb.repartition(11), meta, q,
                       k=10).collect()
    assert [(r["doc_id"], round(float(r["_final"]), 6)) for r in r1] == \
        [(r["doc_id"], round(float(r["_final"]), 6)) for r in r2]


def test_packed_build_edge_corpora(spark, tmp_path):
    """Packed Stage C on degenerate corpora: a single doc, a doc with no
    tokens (all stopwords), and all-identical texts (one giant posting
    group) — build must succeed and agree with the raw path."""
    import pandas as pd

    cfg = _cfg()
    raw_cfg = dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, stage_c_mode="raw"))
    corpora = {
        "single": pd.DataFrame({"doc_id": [0],
                                "text": ["lonely document text"]}),
        "notok": pd.DataFrame({"doc_id": [0, 1],
                               "text": ["the a of", "real words here"]}),
        "same": pd.DataFrame({"doc_id": list(range(40)),
                              "text": ["identical text body"] * 40}),
    }
    for name, pdf in corpora.items():
        docs = spark.createDataFrame(pdf, "doc_id long, text string")
        a = build_index(spark, docs, TableIO(str(tmp_path / (name + "p"))),
                        cfg, n_chunks=1, shuffle_partitions=3)
        b = build_index(spark, docs, TableIO(str(tmp_path / (name + "r"))),
                        raw_cfg, n_chunks=1, shuffle_partitions=3)
        assert _fingerprint_index(spark, a) == _fingerprint_index(spark, b), name
        assert a.n_docs == len(pdf), name
