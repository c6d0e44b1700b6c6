"""Snippet extraction / highlighting + proximity rerank
(query/snippets.py), ground-truthed against driver-side retokenization
with a brute-force all-windows search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from review_recommender_spark.functions.tokenize import (tokenize_k1_py,
                                                         tokenize_k2_py)
from review_recommender_spark.index.positions import (build_positions,
                                                      warm_positions)
from review_recommender_spark.query.bm25 import bm25_topk_exact
from review_recommender_spark.query.snippets import (proximity_rerank,
                                                     snippet_spans)

Q = "wireless bluetooth headphones"
WINDOW = 12


@pytest.fixture(scope="module")
def pos_index(spark, small_pages, small_index):
    build_positions(spark, small_index.io, small_index.cfg)
    return small_index


@pytest.fixture(scope="module")
def page_texts(small_pages_pdf):
    return dict(zip(small_pages_pdf["doc_id"], small_pages_pdf["text"]))


def _truth_spans(texts: dict[int, str], doc_ids, query: str, window: int):
    """Independent brute force of the engine's span semantics: candidate
    starts are the hit positions, best = (max distinct, max hits,
    smallest start) — plain Python lists, no shared numpy kernels."""
    qterms = set(tokenize_k2_py(query))
    out = {}
    for d in doc_ids:
        toks = tokenize_k1_py(texts[d])
        hits = [(i, t) for i, t in enumerate(toks) if t in qterms]
        if not hits:
            continue
        best = None
        for s, _ in hits:
            inw = [(p, t) for p, t in hits if s <= p < s + window]
            key = (len({t for _, t in inw}), len(inw), -s)
            if best is None or key > best[0]:
                best = (key, s, inw)
        (nd, nh, _), s, inw = best
        out[d] = (s, nd, nh, ",".join(str(p) for p, _ in inw))
    return out


def test_spans_match_bruteforce(spark, pos_index, page_texts):
    top = bm25_topk_exact(spark, pos_index, Q, k=25)
    ids = [r["doc_id"] for r in top.collect()]
    truth = _truth_spans(page_texts, ids, Q, WINDOW)
    got = {r["doc_id"]: (r["snippet_start"], r["n_distinct"], r["n_hits"],
                         r["hit_pos"])
           for r in snippet_spans(spark, pos_index, Q, top.select("doc_id"),
                                  window=WINDOW).collect()}
    assert set(got) == set(truth) == set(ids)  # every BM25 doc has a hit
    for d in ids:
        assert got[d] == truth[d], d
    # non-trivial: some doc must cover >1 distinct term in-window
    assert max(v[1] for v in got.values()) > 1


def test_spans_accept_plain_iterable_and_respect_cap(spark, pos_index,
                                                     page_texts):
    ids = sorted(page_texts)[:5]
    a = {r["doc_id"]: r["hit_pos"]
         for r in snippet_spans(spark, pos_index, Q, ids,
                                window=WINDOW).collect()}
    truth = _truth_spans(page_texts, ids, Q, WINDOW)
    assert {d: v[3] for d, v in truth.items()} == a
    with pytest.raises(ValueError):
        snippet_spans(spark, pos_index, Q, list(range(100)), cap=10)


def test_spans_warm_layout_identical(spark, pos_index):
    top = bm25_topk_exact(spark, pos_index, Q, k=25)
    key = lambda r: (r["doc_id"], r["snippet_start"], r["n_distinct"],  # noqa: E731
                     r["n_hits"], r["hit_pos"])
    cold = sorted(map(key, snippet_spans(
        spark, pos_index, Q, top.select("doc_id"), window=WINDOW).collect()))
    warm_positions(spark, pos_index, serving_shards=5)
    try:
        assert "_positions" in pos_index._cached
        warm = sorted(map(key, snippet_spans(
            spark, pos_index, Q, top.select("doc_id"),
            window=WINDOW).collect()))
        assert warm == cold
    finally:
        pos_index.unwarm()


def test_proximity_rerank_boosts_cooccurrence(spark, pos_index, page_texts):
    top = bm25_topk_exact(spark, pos_index, Q, k=50)
    rr = proximity_rerank(spark, pos_index, Q, top, window=WINDOW)
    base = {r["doc_id"]: r["score"] for r in top.collect()}
    got = {r["doc_id"]: r["score"] for r in rr.collect()}
    assert set(got) == set(base)                      # same docs, new order
    truth = _truth_spans(page_texts, list(base), Q, WINDOW)
    for d, s in got.items():
        _, nd, nh, _ = truth[d]
        assert s == pytest.approx(base[d] + 0.1 * nd + 0.01 * nh)
    # the boost must actually reorder something on this corpus
    old_order = [r["doc_id"] for r in top.collect()]
    new_order = [r["doc_id"] for r in rr.collect()]
    assert old_order != new_order


def test_empty_query_or_docs(spark, pos_index):
    assert snippet_spans(spark, pos_index, "", [1, 2]).count() == 0
    assert snippet_spans(spark, pos_index, Q, []).count() == 0
