"""Search-after pagination (query/bm25.py::_apply_after): page N+1 via
the previous page's (unrounded score, doc_id) cursor must equal the
corresponding contiguous slice of the full ranking — on the exact,
served, and pruned paths, composed with the other constraints."""

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.query.bm25 import (bm25_topk_exact,
                                                 bm25_topk_pruned,
                                                 bm25_topk_served)

Q = "wireless bluetooth gaming keyboard socks"
PAGE = 7


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.fixture(scope="module")
def full_ranking(spark, small_index):
    full = _rows(bm25_topk_exact(spark, small_index, Q, k=10 ** 6))
    assert len(full) > 3 * PAGE  # paging must actually have pages
    return full


def test_exact_paging_walks_full_ranking(spark, small_index, full_ranking):
    cursor = None
    for page_no in range(3):
        got = _rows(bm25_topk_exact(spark, small_index, Q, k=PAGE,
                                    after=cursor))
        want = full_ranking[page_no * PAGE:(page_no + 1) * PAGE]
        assert got == want, f"page {page_no}"
        cursor = (got[-1][1], got[-1][0])  # sort-key order


def test_served_and_pruned_pages_bitwise(spark, small_index, full_ranking):
    d, sc = full_ranking[PAGE - 1]
    cursor = (sc, d)
    want = full_ranking[PAGE:2 * PAGE]
    small_index.warm(spark)
    try:
        got_s = _rows(bm25_topk_served(spark, small_index, Q, k=PAGE,
                                       after=cursor))
    finally:
        small_index.unwarm()
    assert got_s == want
    got_p = _rows(bm25_topk_pruned(spark, small_index, Q, k=PAGE,
                                   after=cursor, min_ranges_to_prune=1))
    assert got_p == want


def test_paging_tie_boundary(spark, small_index, full_ranking):
    """A cursor placed ON a score tie resumes at the doc_id tie-break,
    not before or after the whole tie group."""
    scores = [s for _, s in full_ranking]
    tie_i = next((i for i in range(len(scores) - 1)
                  if scores[i] == scores[i + 1]), None)
    if tie_i is None:
        pytest.skip("corpus produced no score tie for this query")
    d, sc = full_ranking[tie_i]
    cursor = (sc, d)
    got = _rows(bm25_topk_exact(spark, small_index, Q, k=3, after=cursor))
    assert got == full_ranking[tie_i + 1:tie_i + 4]


def test_paging_composes_with_filter(spark, small_pages, small_index):
    flt = small_pages.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    full = _rows(bm25_topk_exact(spark, small_index, Q, k=10 ** 6,
                                 filter_docs=flt))
    assert len(full) > 2 * PAGE
    d, sc = full[PAGE - 1]
    cursor = (sc, d)
    got = _rows(bm25_topk_exact(spark, small_index, Q, k=PAGE,
                                filter_docs=flt, after=cursor))
    assert got == full[PAGE:2 * PAGE]


def test_paging_past_end_is_empty(spark, small_index, full_ranking):
    last = (full_ranking[-1][1], full_ranking[-1][0])
    assert bm25_topk_exact(spark, small_index, Q, k=PAGE,
                           after=last).count() == 0
