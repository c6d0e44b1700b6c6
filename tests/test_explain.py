"""Score explanation (query/bm25.py::explain_score): per-term
contribution breakdown for one (query, doc) — inputs ground-truthed
against driver retokenization, total against the ranking score, and the
scan against the block-interval pruning contract."""

import pytest
from collections import Counter

from review_recommender_spark.functions.tokenize import (tokenize_k1_py,
                                                         tokenize_k2_py)
from review_recommender_spark.query.bm25 import (bm25_topk_exact,
                                                 explain_score)

Q = "wireless bluetooth gaming keyboard"


@pytest.fixture(scope="module")
def page_texts(small_pages_pdf):
    return dict(zip(small_pages_pdf["doc_id"], small_pages_pdf["text"]))


def test_explain_inputs_match_retokenize(spark, small_index, page_texts):
    top = bm25_topk_exact(spark, small_index, Q, k=1).collect()[0]
    did = top["doc_id"]
    rows = explain_score(spark, small_index, Q, did).collect()
    assert rows
    toks = tokenize_k1_py(page_texts[did])
    tf = Counter(toks)
    qterms = set(tokenize_k2_py(Q))
    # exactly the matched query terms, with the doc's true tf and dl
    assert {r["term"] for r in rows} == {t for t in qterms if tf[t] > 0}
    for r in rows:
        assert r["tf"] == tf[r["term"]] and r["dl"] == len(toks)
        assert r["qtf"] == 1 and r["contribution"] > 0 or r["idf"] <= 0
    # ordered by contribution desc, term asc
    key = [(-r["contribution"], r["term"]) for r in rows]
    assert key == sorted(key)


def test_explain_total_equals_ranking_score(spark, small_index):
    for r in bm25_topk_exact(spark, small_index, Q, k=3).collect():
        parts = explain_score(spark, small_index, Q,
                              r["doc_id"]).collect()
        total = sum(p["contribution"] for p in parts)
        assert total == pytest.approx(r["score"], rel=1e-12)


def test_explain_qtf_multiplies(spark, small_index):
    top = bm25_topk_exact(spark, small_index, "bluetooth",
                          k=1).collect()[0]
    one = explain_score(spark, small_index, "bluetooth",
                        top["doc_id"]).collect()[0]
    two = explain_score(spark, small_index, "bluetooth bluetooth",
                        top["doc_id"]).collect()[0]
    assert two["qtf"] == 2
    assert two["contribution"] == pytest.approx(2 * one["contribution"])


def test_explain_unmatched_doc_is_empty(spark, small_index):
    assert explain_score(spark, small_index, "zzzunknownterm",
                         5).count() == 0
    assert explain_score(spark, small_index, "", 5).count() == 0


def test_explain_scan_is_interval_pruned(spark, small_index):
    """The physical plan filters on the block [first_doc_id,
    last_doc_id] interval — O(query terms) blocks decoded, not a
    postings walk."""
    from review_recommender_spark.query.bm25 import _query_blocks
    from pyspark.sql import functions as F
    blocks = _query_blocks(spark, small_index,
                           sorted(set(tokenize_k2_py(Q)))).filter(
        (F.col("first_doc_id") <= 5) & (F.col("last_doc_id") >= 5))
    import re
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # the interval predicate reaches the scan's Filter (the PushedFilters
    # list itself is truncated in the plan string)
    assert re.search(r"first_doc_id#\d+L? <= 5", plan)
    assert re.search(r"last_doc_id#\d+L? >= 5", plan)


def test_term_vectors_truth(spark, small_index, page_texts):
    from review_recommender_spark.query.bm25 import term_vectors
    toks = tokenize_k1_py(page_texts[11])
    want = {}
    for i, t in enumerate(toks):
        want.setdefault(t, []).append(i)
    got = term_vectors(spark, small_index, 11).collect()
    assert [r["term"] for r in got] == sorted(want)
    for r in got:
        assert r["tf"] == len(want[r["term"]])
        assert list(r["positions"]) == want[r["term"]]
    assert term_vectors(spark, small_index, 10 ** 9).count() == 0


def test_term_vectors_pushdown(spark, small_index):
    from review_recommender_spark.index.build import LOCAL_TF
    from pyspark.sql import functions as F
    scan = (small_index.io.read(spark, LOCAL_TF)
            .filter(F.col("doc_id") == 11))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "EqualTo(doc_id,11)" in plan
