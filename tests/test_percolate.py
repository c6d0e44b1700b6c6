"""Percolation (query/percolate.py): stored-query matching against one
document, ground-truthed by driver-side boolean evaluation, plus the
map-only plan gate."""

import pytest

from review_recommender_spark.functions.tokenize import (tokenize_k1_py,
                                                         tokenize_k2_py)
from review_recommender_spark.query.percolate import (parse_queries_df,
                                                      percolate)

RULES = [
    (1, "wireless bluetooth"),
    (2, "+bluetooth -socks"),
    (3, '"gaming mouse"'),
    (4, "-wireless cat"),
    (5, "keyboard +nonexistentterm"),
    (6, 'socks "yellow cat"'),
    (7, "bluetooth headphones +wireless"),
]


def _truth(text):
    toks = tokenize_k1_py(text)
    tset = set(toks)
    stream = " " + " ".join(toks) + " "
    out = {}
    from review_recommender_spark.query.parser import parse_query
    for qid, q in RULES:
        pq = parse_query(q)
        ranking = tokenize_k2_py(" ".join(pq.free))
        hits = len(set(ranking) & tset)
        req = [t for w in pq.required for t in tokenize_k1_py(w)]
        exc = [t for w in pq.excluded for t in tokenize_k1_py(w)]
        phr = [" ".join(tokenize_k1_py(p)) for p in pq.phrases]
        ok = ((hits > 0 or (not ranking and (phr or req)))
              and all(t in tset for t in req)
              and not any(t in tset for t in exc)
              and all(f" {p} " in stream for p in phr))
        if ok:
            out[qid] = hits
    return out


def test_percolate_truth(spark, small_pages_pdf):
    qdf = parse_queries_df(spark, RULES).cache()
    texts = dict(zip(small_pages_pdf["doc_id"],
                     small_pages_pdf["text"]))
    matched_any = set()
    for did in list(texts)[:40]:
        got = {r["query_id"]: r["n_ranking_hits"]
               for r in percolate(spark, qdf, texts[did]).collect()}
        assert got == _truth(texts[did]), did
        matched_any |= set(got)
    # the sample must actually exercise several distinct rules
    assert len(matched_any) >= 3
    qdf.unpersist()


def test_percolate_ordering_and_empty(spark):
    qdf = parse_queries_df(spark, RULES)
    rows = percolate(spark, qdf,
                     "wireless bluetooth headphones gaming").collect()
    key = [(-r["n_ranking_hits"], r["query_id"]) for r in rows]
    assert key == sorted(key) and rows
    assert percolate(spark, qdf, "").count() == 0
    # a phrase-only rule still matches without ranking terms
    p_only = parse_queries_df(spark, [(9, '"gaming mouse"')])
    assert [r["query_id"] for r in
            percolate(spark, p_only,
                      "big gaming mouse pad").collect()] == [9]


def test_percolate_rejects_vocab_dependent_rules(spark):
    for bad in ["blu*", "word~", '"a b"~3']:
        with pytest.raises(ValueError, match="not supported"):
            parse_queries_df(spark, [(1, bad)])


def test_percolate_rule_eval_is_pre_shuffle(spark):
    """Rule evaluation (the Filter) sits directly on the rules scan —
    no Exchange below it: every rule is decided map-side in one pass;
    the only shuffle is the final sort of the (small) match set."""
    qdf = parse_queries_df(spark, RULES)
    plan = percolate(spark, qdf, "wireless bluetooth") \
        ._jdf.queryExecution().executedPlan().toString()
    filter_and_below = plan[plan.index("Filter"):]
    assert "Exchange" not in filter_and_below
    assert "forall" in filter_and_below  # phrase predicate is JVM-side
