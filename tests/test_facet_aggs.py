"""Search aggregations over match sets (query/facets.py): stats per
facet value, histogram buckets, top-hits per facet — ground-truthed
against driver-side recomputation from the corpus frame."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.functions.tokenize import tokenize_k1_py
from review_recommender_spark.query.bm25 import bm25_topk_exact
from review_recommender_spark.query.facets import (dsl_match_docs,
                                                   facet_stats, histogram,
                                                   top_hits_per_facet)

DSL_Q = "wireless +bluetooth"


@pytest.fixture(scope="module")
def match_ids(spark, small_index, small_pages_pdf):
    got = {r["doc_id"] for r in
           dsl_match_docs(spark, small_index, DSL_Q).collect()}
    assert got
    return got


@pytest.fixture(scope="module")
def meta_rows(small_pages_pdf):
    return {int(r.doc_id): (r.lang, len(r.url))
            for r in small_pages_pdf.itertuples()}


def test_facet_stats_truth(spark, small_pages, small_index, match_ids,
                           meta_rows):
    meta = small_pages.select("doc_id", "lang",
                              F.length("url").alias("urllen"))
    got = facet_stats(dsl_match_docs(spark, small_index, DSL_Q), meta,
                      "lang", "urllen").collect()
    groups = defaultdict(list)
    for d in match_ids:
        lang, ul = meta_rows[d]
        groups[lang].append(float(ul))
    want = sorted(((lang, len(v), min(v), max(v),
                    round(sum(v) / len(v), 6), round(sum(v), 6))
                   for lang, v in groups.items()),
                  key=lambda x: (-x[1], x[0]))
    assert [(r["value"], r["n_docs"], r["val_min"], r["val_max"],
             r["val_avg"], r["val_sum"]) for r in got] == want


def test_histogram_truth(spark, small_pages, small_index, match_ids,
                         meta_rows):
    meta = small_pages.select("doc_id", F.length("url").alias("urllen"))
    interval = 5.0
    got = histogram(dsl_match_docs(spark, small_index, DSL_Q), meta,
                    "urllen", interval).collect()
    buckets = defaultdict(int)
    for d in match_ids:
        _lang, ul = meta_rows[d]
        import math
        buckets[math.floor(ul / interval) * interval] += 1
    want = sorted(buckets.items())
    assert [(r["bucket"], r["n_docs"]) for r in got] == want and want
    with pytest.raises(ValueError):
        histogram(dsl_match_docs(spark, small_index, DSL_Q), meta,
                  "urllen", 0)


def test_top_hits_per_facet_truth(spark, small_pages, small_index,
                                  meta_rows):
    scored = bm25_topk_exact(spark, small_index, "wireless bluetooth",
                             k=10 ** 6)
    meta = small_pages.select("doc_id", "lang")
    got = top_hits_per_facet(scored, meta, "lang", n=3).collect()
    full = {r["doc_id"]: r["score"] for r in scored.collect()}
    groups = defaultdict(list)
    for d, s in full.items():
        groups[meta_rows[d][0]].append((d, s))
    want = []
    for lang in sorted(groups):
        top = sorted(groups[lang], key=lambda x: (-x[1], x[0]))[:3]
        want += [(lang, i + 1, d, s) for i, (d, s) in enumerate(top)]
    assert [(r["value"], r["rank"], r["doc_id"], r["score"])
            for r in got] == want and want


def test_collapse_topk_truth(spark, small_pages, small_index, meta_rows):
    from review_recommender_spark.query.facets import collapse_topk
    scored = bm25_topk_exact(spark, small_index, "wireless bluetooth",
                             k=10 ** 6)
    meta = small_pages.select("doc_id", "lang")
    got = collapse_topk(scored, meta, "lang", k=10).collect()
    full = {r["doc_id"]: r["score"] for r in scored.collect()}
    best = {}
    for d, s in full.items():
        lang = meta_rows[d][0]
        cur = best.get(lang)
        if cur is None or (s, -d) > (cur[1], -cur[0]):
            best[lang] = (d, s)
    want = sorted(((d, s, lang) for lang, (d, s) in best.items()),
                  key=lambda x: (-x[1], x[0]))[:10]
    assert [(r["doc_id"], r["score"], r["value"]) for r in got] == want
    assert want
    # each value appears at most once
    assert len({r["value"] for r in got}) == len(got)


def test_significant_terms_truth(spark, small_index, small_pages_pdf):
    """JLH ground truth from driver retokenization; the planted query
    words must surface as significant for their own match set."""
    from review_recommender_spark.query.bm25 import term_docs
    from review_recommender_spark.query.facets import significant_terms
    match = term_docs(spark, small_index, "bluetooth")
    got = significant_terms(spark, small_index, match, k=15,
                            min_doc_count=2).collect()
    assert got
    texts = dict(zip(small_pages_pdf["doc_id"], small_pages_pdf["text"]))
    n_docs = len(texts)
    fg_ids = {d for d, t in texts.items()
              if "bluetooth" in tokenize_k1_py(t)}
    from collections import Counter
    fg_cnt, df_cnt = Counter(), Counter()
    for d, t in texts.items():
        toks = set(tokenize_k1_py(t))
        df_cnt.update(toks)
        if d in fg_ids:
            fg_cnt.update(toks)
    scored = []
    for term, fgc in fg_cnt.items():
        if fgc < 2:
            continue
        fg = fgc / len(fg_ids)
        bg = df_cnt[term] / n_docs
        scored.append((term, fgc, df_cnt[term],
                       round((fg - bg) * (fg / bg), 6)))
    scored.sort(key=lambda x: (-x[3], x[0]))
    assert [(r["term"], r["fg_count"], r["df"], r["jlh"])
            for r in got] == scored[:15]
    # the defining term of the match set is the most significant
    assert got[0]["term"] == "bluetooth"


def test_significant_terms_empty_match(spark, small_index):
    from review_recommender_spark.query.facets import significant_terms
    empty = spark.createDataFrame([], "doc_id long")
    assert significant_terms(spark, small_index, empty).count() == 0
