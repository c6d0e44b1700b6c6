"""Doc-values sidecar (index/docvalues.py): id-sorted metadata table —
content vs the corpus, IN-list pushdown for point fetches, facet reuse."""

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.index.docvalues import (DOC_VALUES,
                                                      build_doc_values,
                                                      doc_values,
                                                      fetch_doc_values)

COLS = ["lang", "url"]


@pytest.fixture(scope="module")
def dv_index(spark, small_pages, small_index):
    cols = [c for c in COLS if c in small_pages.columns]
    assert cols, small_pages.columns
    build_doc_values(spark, small_index, small_pages, cols)
    return small_index, cols


def test_doc_values_matches_corpus(spark, small_pages, dv_index):
    idx, cols = dv_index
    assert idx.io.exists(DOC_VALUES)
    got = {r["doc_id"]: tuple(r[c] for c in cols)
           for r in doc_values(spark, idx).collect()}
    want = {r["doc_id"]: tuple(r[c] for c in cols)
            for r in small_pages.select("doc_id", *cols).collect()}
    assert got == want


def test_fetch_pushdown_and_content(spark, small_pages, dv_index):
    idx, cols = dv_index
    ids = [3, 77, 500]
    got = fetch_doc_values(spark, idx, ids, cols=cols[:1])
    rows = got.collect()
    want = {r["doc_id"]: r[cols[0]]
            for r in small_pages.filter(F.col("doc_id").isin(ids))
            .select("doc_id", cols[0]).collect()}
    assert {r["doc_id"]: r[cols[0]] for r in rows} == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "In(doc_id," in plan
    # fetch reads only the requested columns
    assert set(got.columns) == {"doc_id", cols[0]}
    assert fetch_doc_values(spark, idx, []).count() == 0


def test_facets_over_doc_values(spark, small_pages, small_index,
                                dv_index):
    """facet_counts over the sidecar == over the corpus projection."""
    from review_recommender_spark.query.facets import (dsl_match_docs,
                                                       facet_counts)
    idx, cols = dv_index
    match = dsl_match_docs(spark, idx, "wireless +bluetooth")
    a = facet_counts(match, doc_values(spark, idx), "lang").collect()
    b = facet_counts(match, small_pages.select("doc_id", "lang"),
                     "lang").collect()
    assert [(r["value"], r["n_docs"]) for r in a] \
        == [(r["value"], r["n_docs"]) for r in b]
    assert a


def test_build_guards(spark, small_pages, small_index):
    with pytest.raises(ValueError):
        build_doc_values(spark, small_index, small_pages, [])
