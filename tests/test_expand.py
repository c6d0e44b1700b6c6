"""Query expansion (query/expand.py): prefix, fuzzy, more-like-this,
doc boost — ground-truthed against driver-side retokenization of the
corpus and against the unexpanded ranking paths.

The reference engine has no expansion surface (queries are literal
strings fed to BM25Okapi, app/test.py:156); these operators are part of
the at-scale web-search extension, so the ground truth here is the
classic Lucene rewrite contract, recomputed from first principles."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.functions.tokenize import (tokenize_k1_py,
                                                         tokenize_k2_py)
from review_recommender_spark.query import expand as E
from review_recommender_spark.query.bm25 import (bm25_topk_exact,
                                                 bm25_topk_served)
from review_recommender_spark.query.parser import (dsl_search, parse_query,
                                                   ranking_tokens)


@pytest.fixture(scope="module")
def page_texts(small_pages_pdf):
    return dict(zip(small_pages_pdf["doc_id"], small_pages_pdf["text"]))


@pytest.fixture(scope="module")
def term_df(page_texts):
    """Ground-truth document frequency per term from retokenization."""
    df = Counter()
    for t in page_texts.values():
        df.update(set(tokenize_k1_py(t)))
    return df


def _truth_prefix(term_df, prefix, cap):
    cands = [(t, n) for t, n in term_df.items() if t.startswith(prefix)]
    cands.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _ in cands[:cap]]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ------------------------------------------------------------- grammar

def test_parse_wildcard_fuzzy_grammar():
    pq = parse_query("wireless +blu* -sock* head~ gam*")
    assert pq.free == ["wireless"]
    assert pq.wildcards == ["gam"]
    assert pq.required_wildcards == ["blu"]
    assert pq.excluded_wildcards == ["sock"]
    assert pq.fuzzies == ["head"]
    # bare '*' / '~' are not patterns; sigiled '~' is a literal word;
    # multi-token stems split — leading tokens fall back to free terms
    pq2 = parse_query("* ~ +x~ wi-fi* a~b")
    assert pq2.free == ["*", "~", "wi", "a~b"]  # no trailing sigil → free
    assert pq2.wildcards == ["fi"]
    assert pq2.required == ["x~"]  # sigiled '~' is the literal word
    assert pq2.fuzzies == []


# ------------------------------------------------------------- prefix

def test_expand_prefix_matches_truth(spark, small_index, term_df):
    for prefix, cap in [("blu", 32), ("s", 5), ("so", 32), ("zzz", 32)]:
        got = E.expand_prefix(spark, small_index, prefix, max_terms=cap)
        assert got == _truth_prefix(term_df, prefix, cap), prefix
    with pytest.raises(ValueError):
        E.expand_prefix(spark, small_index, "")


def test_dictionary_identical_and_pruned(spark, small_index, term_df):
    """The sorted dictionary returns identical expansions, and the range
    predicate reaches the parquet scan (PushedFilters)."""
    E.build_term_dictionary(spark, small_index)
    assert small_index.io.exists(E.TERM_DICT)
    for prefix in ["blu", "s", "ke"]:
        assert (E.expand_prefix(spark, small_index, prefix)
                == _truth_prefix(term_df, prefix, 32)), prefix
    plan = (E._dictionary(spark, small_index)
            .filter((F.col("term") >= "blu")
                    & (F.col("term") < "blu" + E._CHR_MAX))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(term,blu" in plan


# ------------------------------------------------------------- fuzzy

def test_expand_fuzzy_matches_truth(spark, small_index, term_df):
    for word in ["socks", "keybored", "bluetooth"]:
        got = E.expand_fuzzy(spark, small_index, word, max_terms=8)
        cands = [(t, n) for t, n in term_df.items() if _lev(t, word) <= 1]
        cands.sort(key=lambda x: (_lev(x[0], word), -x[1], x[0]))
        assert got == [t for t, _ in cands[:8]], word
    with pytest.raises(ValueError):
        E.expand_fuzzy(spark, small_index, "")


# ------------------------------------------------------- more-like-this

def test_mlt_terms_matches_truth(spark, small_index, page_texts):
    text = page_texts[3]
    idf = {r["term"]: r["idf"]
           for r in small_index.term_stats(spark)
           .select("term", "idf").collect()}
    tf = Counter(tokenize_k1_py(text))
    scored = [(t, tf[t] * idf[t]) for t in tf if t in idf]
    scored.sort(key=lambda x: (-x[1], x[0]))
    want = [t for t, _ in scored[:8]]
    assert E.mlt_terms(spark, small_index, text, max_terms=8) == want
    assert E.mlt_terms(spark, small_index, "") == []


def test_more_like_this_is_bm25_over_mlt_terms(spark, small_pages,
                                               small_index, page_texts):
    """more_like_this == the exact BM25 ranking of the selected term
    list with the source doc removed — same scores bitwise."""
    did = 7
    text = page_texts[did]
    terms = E.mlt_terms(spark, small_index, text, max_terms=12)
    got = E.more_like_this_doc(spark, small_index, small_pages, did,
                               max_terms=12, k=10).collect()
    assert got and all(r["doc_id"] != did for r in got)
    want = [r for r in bm25_topk_exact(spark, small_index, terms,
                                       k=11).collect()
            if r["doc_id"] != did][:10]
    assert [(r["doc_id"], r["score"]) for r in got] \
        == [(r["doc_id"], r["score"]) for r in want]


def test_more_like_this_doc_guards(spark, small_pages, small_index):
    assert E.more_like_this_doc(spark, small_index, small_pages,
                                10 ** 9).count() == 0
    dup = small_pages.unionByName(small_pages)
    with pytest.raises(ValueError, match="not unique"):
        E.more_like_this_doc(spark, small_index, dup, 3)


# ------------------------------------------------------------ QueryLike

def test_token_list_query_identity(spark, small_index):
    """A pre-tokenized term sequence ranks bitwise-identically to the
    string query that produces it — exact AND served paths."""
    q = "wireless bluetooth gaming keyboard"
    toks = tokenize_k2_py(q)
    a = bm25_topk_exact(spark, small_index, q, k=20).collect()
    b = bm25_topk_exact(spark, small_index, toks, k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in a] \
        == [(r["doc_id"], r["score"]) for r in b]
    small_index.warm(spark)
    try:
        c = bm25_topk_served(spark, small_index, toks, k=20).collect()
        assert [(r["doc_id"], r["score"]) for r in a] \
            == [(r["doc_id"], r["score"]) for r in c]
    finally:
        small_index.unwarm()


def test_token_list_is_verbatim_sequence(spark, small_index):
    """A term list is scored verbatim — no re-tokenization, duplicates
    accumulate qtf (a term expanded twice scores twice)."""
    one = {r["doc_id"]: r["score"]
           for r in bm25_topk_exact(spark, small_index, ["bluetooth"],
                                    k=10 ** 6).collect()}
    two = {r["doc_id"]: r["score"]
           for r in bm25_topk_exact(spark, small_index,
                                    ["bluetooth", "bluetooth"],
                                    k=10 ** 6).collect()}
    assert set(one) == set(two) and one
    assert all(two[d] == pytest.approx(2 * one[d]) for d in one)


# ------------------------------------------------------------- boost

def test_boost_docs_reranks(spark, small_pages, small_index):
    """Boosted ranking == unboosted scores × per-doc boost, re-sorted;
    docs missing from boost_docs multiply by 1.0."""
    q = "wireless bluetooth"
    base = bm25_topk_exact(spark, small_index, q, k=10 ** 6).collect()
    boost = small_pages.select(
        "doc_id", F.when(F.col("doc_id") % 3 == 0, 5.0)
        .when(F.col("doc_id") % 3 == 1, F.lit(None))
        .otherwise(0.5).alias("boost"))
    bmap = {r["doc_id"]: r["boost"] for r in boost.collect()}
    want = sorted(((r["doc_id"],
                    r["score"] * (bmap.get(r["doc_id"]) or 1.0))
                   for r in base), key=lambda x: (-x[1], x[0]))[:10]
    got = bm25_topk_exact(spark, small_index, q, k=10,
                          boost_docs=boost).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == want


# --------------------------------------------------------- DSL wildcards

def test_dsl_wildcard_constraints(spark, small_index, page_texts, term_df):
    """+blu* requires ANY expansion term; -sock* excludes ALL; the
    expansions rank (doc scores = full expanded-query ranking)."""
    q = "wireless +blu* -sock*"
    pq = parse_query(q)
    toks = ranking_tokens(spark, small_index, pq)
    # expansion terms join the scoring sequence after the base text
    assert toks[:1] == ["wireless"]
    assert set(toks[1:]) == set(_truth_prefix(term_df, "blu", 32))
    got = dsl_search(spark, small_index, q, k=10).collect()
    assert got
    req = set(_truth_prefix(term_df, "blu", 32))
    exc = set(_truth_prefix(term_df, "sock", 32))
    for r in got:
        dtoks = set(tokenize_k1_py(page_texts[r["doc_id"]]))
        assert dtoks & req and not dtoks & exc
    # scores come from the expanded ranking, constraints filter-only
    full = {r["doc_id"]: r["score"]
            for r in bm25_topk_exact(spark, small_index, toks,
                                     k=10 ** 6).collect()}
    for r in got:
        assert r["score"] == full[r["doc_id"]]


def test_dsl_wildcard_no_vocab_match_empty(spark, small_index):
    assert dsl_search(spark, small_index, "wireless +zzzq*",
                      k=10).count() == 0


def test_dsl_match_count(spark, small_index, page_texts, term_df):
    from review_recommender_spark.query.facets import dsl_match_count
    q = "wireless +blu* -sock*"
    n = dsl_match_count(spark, small_index, q).collect()[0]["n_hits"]
    req = set(_truth_prefix(term_df, "blu", 32))
    exc = set(_truth_prefix(term_df, "sock", 32))
    rank = set(ranking_tokens(spark, small_index, parse_query(q)))
    want = sum(1 for t in page_texts.values()
               if (lambda s: s & rank and s & req and not s & exc)
               (set(tokenize_k1_py(t))))
    assert n == want > 0


def test_warm_routes_bitwise(spark, small_pages, small_index, term_df):
    """Warm index: more_like_this and wildcard dsl_search route through
    the zero-shuffle served kernel, bitwise-identical to the cold exact
    route."""
    q = "wireless +blu* -sock*"
    cold_dsl = dsl_search(spark, small_index, q, k=10).collect()
    cold_mlt = E.more_like_this_doc(spark, small_index, small_pages, 7,
                                    k=10).collect()
    small_index.warm(spark)
    try:
        warm_dsl = dsl_search(spark, small_index, q, k=10).collect()
        warm_mlt = E.more_like_this_doc(spark, small_index, small_pages,
                                        7, k=10).collect()
    finally:
        small_index.unwarm()
    assert [(r["doc_id"], r["score"]) for r in cold_dsl] \
        == [(r["doc_id"], r["score"]) for r in warm_dsl]
    assert [(r["doc_id"], r["score"]) for r in cold_mlt] \
        == [(r["doc_id"], r["score"]) for r in warm_mlt]
    assert cold_dsl and cold_mlt


def test_suggest_corrections_truth(spark, small_index, term_df):
    """Unknown tokens get the (dist, df desc, term) best neighbour;
    known tokens are untouched; hopeless tokens suggest None."""
    q = "wireless bluetooh keybored zzzqqq"
    got = E.suggest_corrections(spark, small_index, q)
    assert [s["token"] for s in got] == ["bluetooh", "keybored",
                                        "zzzqqq"]
    for s in got:
        if s["suggestion"] is None:
            assert not any(_lev(t, s["token"]) <= 1 for t in term_df)
        else:
            cands = [(t, n) for t, n in term_df.items()
                     if _lev(t, s["token"]) <= 1]
            cands.sort(key=lambda x: (_lev(x[0], s["token"]), -x[1],
                                      x[0]))
            assert s["suggestion"] == cands[0][0]
    fixed = E.did_you_mean(spark, small_index, q)
    assert fixed.startswith("wireless ") and "zzzqqq" in fixed
    assert E.did_you_mean(spark, small_index, "wireless bluetooth") \
        is None
