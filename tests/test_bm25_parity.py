"""Oracle parity: the distributed index + BM25 scorer vs the numpy oracle.

This is the primary correctness gate of the north rule: posting lists,
document frequencies, doc lengths, avgdl, idf (incl. the ε fixup), and
per-query top-k rankings must match the reference formulas exactly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from review_recommender_spark.config import (EngineConfig, bm25_north,
                                             bm25_reference)
from review_recommender_spark.functions.tokenize import (tokenize_k1_py,
                                                         tokenize_k2_py)
from review_recommender_spark.oracle.bm25_oracle import BM25Oracle
from review_recommender_spark.query.bm25 import bm25_topk_exact

from conftest import MICRO_CORPUS

GOLDEN_QUERIES = [
    "wireless bluetooth headphones",
    "comfortable running shoes",
    "yellow cat socks",
    "the sound quality is amazing",
    "usb charging cable long",
]


@pytest.fixture(scope="module")
def oracle(small_pages_pdf):
    corpus = [tokenize_k1_py(t) for t in small_pages_pdf["text"]]
    return BM25Oracle(corpus, bm25_north())


def test_corpus_stats_match(small_index, oracle):
    assert small_index.n_docs == oracle.corpus_size
    assert small_index.vocab_size == len(oracle.idf)
    assert small_index.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)


def test_doc_stats_match(spark, small_index, oracle):
    rows = small_index.doc_stats(spark).collect()
    assert len(rows) == oracle.corpus_size
    for r in rows:
        assert r["doc_len"] == len(oracle.corpus[r["doc_id"]])


def test_df_and_idf_match(spark, small_index, oracle):
    stats = {r["term"]: r for r in small_index.term_stats(spark).collect()}
    assert set(stats) == set(oracle.df)
    for term, df in oracle.df.items():
        assert stats[term]["df"] == df
        assert stats[term]["idf"] == pytest.approx(oracle.idf[term], rel=1e-12), term


def test_posting_lists_match(spark, small_index, oracle):
    """Decode every block and compare full posting lists (doc_id, tf)."""
    from review_recommender_spark.index.codec import decode_block

    expected = oracle.postings()
    got: dict[str, list[tuple[int, int]]] = {}
    doc_lens = {}
    for r in small_index.postings(spark).collect():
        d, t, ln = decode_block(bytes(r["doc_bytes"]), bytes(r["tf_bytes"]),
                                bytes(r["dl_bytes"]), r["n"])
        got.setdefault(r["term"], []).extend(zip(d.tolist(), t.tolist()))
        for doc, dl in zip(d.tolist(), ln.tolist()):
            doc_lens[doc] = dl
        assert r["max_tf"] == int(t.max())
        assert r["min_dl"] == int(ln.min())
        assert r["first_doc_id"] == int(d[0]) and r["last_doc_id"] == int(d[-1])
    for lst in got.values():
        lst.sort()
    assert set(got) == set(expected)
    for term in expected:
        assert got[term] == expected[term], term
    for doc, dl in doc_lens.items():
        assert dl == len(oracle.corpus[doc])


@pytest.mark.parametrize("query", GOLDEN_QUERIES)
def test_topk_rank_identical(spark, small_index, oracle, query):
    k = 10
    got = bm25_topk_exact(spark, small_index, query, k=k).collect()
    exp = oracle.top_k(tokenize_k2_py(query), k)
    exp = [(d, s) for d, s in exp if s > 0][: len(got)]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    np.testing.assert_allclose([r["score"] for r in got],
                               [s for _, s in exp], rtol=1e-9)


def test_reference_params_profile(spark, small_pages, small_pages_pdf,
                                  tmp_path):
    """Same gate under the reference-parity parameterization k1=1.5."""
    import dataclasses

    from review_recommender_spark.index.build import build_index
    from review_recommender_spark.index.tableio import TableIO

    cfg = EngineConfig(bm25=bm25_reference())
    cfg = dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, range_shift=6, term_buckets=8))
    idx = build_index(spark, small_pages, TableIO(str(tmp_path / "idx15")), cfg)
    corpus = [tokenize_k1_py(t) for t in small_pages_pdf["text"]]
    oracle = BM25Oracle(corpus, bm25_reference())
    q = "yellow cat socks"
    got = bm25_topk_exact(spark, idx, q, k=10).collect()
    exp = [(d, s) for d, s in oracle.top_k(tokenize_k2_py(q), 10) if s > 0]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp[: len(got)]]
    np.testing.assert_allclose([r["score"] for r in got],
                               [s for _, s in exp[: len(got)]], rtol=1e-9)


def test_micro_corpus_reference_fixture():
    """The reference's own 3-doc fixture (conftest.py:91-100) — exact idf,
    including the negative-idf ε fixup when a term is in most docs."""
    corpus = MICRO_CORPUS + [["wireless", "common"], ["wireless", "common2"]]
    o = BM25Oracle(corpus, bm25_reference())
    # 'wireless' appears in 3/5 docs: raw idf = ln(5-3+.5)-ln(3.5) < 0
    raw = np.log(2.5) - np.log(3.5)
    assert raw < 0
    assert o.idf["wireless"] == pytest.approx(0.25 * o.average_idf)
    # a normal term keeps its raw idf
    assert o.idf["yellow"] == pytest.approx(np.log(5 - 1 + 0.5) - np.log(1.5))


def test_unknown_and_repeated_query_terms(spark, small_index, oracle):
    q = "wireless wireless zzzunknownzzz"
    got = bm25_topk_exact(spark, small_index, q, k=5).collect()
    exp = [(d, s) for d, s in
           oracle.top_k(["wireless", "wireless", "zzzunknownzzz"], 5) if s > 0]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp[: len(got)]]
    np.testing.assert_allclose([r["score"] for r in got],
                               [s for _, s in exp[: len(got)]], rtol=1e-9)
