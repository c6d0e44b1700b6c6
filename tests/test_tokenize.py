"""Tokenizer parity and the deliberate K1/K2 asymmetry (quirk Q3)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from review_recommender_spark.functions.tokenize import (STOP_INDEX,
                                                         STOP_QUERY,
                                                         tokenize_k1_col,
                                                         tokenize_k1_py,
                                                         tokenize_k1_udf,
                                                         tokenize_k2_py)

CASES = [
    "",
    "simple words here",
    "Upper CASE Mixed",
    "won't can't it's 'quoted'",
    "numbers 123 mixed42tokens",
    "a i is it the and or of",        # stopwords + 1-char
    "hyphen-ated under_scored dot.sep",
    "x" * 30,
    "ünïcödé straße",
    "  spaces   everywhere  ",
    "apostrophe'chain'of'parts",
    ("tok " * 6000),                  # cap exercise
]


def test_k1_semantics():
    assert tokenize_k1_py("The wireless IT headphones a") == ["wireless",
                                                             "headphones"]
    # length-1 tokens dropped, index stoplist applied
    assert tokenize_k1_py("a b c xy") == ["xy"]
    # apostrophe tokens: regex allows one 'part
    assert tokenize_k1_py("won't stop") == ["stop"]  # won't is stoplisted
    assert tokenize_k1_py("don't stop") == ["don't", "stop"]
    # cap at 5000 kept tokens
    assert len(tokenize_k1_py("tok " * 6000)) == 5000


def test_k2_semantics_and_asymmetry():
    # K2 keeps 1-char tokens and uses the smaller stoplist
    assert tokenize_k2_py("a b the it") == ["b"]
    # 'was' is in STOP_INDEX but NOT in STOP_QUERY → survives K2 only
    assert "was" in tokenize_k2_py("it was good")
    assert "was" not in tokenize_k1_py("it was good")
    # K2 has no cap
    assert len(tokenize_k2_py("tok " * 6000)) == 6000
    # differing stoplists really differ
    assert STOP_QUERY - STOP_INDEX == set()
    assert STOP_INDEX - STOP_QUERY != set()


def test_k1_jvm_vs_python_on_cases(spark):
    pdf = pd.DataFrame({"id": range(len(CASES)), "text": CASES})
    df = spark.createDataFrame(pdf, schema="id long, text string")
    jvm = (df.select("id", tokenize_k1_col(F.col("text")).alias("t"))
           .toPandas().sort_values("id")["t"].tolist())
    arrow = (df.select("id", tokenize_k1_udf("text").alias("t"))
             .toPandas().sort_values("id")["t"].tolist())
    for j, a, src in zip(jvm, arrow, CASES):
        exp = tokenize_k1_py(src)
        assert list(j) == exp, repr(src)
        assert list(a) == exp, repr(src)


def test_k1_null_text_counts_as_zero_token_doc(spark):
    """NULL text must yield a zero-token doc, not drop the doc: BM25Okapi
    counts it in n_docs/avgdl (reference fillna('') nlp/10:37). Regression
    for the r01 divergence where the JVM path dropped NULL-text docs; in
    checkpoint format v4 the doc must surface as a (dl=0, toks=[]) row."""
    import dataclasses

    from review_recommender_spark.config import EngineConfig
    from review_recommender_spark.index.build import _doc_rows, _tokens_df

    df = spark.createDataFrame([(0, None), (1, "real text here")],
                               "doc_id long, text string")
    for impl in ("jvm", "arrow"):
        cfg = EngineConfig()
        cfg = dataclasses.replace(
            cfg, index=dataclasses.replace(cfg.index, tokenizer_impl=impl))
        rows = (_doc_rows(_tokens_df(df, cfg, "doc_id", "text"))
                .toPandas().sort_values("doc_id"))
        assert rows["doc_id"].tolist() == [0, 1], impl
        assert rows["dl"].tolist()[0] == 0, impl
        assert list(rows["toks"].iloc[0]) == [], impl


def test_null_text_doc_in_built_index(spark, tmp_path):
    """End-to-end: a corpus with a NULL-text doc builds with n_docs
    counting it and avgdl matching the oracle's fillna('') semantics."""
    from review_recommender_spark.config import EngineConfig, bm25_north
    from review_recommender_spark.index.build import build_index
    from review_recommender_spark.index.tableio import TableIO

    docs = spark.createDataFrame(
        [(0, None), (1, "wireless headphones bluetooth"),
         (2, "yellow cat socks soft")],
        "doc_id long, text string")
    idx = build_index(spark, docs, TableIO(str(tmp_path / "nullidx")),
                      EngineConfig(bm25=bm25_north()))
    assert idx.n_docs == 3
    assert abs(idx.avgdl - 7 / 3) < 1e-12


def test_arrow_cap_configurable(spark):
    """make_tokenize_k1_udf must honor a non-default token_cap (r01 ADVICE:
    the arrow path silently hardcoded 5000)."""
    from review_recommender_spark.functions.tokenize import make_tokenize_k1_udf
    df = spark.createDataFrame([(0, "alpha beta gamma delta epsilon zeta "
                                    "eta theta iota kappa")],
                               "id long, text string")
    out = df.select(make_tokenize_k1_udf(7)("text").alias("t")) \
        .collect()[0]["t"]
    assert len(out) == 7


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(
    whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs"),
    max_codepoint=0x250), max_size=200))
def test_k1_python_properties(s):
    toks = tokenize_k1_py(s)
    assert all(len(t) > 1 for t in toks)
    assert all(t not in STOP_INDEX for t in toks)
    assert len(toks) <= 5000
    # idempotence: tokens re-tokenize to themselves (tokens are [a-z0-9']+
    # runs; stoplist/length filters already applied)
    for t in toks[:20]:
        assert tokenize_k1_py(t) == [t]
