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
