"""Byte-identity of the extraction chain (the input-contract invariant):
Arrow UDF output must equal the reference's pure-Python normalizers
byte-for-byte over adversarial inputs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from review_recommender_spark.functions.text import (MAX_TEXT_LEN,
                                                     looks_spammy_py,
                                                     looks_spammy_udf,
                                                     normalize_embed_col,
                                                     normalize_embed_py,
                                                     normalize_embed_udf,
                                                     normalize_product_py,
                                                     normalize_product_udf,
                                                     spam_flags_col,
                                                     stable_id_col,
                                                     stable_id_py)

ADVERSARIAL = [
    "",
    "   ",
    "plain text",
    "  leading and trailing  ",
    "cr\rlf\nmix\r\n end",
    "tab\tseparated\tvalues",
    "unicode nbsp emsp ls",
    "file sep \x1c here",          # \x1c: str.split() splits, re \s does not
    "vertical\x0btab\x0cfeed",
    "a" * (MAX_TEXT_LEN + 500),    # truncation boundary
    ("word " * 1200),              # >4000 chars with spaces
    "ünïcödé tëxt ÅÄÖ",
    "emoji 🎉 and ascii",
    None,
]

SPAM_CASES = [
    "normal review text with no spam",
    "visit https://a.com and https://b.com now",   # 2 urls
    "only one http://x.com link",
    "use code SAVE20 for discounts",
    "i received this product for free",
    "i received this thing totally free of charge",
    "looooooooooong repeated chars",               # 'o'×10+
    "aaaaaaaaa only nine",                         # 9 repeats: not spam
    "www.spam.com plus www.more.com",
]


@pytest.fixture(scope="module")
def adv_df(spark):
    pdf = pd.DataFrame({"id": range(len(ADVERSARIAL)), "text": ADVERSARIAL})
    return spark.createDataFrame(pdf, schema="id long, text string")


def test_t1_normalize_product_byte_identity(spark, adv_df):
    got = (adv_df.select("id", normalize_product_udf("text").alias("n"))
           .toPandas().sort_values("id")["n"].tolist())
    exp = [normalize_product_py(t) for t in ADVERSARIAL]
    for g, e, src in zip(got, exp, ADVERSARIAL):
        assert g.encode() == e.encode(), repr(src)


def test_t2_normalize_embed_byte_identity(spark, adv_df):
    got = (adv_df.select("id", normalize_embed_udf("text").alias("n"))
           .toPandas().sort_values("id")["n"].tolist())
    exp = [normalize_embed_py(t) for t in ADVERSARIAL]
    for g, e, src in zip(got, exp, ADVERSARIAL):
        assert g.encode() == e.encode(), repr(src)


def test_t1_t2_whitespace_classes_agree():
    """Python's str.split() and re \\s share the same whitespace class
    (both follow str.isspace(), incl. \\x1c-\\x1f and \\x85) — the real
    T1/T2 difference is only the 4000-char truncation."""
    s = "file sep \x1c here \x85 end"
    assert normalize_product_py(s) == "file sep here end"
    assert normalize_embed_py(s) == "file sep here end"


def test_t2_truncates_at_4000():
    s = "x" * 5000
    assert len(normalize_embed_py(s)) == MAX_TEXT_LEN
    assert len(normalize_product_py(s)) == 5000  # T1 has no cap


def test_jvm_normalize_matches_python_on_simple_ws(spark):
    """The JVM fast path agrees with Python on \\r\\n/space/tab content
    (its documented domain; exotic controls route through the UDF)."""
    simple = [t for t in ADVERSARIAL
              if t is not None and not any(c in t for c in "\x1c\x0b\x0c"
                                           "   ")]
    pdf = pd.DataFrame({"id": range(len(simple)), "text": simple})
    df = spark.createDataFrame(pdf, schema="id long, text string")
    got = (df.select("id", normalize_embed_col(F.col("text")).alias("n"))
           .toPandas().sort_values("id")["n"].tolist())
    exp = [normalize_embed_py(t) for t in simple]
    assert got == exp


def test_spam_predicate_parity(spark):
    pdf = pd.DataFrame({"id": range(len(SPAM_CASES)), "text": SPAM_CASES})
    df = spark.createDataFrame(pdf, schema="id long, text string")
    exp = [looks_spammy_py(t) for t in SPAM_CASES]
    got_udf = (df.select("id", looks_spammy_udf("text").alias("s"))
               .toPandas().sort_values("id")["s"].tolist())
    assert got_udf == exp
    got_jvm = (df.select("id", spam_flags_col(F.col("text")).alias("s"))
               .toPandas().sort_values("id")["s"].tolist())
    assert got_jvm == exp


def test_stable_id_parity(spark):
    pdf = pd.DataFrame({"t": ["some text", "ünïcödé"],
                        "ts": ["2020-01-01T00:00:00", "2021-06-01T12:00:00"],
                        "k": ["k1", "k2"]})
    df = spark.createDataFrame(pdf)
    got = df.select(stable_id_col(F.col("t"), F.col("ts"), F.col("k"))
                    .alias("sid")).toPandas()["sid"].tolist()
    exp = [stable_id_py(t, ts, k)
           for t, ts, k in zip(pdf["t"], pdf["ts"], pdf["k"])]
    assert got == exp
