"""Tokenizers — the reference's two deliberately-asymmetric tokenizers.

K1 (index side, tag "simple_en_v1") — nlp/12_product_prep.py:42-49,75-78:
    lowercase → findall ``[a-z0-9]+(?:'[a-z0-9]+)?`` → drop the 56-word
    index stoplist AND tokens of length ≤ 1 → cap at first 5000 kept tokens.
    (The cap applies to the *filtered* list: ``toks[:5000]`` after the
    comprehension.)

K2 (query side) — utils.py:57-60:
    lowercase → same regex → drop a different 16-word stoplist; no length
    filter, no cap. The asymmetry (1-char tokens survive K2 but never exist
    in a K1 corpus; "it"/"is" survive K1 but are stripped from queries) is
    reference behavior and is preserved (SURVEY.md quirk Q3).

Implementations:
  * ``tokenize_k1_py`` / ``tokenize_k2_py`` — frozen Python (oracle parity).
  * ``tokenize_k1_udf`` — Arrow-vectorized pandas UDF wrapping the Python
    regex (byte-identical by construction).
  * ``tokenize_k1_col`` — pure JVM Column expression (regexp_extract_all +
    higher-order filter + slice); stays inside whole-stage codegen, no
    Python worker. tests/test_tokenize.py asserts it agrees with the Python
    form on the corpora we generate (the regex uses only ASCII classes, and
    Java/Python lowercasing agree on all inputs our generators emit; the
    Arrow UDF remains available for corpora where that cannot be assumed).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_PATTERN = r"[a-z0-9]+(?:'[a-z0-9]+)?"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# Index stoplist — nlp/12_product_prep.py:44-49 (verbatim).
STOP_INDEX = frozenset({
    "a", "an", "and", "the", "is", "are", "am", "be", "been", "to", "for",
    "of", "in", "on", "at", "by",
    "it", "its", "this", "that", "with", "from", "as", "or", "if", "but",
    "than", "then", "so",
    "i", "you", "he", "she", "we", "they", "my", "your", "our", "their",
    "me", "him", "her", "us", "them",
    "was", "were", "will", "would", "should", "could", "may", "might",
    "can", "cannot", "cant", "won't",
})

# Query stoplist — utils.py:12 (verbatim).
STOP_QUERY = frozenset({
    "a", "an", "the", "and", "or", "of", "for", "to", "in", "on", "with",
    "is", "are", "it", "this", "that",
})

TOKEN_CAP = 5000  # nlp/12:78


def tokenize_k1_py(s: str, cap: int = TOKEN_CAP) -> list[str]:
    s = (s or "").lower()
    toks = [t for t in TOKEN_RE.findall(s) if t not in STOP_INDEX and len(t) > 1]
    return toks[:cap]


def tokenize_k2_py(query: str) -> list[str]:
    tokens = TOKEN_RE.findall((query or "").lower())
    return [t for t in tokens if t not in STOP_QUERY]


def make_tokenize_k1_udf(cap: int = TOKEN_CAP):
    """Arrow K1 tokenizer closing over the configured cap — keeps the
    arrow and JVM paths in agreement for non-default ``token_cap``."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: tokenize_k1_py(t, cap))

    return _udf


tokenize_k1_udf = make_tokenize_k1_udf()


def tokenize_k1_col(col: Column, cap: int = TOKEN_CAP) -> Column:
    """K1 as a pure JVM expression (codegen'd; no Python worker round-trip)."""
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)
    kept = F.filter(toks, lambda t: (F.length(t) > 1) & (~t.isin(*sorted(STOP_INDEX))))
    return F.slice(kept, 1, cap)


def k1_sql_duckdb(text_expr: str, cap: int = TOKEN_CAP) -> str:
    """The K1 chain as a DuckDB SQL expression over ``text_expr`` — used to
    build the driver's oracle queries. Apostrophe doubled for SQL."""
    stop = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(STOP_INDEX))
    pattern = "[a-z0-9]+(?:''[a-z0-9]+)?"
    return (
        f"list_slice(list_filter(regexp_extract_all(lower({text_expr}), "
        f"'{pattern}'), t -> len(t) > 1 AND t NOT IN ({stop})), 1, {cap})"
    )
