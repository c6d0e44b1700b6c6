"""Text normalization chains — reference-frozen semantics, Spark-vectorized.

The reference ships three near-identical normalizers; the two on the live
path are reproduced here byte-for-byte (SURVEY.md §2.3):

  * T1 ``normalize_product`` — nlp/10_product_prep.py:21-24:
    replace CR/LF with spaces, strip, collapse whitespace runs via
    ``" ".join(s.split())`` (splits on *all* Unicode whitespace).
  * T2 ``normalize_embed`` — nlp/11_build_product_embeddings.py:32-36:
    same CR/LF replace + strip, collapse via ``re.sub(r"\\s+", " ", s)``,
    then truncate to 4000 chars. (Python's str.split() and re \\s share the
    same whitespace class — both follow str.isspace() — so the chains
    differ only in the cap; Java's \\s is ASCII-only, which is why the JVM
    fast path below is NOT byte-identical on exotic whitespace.)

Each has (a) a plain-Python form (the oracle / parity target), and (b) an
Arrow-vectorized pandas UDF for Spark (no per-row Python UDFs). The pandas
implementations call the same Python string ops per value inside an Arrow
batch, guaranteeing byte-identity with (a) — verified in
tests/test_normalize.py over adversarial inputs.

Spam predicate (P4) from nlp/11:25-39 and the stable id hash (T5) from
etl/02_normalize_merge.py:12-14 live here too.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_TEXT_LEN = 4000  # nlp/11:23
MIN_TEXT_LEN = 10    # nlp/11:22, nlp/10:43

_WS_RE = re.compile(r"\s+")

# Spam regexes — nlp/11_build_product_embeddings.py:25-27
URL_RE = re.compile(r"https?://\S+|www\.\S+", re.IGNORECASE)
PROMO_RE = re.compile(r"(discount code|use code|sponsored|i received this.*free)",
                      re.IGNORECASE)
REPEAT_RE = re.compile(r"(.)\1{9,}")


# ---------------------------------------------------------------- plain python

def normalize_product_py(s: object) -> str:
    """T1 — nlp/10_product_prep.py:21-24, byte-identical."""
    s = (s or "").replace("\r", " ").replace("\n", " ").strip()
    return " ".join(s.split())


def normalize_embed_py(s: object) -> str:
    """T2 — nlp/11_build_product_embeddings.py:32-36, byte-identical."""
    if not isinstance(s, str):
        s = "" if s is None else str(s)
    s = s.replace("\r", " ").replace("\n", " ").strip()
    s = _WS_RE.sub(" ", s)
    return s[:MAX_TEXT_LEN]


def looks_spammy_py(s: str) -> bool:
    """P4 — nlp/11:38-39."""
    return (len(URL_RE.findall(s)) >= 2) or bool(PROMO_RE.search(s)) or bool(
        REPEAT_RE.search(s))


def stable_id_py(text: str, ts_iso: str, key: str) -> str:
    """T5 — etl/02_normalize_merge.py:12-14: sha256 of "text|ts|key", 32 hex."""
    return hashlib.sha256(f"{text}|{ts_iso}|{key}".encode("utf-8")).hexdigest()[:32]


# ------------------------------------------------------------------ pandas UDFs

@F.pandas_udf(T.StringType())
def normalize_product_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_product_py)


@F.pandas_udf(T.StringType())
def normalize_embed_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_embed_py)


@F.pandas_udf(T.BooleanType())
def looks_spammy_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(looks_spammy_py)


# --------------------------------------------------------------- JVM expressions
# Fast paths used where byte-identity with Python whitespace semantics is not
# load-bearing (the tokenizer regex only matches [a-z0-9'] runs, so whitespace
# normalization differences cannot change token streams).

def normalize_embed_col(col: Column) -> Column:
    """JVM analogue of T2. Java's \\s is ASCII [ \\t\\n\\x0B\\f\\r] — it
    misses Unicode whitespace (\\x1c, \\x85, NBSP...) that Python collapses,
    so this is a fast path for ASCII-ish corpora; the Arrow UDF is the
    byte-identical route (tests/test_normalize.py)."""
    c = F.regexp_replace(col, "[\r\n]", " ")
    c = F.trim(c)
    c = F.regexp_replace(c, "\\s+", " ")
    return F.substring(c, 1, MAX_TEXT_LEN)


def stable_id_col(text: Column, ts_iso: Column, key: Column) -> Column:
    return F.sha2(F.concat_ws("|", text, ts_iso, key), 256).substr(1, 32)


def spam_flags_col(col: Column) -> Column:
    """P4 as JVM predicate; the backreference repeat-char clause stays in the
    Arrow UDF (Spark RLIKE supports \\1 backrefs via Java regex, DuckDB's RE2
    does not — oracle pairs therefore only cover the first two clauses)."""
    url_count = F.size(F.regexp_extract_all(col, F.lit(r"(?i)https?://\S+|www\.\S+"), 0))
    promo = col.rlike(r"(?i)(discount code|use code|sponsored|i received this.*free)")
    repeat = col.rlike(r"(.)\1{9,}")
    return (url_count >= 2) | promo | repeat
