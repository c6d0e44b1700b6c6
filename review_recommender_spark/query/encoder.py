"""Deterministic text encoders (dense-retrieval stand-ins).

The reference encodes with sentence-transformers (BAAI/bge-small-en-v1.5,
nlp/11_build_product_embeddings.py:46-47) — model downloads are unavailable
here, so the engine's dense path runs on a *feature-hashing encoder*: token
→ hashed bucket ± sign, tf-weighted, L2-normalized. It is deterministic,
vocabulary-free, vectorized, and preserves the property dense retrieval
needs (cosine ∝ lexical overlap), so the hybrid pipeline and its tests are
real; swapping in a transformer on a cluster only changes this module.

The Spark side mirrors the reference's executor pattern for model inference
(M1): an iterator-of-batches pandas UDF with a lazily-initialized
per-worker "model" (here the hash planes), amortizing setup across batches.

A deterministic stand-in cross-encoder (M2/R5) lives here too: it scores
(query, text) pairs by hashed-token overlap — monotone in true overlap,
deterministic, and cheap.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_k2_py

DIM = 256


def encode_text(text: str, dim: int = DIM) -> np.ndarray:
    """Feature-hash a text into an L2-normalized float32 vector."""
    toks = tokenize_k2_py(text or "")
    v = np.zeros(dim, dtype=np.float64)
    for t in toks:
        h = zlib.crc32(t.encode("utf-8"))
        bucket = h % dim
        sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
        v[bucket] += sign
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def encode_batch(texts: list[str], dim: int = DIM) -> np.ndarray:
    return np.stack([encode_text(t, dim) for t in texts]) if texts else \
        np.zeros((0, dim), dtype=np.float32)


def embed_documents(df: DataFrame, text_col: str = "text",
                    out_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Distributed embedding build — iterator UDF with lazy per-worker init
    (the Spark-native analogue of the reference's sharded encode loop with
    batch=256, nlp/11:72-85)."""

    def encode_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # lazy 'model' init happens once per worker here (trivial for the
        # hashing encoder; the seam where a transformer would load)
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [encode_text(t, dim).tolist()
                            for t in pdf[text_col]]
            yield pdf

    from pyspark.sql import types as T
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col,
                                           T.ArrayType(T.FloatType()))])
    return df.mapInPandas(encode_partition, schema=schema)


def cross_encoder_score(query: str, texts: list[str]) -> np.ndarray:
    """Deterministic cross-encoder stand-in: scores by weighted hashed-token
    overlap between query and text prefix (reference truncates to 2000
    chars before rerank — caller applies the cap)."""
    q = set(tokenize_k2_py(query))
    if not q:
        return np.zeros(len(texts), dtype=np.float32)
    out = np.zeros(len(texts), dtype=np.float32)
    for i, t in enumerate(texts):
        toks = tokenize_k2_py(t or "")
        if not toks:
            continue
        hits = sum(1 for tok in toks if tok in q)
        out[i] = hits / np.sqrt(len(toks))
    return out
