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


def _build_canon() -> dict[str, str]:
    """Token → canonical synonym-group key, from the engine's public
    SYNONYMS/COLORS tables (utils.py:15-38). This gives the dense and
    cross-encoder stand-ins the one 'semantic' ability a lexical signal
    lacks — treating earbuds≡headphone, mustard≡yellow — which is exactly
    the complementarity a real sentence encoder contributes to the hybrid
    (and the same table the attribute gate already uses). Multi-word group
    members are skipped (token-level mapping only)."""
    from .secondpass import COLORS, SYNONYMS
    canon: dict[str, str] = {}
    for key, group in {**SYNONYMS, **COLORS}.items():
        for m in group:
            if " " in m or "-" in m:
                continue
            canon.setdefault(m, key)
    return canon


_CANON = _build_canon()


def _canon_tokens(text: str) -> list[str]:
    return [_CANON.get(t, t) for t in tokenize_k2_py(text or "")]


def encode_text(text: str, dim: int = DIM) -> np.ndarray:
    """Feature-hash a text into an L2-normalized float32 vector with
    SUBLINEAR (log1p) term-frequency weighting — transformer sentence
    embeddings are empirically near-insensitive to repeating a word, so a
    tf-linear stand-in would be unrealistically spammable; log1p keeps the
    cosine ∝ lexical overlap property while bounding any single term's
    influence."""
    toks = _canon_tokens(text)
    counts: dict[int, float] = {}
    for t in toks:
        h = zlib.crc32(t.encode("utf-8"))
        bucket = h % dim
        sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
        counts[bucket] = counts.get(bucket, 0.0) + sign
    v = np.zeros(dim, dtype=np.float64)
    for bucket, c in counts.items():
        v[bucket] = np.sign(c) * np.log1p(abs(c))
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def encode_batch(texts: list[str], dim: int = DIM) -> np.ndarray:
    """Batch-vectorized feature hashing, bitwise-identical to
    ``encode_text`` per row (tests/test_encoder_kernel.py gates this).

    Same treatment that made simhash ~26× faster (ops/textstats.py:144):
    the batch's tokens are flattened once, ``pd.factorize`` dedups the
    batch vocabulary, crc32 runs once per UNIQUE token, and every
    document's signed bucket counts land in one ``np.add.at``
    scatter-add over a dense (n_docs, dim) float64 matrix — no per-token
    Python dict, no per-text loop. Value identity holds because summing
    ±1.0 in float64 is exact and order-independent, and the per-row norm
    uses the same sqrt(dot(v, v)) path as ``np.linalg.norm`` on 1-D."""
    n = len(texts)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float32)
    # raw K2 tokens here; the synonym canon-map runs per UNIQUE token
    # after factorize (identical result, ~100× fewer dict lookups)
    doc_tokens = [tokenize_k2_py(t or "") for t in texts]
    counts = np.fromiter((len(t) for t in doc_tokens), dtype=np.int64,
                         count=n)
    total = int(counts.sum())
    if total == 0:
        return np.zeros((n, dim), dtype=np.float32)
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in doc_tokens:
        flat[pos:pos + len(toks)] = toks
        pos += len(toks)
    codes, uniques = pd.factorize(flat)
    uh = np.fromiter(
        (zlib.crc32(_CANON.get(u, u).encode("utf-8")) for u in uniques),
        dtype=np.uint32, count=len(uniques))
    ubucket = (uh % np.uint32(dim)).astype(np.int64)
    usign = np.where((uh >> np.uint32(31)) & np.uint32(1), -1.0, 1.0)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    fused = doc_idx * dim + ubucket[codes]
    m = np.bincount(fused, weights=usign[codes],
                    minlength=n * dim).reshape(n, dim)
    # m is exactly integer-valued (a sum of ±1.0 in float64), so log1p
    # routes through a small lookup table — this numpy build's log1p runs
    # at only ~3M elem/s, while a table gather is memory-speed. Bitwise
    # identical: lut[k] IS np.log1p(float64(k)).
    absm = np.abs(m).astype(np.int64)
    lut = np.log1p(np.arange(int(absm.max()) + 1, dtype=np.float64))
    v = np.sign(m) * lut[absm]
    # per-row np.dot is the exact code path np.linalg.norm takes on 1-D
    # input (sqrt(dot(x, x))) — keeps the norm bitwise identical to
    # encode_text; one BLAS ddot per row is negligible next to hashing.
    norms = np.sqrt(np.fromiter((np.dot(r, r) for r in v),
                                dtype=np.float64, count=n))
    np.maximum(norms, 1.0, out=norms, where=norms == 0.0)
    return (v / norms[:, None]).astype(np.float32)


class HashingEncoder:
    """Default 'model': the deterministic hashing encoder behind a
    sentence-transformers-shaped interface (``encode(list[str]) ->
    (B, dim) float32``)."""

    def __init__(self, dim: int = DIM):
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        return encode_batch(list(texts), self.dim)


DIM_V2 = 384


class HashingEncoderV2:
    """Second, INDEPENDENT stand-in encoder — different hash family
    (md5 vs crc32), different dimensionality (384 vs 256), two signed
    probes per token instead of one, sqrt-tf instead of log1p weighting.

    It exists for the golden eval's encoder-independence gate
    (tests/test_golden_eval.py): the planted corpus was designed against
    the default hashing encoder, so the reference method ordering
    (hybrid+rerank ≥ hybrid ≥ singles) being reproduced under THIS
    encoder too is evidence the eval measures the fusion design, not an
    encoder/corpus co-tuning artifact. Shares only the synonym canon map
    (engine-level semantics every dense stand-in needs to see the
    paraphrase plants — the same public table the attribute gate uses)."""

    def __init__(self, dim: int = DIM_V2):
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        import hashlib
        n = len(texts)
        dim = self.dim
        out = np.zeros((n, dim), dtype=np.float64)
        for i, text in enumerate(texts):
            counts: dict[str, int] = {}
            for t in _canon_tokens(text or ""):
                counts[t] = counts.get(t, 0) + 1
            for t, c in counts.items():
                h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                                   "little")
                w = float(np.sqrt(c))
                out[i, h % dim] += (1.0 if (h >> 17) & 1 == 0 else -1.0) * w
                out[i, (h >> 20) % dim] += \
                    (1.0 if (h >> 37) & 1 == 0 else -1.0) * w
            nn = float(np.linalg.norm(out[i]))
            if nn > 0:
                out[i] /= nn
        return out.astype(np.float32)


def hashing_encoder_v2():
    """Module-level factory (the ``embed_documents`` seam contract)."""
    return HashingEncoderV2()


def encode_text_v2(text: str) -> np.ndarray:
    """Query-side encode for HashingEncoderV2 (pairs with
    ``embed_documents(..., dim=DIM_V2, model_factory=hashing_encoder_v2)``
    via ``dense_topk_batch``'s query_encoder seam)."""
    return HashingEncoderV2().encode([text])[0]


# Per-PROCESS model singletons (python workers are reused across tasks;
# keying by qualified name survives re-pickling of the factory per task).
# This is the executor-side analogue of the reference's lazy global
# encoder (_ST in app/test.py / nlp/11:46-47): a heavyweight model loads
# at most once per worker process, not once per task or batch.
_WORKER_MODELS: dict = {}


def _worker_model(factory, key: str):
    model = _WORKER_MODELS.get(key)
    if model is None:
        model = _WORKER_MODELS[key] = factory()
    return model


def embed_documents(df: DataFrame, text_col: str = "text",
                    out_col: str = "embedding", dim: int = DIM,
                    batch_size: int = 256,
                    model_factory=None) -> DataFrame:
    """Distributed embedding build — iterator UDF with a lazy per-worker
    model singleton and explicit encode batching (the Spark-native
    analogue of the reference's sharded encode loop, batch=256 at
    nlp/11:20,72-85).

    ``model_factory``: zero-arg callable returning an object with
    ``encode(list[str]) -> (B, dim) ndarray`` — the seam where a real
    sentence-transformer loads on a cluster. It must be importable
    (module-level) so its qualified name keys the per-worker cache."""
    factory = model_factory or (lambda: HashingEncoder(dim))
    key = (f"{getattr(model_factory, '__module__', 'default')}."
           f"{getattr(model_factory, '__qualname__', 'hashing')}:{dim}")
    import pyarrow as pa

    text_idx = df.columns.index(text_col)

    def encode_partition(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # mapInArrow, not mapInPandas: the (B, dim) float32 encode output
        # becomes the list column DIRECTLY from its flat buffer
        # (offsets + values) — the earlier per-row `v.tolist()`
        # materialized B·dim Python floats per batch, which dominated the
        # embed-build stage at 120k docs.
        model = None
        for batch in it:
            if model is None:
                model = _worker_model(factory, key)
            texts = ["" if t is None else t
                     for t in batch.column(text_idx).to_pylist()]
            chunks = [model.encode(texts[i:i + batch_size])
                      for i in range(0, len(texts), batch_size)]
            vecs = (np.concatenate(chunks) if chunks else
                    np.zeros((0, dim), dtype=np.float32))
            offsets = np.arange(0, (len(texts) + 1) * dim, dim,
                                dtype=np.int32)
            emb = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(vecs.ravel(), type=pa.float32()))
            yield pa.record_batch(batch.columns + [emb],
                                  names=batch.schema.names + [out_col])

    from pyspark.sql import types as T
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col,
                                           T.ArrayType(T.FloatType()))])
    return df.mapInArrow(encode_partition, schema=schema)


def cross_encoder_score(query: str, texts: list[str]) -> np.ndarray:
    """Deterministic cross-encoder stand-in. Scores query COVERAGE — the
    fraction of distinct query tokens present in the text prefix — plus a
    small density term. Coverage (not occurrence counting) mirrors what a
    real cross-encoder rewards and is robust to single-term spam: a doc
    repeating one query word 20× scores 1/|q|, a doc containing every
    query word scores 1.0. (Reference truncates text to 2000 chars before
    rerank — the caller applies that cap.)"""
    q = set(_canon_tokens(query))
    if not q:
        return np.zeros(len(texts), dtype=np.float32)
    out = np.zeros(len(texts), dtype=np.float32)
    for i, t in enumerate(texts):
        toks = _canon_tokens(t)
        if not toks:
            continue
        present = q.intersection(toks)
        density = sum(1 for tok in toks if tok in q) / len(toks)
        out[i] = len(present) / len(q) + 0.1 * density
    return out
