"""Numpy end-to-end search oracle — mirrors the reference CLI flow
(app/test.py:228-342) as a single-process composition, used to assert the
distributed hybrid pipeline is rank- and score-identical.

Retrieval here is an independent implementation (matmul + lexsort + the
BM25 oracle); the fusion kernel is the shared `score_pool` (whose math has
its own hand-derived unit tests ported from the reference's
tests/test_utils.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import BM25Params, SecondPassConfig
from ..functions.tokenize import tokenize_k1_py, tokenize_k2_py
from ..query.encoder import cross_encoder_score, encode_batch, encode_text
from ..query.secondpass import score_pool
from .bm25_oracle import BM25Oracle


def hybrid_search_oracle(texts: list[str], meta: pd.DataFrame, query: str,
                         sp: SecondPassConfig, bm25_params: BM25Params,
                         k: int = 10, rerank_fn=cross_encoder_score,
                         ) -> pd.DataFrame:
    """meta: columns doc_id, n_reviews, avg_stars (row i ↔ texts[i])."""
    emb = encode_batch(texts).astype(np.float64)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / np.maximum(norms, 1e-12)
    qvec = encode_text(query).astype(np.float64)
    sims = (emb @ qvec).astype(np.float32)

    pool_n = max(k, sp.rerank_k, sp.pool_floor)
    doc_ids = meta["doc_id"].to_numpy()
    order = np.lexsort((doc_ids, -sims))[:pool_n]

    oracle = BM25Oracle([tokenize_k1_py(t) for t in texts], bm25_params)
    bm25_scores = oracle.get_scores(tokenize_k2_py(query))

    pool = pd.DataFrame({
        "doc_id": doc_ids[order],
        "agg_text": [texts[i] for i in order],
        "n_reviews": meta["n_reviews"].to_numpy()[order],
        "avg_stars": meta["avg_stars"].to_numpy()[order],
        "_dense": sims[order].astype(np.float64),
        "_bm25_raw": bm25_scores[order],
    })
    return score_pool(pool, query, sp, rerank_fn=rerank_fn, k=k)
