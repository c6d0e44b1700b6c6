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


def best_review_scores_oracle(reviews: pd.DataFrame, pool_doc_ids,
                              query: str) -> dict[int, float]:
    """Numpy mirror of the reference's ``best_review_snippets``
    (app/test.py:181-215): semi-select reviews whose key is in the pool,
    l2-normalize, cosine vs the query vector, per-key argmax with
    first-max-wins in review (file) order — here ``review_id`` order.

    reviews columns: doc_id, review_id, text, stars, embedding (list/array).
    Returns {doc_id: best_sim(float32)} — missing keys contribute 0 later
    (app/test.py:283-287)."""
    keys = set(int(d) for d in pool_doc_ids)
    sel = reviews[reviews["doc_id"].isin(keys)]
    if sel.empty:
        return {}
    sel = sel.sort_values("review_id", kind="mergesort").reset_index(drop=True)
    emb = np.stack(sel["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / np.maximum(norms, 1e-12)
    qvec = encode_text(query).astype(np.float64)
    sims = (emb @ qvec).astype(np.float32)
    best: dict[int, float] = {}
    for doc, idxs in sel.groupby("doc_id").indices.items():
        j = int(sims[idxs].argmax())          # first max wins
        best[int(doc)] = float(sims[idxs][j])
    return best


def hybrid_search_oracle(texts: list[str], meta: pd.DataFrame, query: str,
                         sp: SecondPassConfig, bm25_params: BM25Params,
                         k: int = 10, rerank_fn=cross_encoder_score,
                         reviews: pd.DataFrame | None = None,
                         ) -> pd.DataFrame:
    """meta: columns doc_id, n_reviews, avg_stars (row i ↔ texts[i]).
    reviews (optional): doc_id, review_id, text, stars, embedding — enables
    the R6 best-review signal exactly as the reference CLI does by default
    (weight 0.05, app/test.py:353-357)."""
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
    if reviews is not None:
        best = best_review_scores_oracle(reviews, pool["doc_id"], query)
        pool["_bestrev_raw"] = np.array(
            [best.get(int(d), np.nan) for d in pool["doc_id"]],
            dtype=np.float64)
    return score_pool(pool, query, sp, rerank_fn=rerank_fn, k=k)
