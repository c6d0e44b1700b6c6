"""Second-pass hybrid rerank over the BM25/dense candidate pool.

Reproduces the reference's fusion math exactly (SURVEY.md §2.13, R1-R8;
CLI path app/test.py:228-342, app path app/app_product_search.py:245-317):

  * pool-relative min-max: (x−lo)/(hi−lo+1e-12) → float32, zeros when the
    pool is constant/non-finite (utils.py:46-55)
  * Bayesian rating prior with the *pool-scoped* global mean (quirk Q4)
  * volume prior log1p(n)/(max log1p(n)+1e-9); blend 0.7/0.3
  * cross-encoder rerank of only the first rerank_k pool rows in dense
    order; rows beyond get 0 BEFORE the minmax (quirk Q5)
  * attribute gates: ≤6 token-sets from colors/synonyms/long tokens;
    factor = penalty^(#groups with no substring hit in agg_text[:6000])
  * trust damping multiplied into the final score only in the app profile
    (quirk Q1)
  * final sort: score desc with pool-position tie-break (replicating
    pandas' stable sort over the dense-ordered pool)

The kernel is pure numpy/pandas over one pool (≤ ~200 rows), so it runs
identically as the parity oracle and as a ``groupBy(query_id)
.applyInPandas`` stage when evaluating many queries in one Spark job.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..config import SecondPassConfig
from ..functions.tokenize import tokenize_k2_py

# Synonym/color gate tables — utils.py:15-38 (verbatim).
SYNONYMS = {
    "sock": {"sock", "socks"},
    "headphone": {"headphone", "headphones", "earphone", "earphones",
                  "earbud", "earbuds", "headset"},
    "keyboard": {"keyboard", "keyboards"},
    "wireless": {"wireless", "bluetooth"},
    "noise": {"noise cancelling", "noise-canceling", "noise canceling", "anc"},
    "cat": {"cat", "cats", "kitten", "kittens", "kitty"},
    "dog": {"dog", "dogs", "puppy", "puppies"},
    "design": {"design", "pattern", "print", "graphic", "artwork", "motif",
               "theme"},
}

COLORS = {
    "yellow": {"yellow", "mustard", "lemon", "gold", "golden"},
    "red": {"red", "scarlet", "crimson", "maroon"},
    "blue": {"blue", "navy", "cobalt", "azure"},
    "green": {"green", "emerald", "olive"},
    "black": {"black"},
    "white": {"white", "ivory"},
    "pink": {"pink", "rose"},
    "purple": {"purple", "violet", "lavender"},
    "orange": {"orange", "amber"},
    "brown": {"brown", "tan", "beige", "khaki"},
    "gray": {"gray", "grey", "charcoal", "slate"},
}


def minmax(arr: np.ndarray) -> np.ndarray:
    """utils.py:46-55 / app/test.py:114-119 — byte-exact."""
    arr = np.asarray(arr)
    if arr.size == 0:
        return arr.astype(np.float32)
    lo, hi = float(np.min(arr)), float(np.max(arr))
    if not math.isfinite(lo) or not math.isfinite(hi) or hi - lo < 1e-12:
        return np.zeros_like(arr, dtype=np.float32)
    return ((arr - lo) / (hi - lo + 1e-12)).astype(np.float32)


def bayesian_prior(avg: np.ndarray, n: np.ndarray, C: float = 20.0,
                   global_mean: float | None = None) -> np.ndarray:
    """utils.py:103-109 — g defaults to nanmean over the POOL (quirk Q4)."""
    g = float(np.nanmean(avg)) if global_mean is None else float(global_mean)
    return ((avg * n) + (g * C)) / (n + C + 1e-9)


def trust_score(n: np.ndarray, min_reviews: int = 8,
                saturation: int = 50) -> np.ndarray:
    """utils.py:126-133."""
    ramp = np.clip(n / max(min_reviews, 1), 0, 1)
    sat = np.minimum(1.0, np.log1p(n) / np.log1p(max(saturation, 1)))
    return (0.6 * ramp + 0.4 * sat).astype(np.float32)


def build_gate_groups(query: str, max_groups: int = 6) -> list[set[str]]:
    """utils.py:62-86 — colors by substring hit, synonyms by token, literal
    tokens of length ≥ 4; first-occurrence dedup; cap 6."""
    query_lower = query.lower()
    groups: list[set[str]] = []
    for _color, syns in COLORS.items():
        if any(word in query_lower for word in syns):
            groups.append(syns)
    for token in tokenize_k2_py(query):
        if token in SYNONYMS:
            groups.append(SYNONYMS[token])
        elif len(token) >= 4:
            groups.append({token})
    unique: list[set[str]] = []
    for g in groups:
        if g not in unique:
            unique.append(g)
    return unique[:max_groups]


def gate_factor(text: str, groups: list[set[str]],
                penalty: float = 0.5) -> float:
    """utils.py:88-101 — substring containment per group."""
    text_lower = text.lower()
    factor = 1.0
    for group in groups:
        if not any(s in text_lower for s in group):
            factor *= penalty
    return factor


def score_pool(pool: pd.DataFrame, query: str, cfg: SecondPassConfig,
               rerank_fn=None, k: int = 10) -> pd.DataFrame:
    """Score one candidate pool. ``pool`` must be in dense-retrieval order
    with columns: key, agg_text, n_reviews, avg_stars, _dense (raw cosine),
    _bm25_raw (corpus-global BM25), optional _bestrev_raw.

    Returns the top-k with _final plus each normalized signal, mirroring
    app/test.py:228-342 (CLI) / app_product_search.py:245-317 (app)."""
    cand = pool.reset_index(drop=True).copy()
    w = cfg.weights

    cand["_bm25"] = minmax(cand["_bm25_raw"].to_numpy())

    n = pd.to_numeric(cand.get("n_reviews"), errors="coerce").fillna(0).to_numpy(
        dtype=np.float64)
    r = pd.to_numeric(cand.get("avg_stars"), errors="coerce").to_numpy(
        dtype=np.float64)
    prior_rating = bayesian_prior(r, n, C=cfg.prior_strength)
    prior_volume = np.log1p(n) / (np.log1p(n).max() + 1e-9)
    cand["_prior"] = minmax(prior_rating) * cfg.prior_rating_weight \
        + cfg.prior_volume_weight * prior_volume

    if cfg.rerank_k > 0 and rerank_fn is not None:
        k_rr = min(cfg.rerank_k, len(cand))
        rr_texts = (cand["agg_text"].astype(str)
                    .str.slice(0, cfg.rerank_text_cap).tolist()[:k_rr])
        rr = np.asarray(rerank_fn(query, rr_texts), dtype=np.float32)
        zeros = np.zeros(len(cand), dtype=np.float32)
        zeros[:k_rr] = minmax(rr)
        cand["_rerank"] = zeros
    else:
        cand["_rerank"] = np.float32(0.0)

    cand["_dense_norm"] = minmax(cand["_dense"].to_numpy())

    if "_bestrev_raw" in cand.columns:
        cand["_bestrev"] = minmax(
            cand["_bestrev_raw"].fillna(0.0).to_numpy(dtype=np.float32))
    else:
        cand["_bestrev"] = np.float32(0.0)

    groups = build_gate_groups(query, cfg.max_gate_groups)
    gate = np.array([
        gate_factor(t, groups, cfg.gate_penalty)
        for t in cand["agg_text"].astype(str).str.slice(0, cfg.gate_text_cap)],
        dtype=np.float32)
    cand["_gate"] = gate

    final = (w.dense * cand["_dense_norm"].to_numpy()
             + w.bm25 * cand["_bm25"].to_numpy()
             + w.rerank * cand["_rerank"].to_numpy()
             + w.prior * cand["_prior"].to_numpy()
             + w.best_review * cand["_bestrev"].to_numpy()).astype(np.float32)
    final = final * gate
    if cfg.apply_trust:
        final = final * trust_score(n, cfg.trust_min_reviews,
                                    cfg.trust_saturation)
    cand["_final"] = final

    # deterministic hardening: a STABLE sort so exact _final ties keep pool
    # (dense) order. The reference's sort_values (app/test.py:310) uses the
    # default unstable quicksort, so its tied-row order is incidental; we
    # pin one reproducible order rather than replicate that nondeterminism.
    order = np.argsort(-cand["_final"].to_numpy(), kind="stable")[:k]
    return cand.iloc[order].reset_index(drop=True)
