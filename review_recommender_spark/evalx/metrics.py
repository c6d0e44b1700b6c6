"""IR metrics — both DCG variants the reference ships (quirk Q6).

``dcg``/``ndcg`` follow evals/performance_metrics.py:19-49 (rel/log2(i+1),
binary relevance; the benchmark variant). ``dcg_exp`` follows the app-side
variant (2^rel − 1)/log2(i+2) (app_product_search.py:441-450). MRR, Recall
and Precision per evals/performance_metrics.py:52-153 — note Recall@k
divides by |relevant| (not clipped), and all metrics return 0.0 on empty
inputs, matching the reference's guards.
"""

from __future__ import annotations

import math
from collections.abc import Sequence, Set


def dcg_at_k(relevances: Sequence[float], k: int) -> float:
    """evals/performance_metrics.py:19-40 — Σ rel_i / log2(i+1), 1-based;
    k ≤ 0 returns 0.0 (the reference's explicit guard)."""
    if k <= 0:
        return 0.0
    rels = list(relevances)[:k]
    out = 0.0
    for i, rel in enumerate(rels, start=1):
        out += rel / math.log2(i + 1) if i > 1 else rel
    return out


def ndcg_graded_at_k(relevances: Sequence[float],
                     ideal: Sequence[float], k: int) -> float:
    """GRADED-relevance nDCG with the reference's exact signature
    (evals/performance_metrics.py:43-61): relevance scores in retrieved
    order vs relevance scores in ideal order; idcg == 0 → 0.0.
    ``ndcg_at_k`` below is the binary id-set convenience wrapper the
    golden-eval harness uses."""
    dcg = dcg_at_k(relevances, k)
    idcg = dcg_at_k(ideal, k)
    return dcg / idcg if idcg > 0 else 0.0


def ndcg_at_k(retrieved: Sequence[str], relevant: Set[str], k: int) -> float:
    rels = [1.0 if r in relevant else 0.0 for r in retrieved[:k]]
    ideal = sorted(rels, reverse=True)
    n_ideal = min(len(relevant), k)
    ideal = [1.0] * n_ideal + [0.0] * (k - n_ideal)
    dcg = dcg_at_k(rels, k)
    idcg = dcg_at_k(ideal, k)
    return dcg / idcg if idcg > 0 else 0.0


def dcg_exp_at_k(relevances: Sequence[float], k: int) -> float:
    """app_product_search.py:447-448 — Σ (2^rel − 1) / log2(i+2), 0-based."""
    return sum((2 ** rel - 1) / math.log2(i + 2)
               for i, rel in enumerate(list(relevances)[:k]))


def mrr(retrieved: Sequence[str], relevant: Set[str]) -> float:
    """evals/performance_metrics.py:52-76 — 1/rank of first relevant."""
    for i, r in enumerate(retrieved, start=1):
        if r in relevant:
            return 1.0 / i
    return 0.0


def recall_at_k(retrieved: Sequence[str], relevant: Set[str], k: int) -> float:
    if not relevant:
        return 0.0
    hits = len(set(retrieved[:k]) & set(relevant))
    return hits / len(relevant)


def precision_at_k(retrieved: Sequence[str], relevant: Set[str],
                   k: int) -> float:
    """Divides by len(retrieved[:k]) — NOT by k — matching the
    reference exactly (evals/performance_metrics.py:144-150: shorter
    result lists are not penalized); empty top-k → 0.0."""
    top_k = retrieved[:k]
    if len(top_k) == 0:
        return 0.0
    hits = len(set(top_k) & set(relevant))
    return hits / len(top_k)


def _check_paired(ranked_results: Sequence[Sequence[str]],
                  relevant_items: Sequence[Set[str]]) -> None:
    if len(ranked_results) != len(relevant_items):
        raise ValueError(
            "Number of queries must match for results and relevance")


def mrr_score(ranked_results: Sequence[Sequence[str]],
              relevant_items: Sequence[Set[str]]) -> float:
    """Multi-query MRR with the reference's exact signature + length
    guard (evals/performance_metrics.py:64-90): mean over queries of
    1/rank of the first relevant item, 0.0 when none retrieved."""
    _check_paired(ranked_results, relevant_items)
    rr = [mrr(res, rel) for res, rel in zip(ranked_results, relevant_items)]
    return sum(rr) / len(rr) if rr else 0.0


def recall_score_at_k(ranked_results: Sequence[Sequence[str]],
                      relevant_items: Sequence[Set[str]], k: int) -> float:
    """Multi-query Recall@K (evals/performance_metrics.py:93-121):
    divides by |relevant| (not clipped); empty relevant set → 0.0."""
    _check_paired(ranked_results, relevant_items)
    rs = [recall_at_k(res, rel, k)
          for res, rel in zip(ranked_results, relevant_items)]
    return sum(rs) / len(rs) if rs else 0.0


def precision_score_at_k(ranked_results: Sequence[Sequence[str]],
                         relevant_items: Sequence[Set[str]],
                         k: int) -> float:
    """Multi-query Precision@K (evals/performance_metrics.py:124-153)."""
    _check_paired(ranked_results, relevant_items)
    ps = [precision_at_k(res, rel, k)
          for res, rel in zip(ranked_results, relevant_items)]
    return sum(ps) / len(ps) if ps else 0.0


def evaluate_query(retrieved: Sequence[str], relevant: Set[str]) -> dict:
    """Per-query metric bundle (evals/performance_metrics.py:190-198)."""
    return {
        "ndcg@5": ndcg_at_k(retrieved, relevant, 5),
        "ndcg@10": ndcg_at_k(retrieved, relevant, 10),
        "mrr": mrr(retrieved, relevant),
        "recall@10": recall_at_k(retrieved, relevant, 10),
        "recall@20": recall_at_k(retrieved, relevant, 20),
        "precision@5": precision_at_k(retrieved, relevant, 5),
        "precision@10": precision_at_k(retrieved, relevant, 10),
    }


def mean_metrics(per_query: list[dict]) -> dict:
    if not per_query:
        return {}
    keys = per_query[0].keys()
    return {k: sum(m[k] for m in per_query) / len(per_query) for k in keys}
