"""Golden query set — the reference's 10 eval queries re-anchored onto the
synthetic page corpus (evals/test_queries.py:13-118; FIXTURES.md F6).

Relevance judgments are *planted*: corpus/pages.py injects each query's
phrase into deterministically-chosen doc_ids, so ground truth is exact and
reproducible at any corpus size. Method configs (Dense/BM25/Hybrid/
Hybrid+Rerank) mirror evals/test_queries.py:255-312 and BASELINE.md §1.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from ..config import FusionWeights, SecondPassConfig, cli_profile
from ..corpus.pages import (GOLDEN_PHRASES, PLANT_PERIOD, N_RELEVANT,
                            planted_doc_offsets)


@dataclass(frozen=True)
class GoldenQuery:
    qid: int
    query: str
    relevant: frozenset[int]


def golden_queries(n_docs: int) -> list[GoldenQuery]:
    out = []
    for qi, phrase in enumerate(GOLDEN_PHRASES):
        rel = set()
        for off in planted_doc_offsets(qi):
            rel.update(range(off, n_docs, PLANT_PERIOD))
        out.append(GoldenQuery(qid=qi, query=phrase,
                               relevant=frozenset(rel)))
    return out


# Method configs — evals/test_queries.py:255-312 / BASELINE.md §1.
def method_configs() -> dict[str, SecondPassConfig]:
    base = cli_profile()
    return {
        "dense_only": replace(base, weights=FusionWeights(1.0, 0, 0, 0, 0),
                              rerank_k=0, gate_penalty=1.0),
        "bm25_only": replace(base, weights=FusionWeights(0, 1.0, 0, 0, 0),
                             rerank_k=0, gate_penalty=1.0),
        "hybrid": replace(base, weights=FusionWeights(0.5, 0.3, 0.0, 0.2, 0),
                          rerank_k=0, gate_penalty=0.3),
        "hybrid_rerank": replace(base,
                                 weights=FusionWeights(0.4, 0.2, 0.3, 0.1, 0),
                                 rerank_k=20, gate_penalty=0.5),
    }
