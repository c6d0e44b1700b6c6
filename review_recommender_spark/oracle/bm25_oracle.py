"""Numpy reference oracle for BM25 — the parity target for the Spark engine.

Implements, in ~100 lines of plain numpy, the exact published semantics of
``rank_bm25.BM25Okapi`` (the public PyPI library the reference delegates to;
constructor call sites app/test.py:156, app/app_product_search.py:142 —
the library is pinned by name, not vendored, so these formulas are taken from
its public source; SURVEY.md §2.12 / quirk Q9):

  * ``doc_len[d]``   = token count of document d
  * ``avgdl``        = total tokens / corpus size
  * ``df[t]``        = number of documents containing t
  * raw ``idf[t]``   = ln(N - df + 0.5) - ln(df + 0.5)
  * epsilon fixup    : average_idf = mean of raw idf over the whole
    vocabulary (negatives included); every negative idf is replaced by
    ``epsilon * average_idf``.
  * ``score(q, d)``  = Σ_{token occurrences q_i in query}
        idf[q_i] · tf(q_i,d)·(k1+1) / (tf(q_i,d) + k1·(1 − b + b·dl_d/avgdl))
    — repeated query tokens contribute once per occurrence; unknown terms 0.

Used by tests to check posting lists, document frequencies, idf (incl. the
fixup), and per-query top-k rankings of the distributed engine.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from ..config import BM25Params


@dataclass
class BM25Oracle:
    corpus: list[list[str]]
    params: BM25Params = field(default_factory=BM25Params)

    def __post_init__(self) -> None:
        self.corpus_size = len(self.corpus)
        self.doc_freqs: list[dict[str, int]] = [dict(Counter(doc)) for doc in self.corpus]
        self.doc_len = np.array([len(doc) for doc in self.corpus], dtype=np.float64)
        total_tokens = float(self.doc_len.sum())
        self.avgdl = total_tokens / self.corpus_size if self.corpus_size else 0.0
        self.df: dict[str, int] = Counter()
        for freqs in self.doc_freqs:
            for term in freqs:
                self.df[term] += 1
        self.idf = self._calc_idf()

    def _calc_idf(self) -> dict[str, float]:
        idf: dict[str, float] = {}
        idf_sum = 0.0
        negative = []
        n = self.corpus_size
        for term, freq in self.df.items():
            v = math.log(n - freq + 0.5) - math.log(freq + 0.5)
            idf[term] = v
            idf_sum += v
            if v < 0:
                negative.append(term)
        self.average_idf = idf_sum / len(idf) if idf else 0.0
        eps = self.params.epsilon * self.average_idf
        for term in negative:
            idf[term] = eps
        return idf

    def get_scores(self, query_tokens: list[str]) -> np.ndarray:
        k1, b = self.params.k1, self.params.b
        score = np.zeros(self.corpus_size, dtype=np.float64)
        if not self.corpus_size:
            return score
        denom_norm = k1 * (1 - b + b * self.doc_len / self.avgdl)
        for q in query_tokens:
            q_freq = np.array([freqs.get(q) or 0 for freqs in self.doc_freqs],
                              dtype=np.float64)
            score += (self.idf.get(q) or 0.0) * (q_freq * (k1 + 1) /
                                                 (q_freq + denom_norm))
        return score

    def top_k(self, query_tokens: list[str], k: int) -> list[tuple[int, float]]:
        """Top-k (doc_index, score), score desc with doc_index asc tie-break
        (the engine's deterministic ordering — SURVEY.md quirk Q7)."""
        scores = self.get_scores(query_tokens)
        order = np.lexsort((np.arange(self.corpus_size), -scores))
        return [(int(i), float(scores[i])) for i in order[:k]]

    def postings(self) -> dict[str, list[tuple[int, int]]]:
        """term -> sorted [(doc_index, tf), ...] — parity target for the
        distributed posting lists."""
        out: dict[str, list[tuple[int, int]]] = {}
        for d, freqs in enumerate(self.doc_freqs):
            for term, tf in freqs.items():
                out.setdefault(term, []).append((d, tf))
        for lst in out.values():
            lst.sort()
        return out
