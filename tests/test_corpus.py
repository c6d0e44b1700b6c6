"""Synthetic corpus generator invariants (corpus/pages.py).

The corpus is a pure function of (seed, doc_id): every oracle, cache key,
and scaling comparison in the repo depends on that. The bursty/topical
variant (bench's skip-machinery corpus) must obey the same invariants
without perturbing the default corpus by a single byte.
"""

import hashlib

import numpy as np
import pandas as pd

from review_recommender_spark.corpus.pages import (GOLDEN_TOPICS,
                                                   bursty_queries,
                                                   pages_pdf)

# Frozen digest of the default corpus text for doc_ids 0..499. If this
# changes, CORPUS_FORMAT_VERSION must be bumped (bench cache keys) and
# every recorded BENCH/scaling number predating the change is stale.
DEFAULT_TEXT_MD5_500 = "1985f2adb282e03afaff5682d1dff2e7"


def test_default_corpus_frozen():
    pdf = pages_pdf(np.arange(500))
    got = hashlib.md5("\x00".join(pdf["text"]).encode()).hexdigest()
    assert got == DEFAULT_TEXT_MD5_500


def test_bursty_deterministic_and_partition_independent():
    ids = np.arange(3000)
    whole = pages_pdf(ids, bursty=True, plant=False).reset_index(drop=True)
    again = pages_pdf(ids, bursty=True, plant=False).reset_index(drop=True)
    assert whole.equals(again)
    split = pd.concat([pages_pdf(ids[:997], bursty=True, plant=False),
                       pages_pdf(ids[997:], bursty=True, plant=False)],
                      ignore_index=True)
    assert split.equals(whole)


def test_bursty_topical_df_is_web_realistic():
    """Topical golden terms must be rare (df ≈ n/GOLDEN_TOPICS, ~0.2%)
    while head words stay common — the mixed selectivity the bursty
    bench queries rely on."""
    n = 4000
    pdf = pages_pdf(np.arange(n), bursty=True, plant=False)
    token_sets = [set(t.split()) for t in pdf["text"]]

    def df(w):
        return sum(1 for s in token_sets if w in s)

    for rare in ["wireless", "headphones", "organic", "socks"]:
        assert df(rare) <= 4 * n / GOLDEN_TOPICS, rare
    for common in ["water", "people", "time"]:
        assert df(common) > n * 0.05, common
    # topical docs carry their whole phrase (enrichment co-occurrence):
    # docs containing 'wireless' mostly also contain 'bluetooth'
    both = sum(1 for s in token_sets if "wireless" in s and "bluetooth" in s)
    assert both >= max(1, df("wireless") // 2)


def test_bursty_tf_heavy_tail():
    """The two-level burst model must produce per-(term, doc) tf far above
    the default corpus' near-uniform 1-3."""
    pdf = pages_pdf(np.arange(2000), bursty=True, plant=False)
    max_tf = 0
    for t in pdf["text"][:500]:
        toks = t.split()
        if not toks:
            continue
        vals, counts = np.unique(toks, return_counts=True)
        max_tf = max(max_tf, int(counts.max()))
    assert max_tf >= 50, max_tf


def test_bursty_queries_shape():
    qs = bursty_queries()
    assert len(qs) == 10
    assert all(len(q.split()) >= 4 for q in qs)
