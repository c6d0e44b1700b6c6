"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md F1).

Schema per the build target's input hint:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Generation is a pure function of (seed, doc_id) via counter-based hashing
(splitmix64), so the corpus is byte-identical regardless of partitioning,
parallelism, or generation order — the property the resume and
local[8]-vs-local[32] determinism tests rely on. No external data.

Vocabulary is Zipf(1.2)-weighted (inverse-CDF sampling), seeded with real
English words — including K1/K2 stopwords, so tokenizer filtering is
exercised — plus synthetic filler tokens. Ten golden queries
(evalx/golden.py) get deterministic "planted" relevant documents: designated
doc_ids receive the query's key phrase injected several times.

Use ``pages_df(spark, n)`` for a distributed DataFrame (mapInPandas over
spark.range — scales to bench sizes) or ``pages_pdf(ids)`` for a local
pandas frame (unit tests, oracles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
ZIPF_S = 1.2

# Bump whenever generated corpus BYTES can change (vocab, hashing, planting,
# burst model). bench.py folds this into its materialized-corpus cache key so
# a persistent cache dir (scripts/run_scaling.py keeps one in /dev/shm) can
# never silently serve a stale corpus across generator revisions.
CORPUS_FORMAT_VERSION = 1

# Core vocabulary: real words (stopword-heavy head so K1's stoplist matters)
# + product/review domain words + golden-query phrases + filler.
_HEAD_WORDS = [
    "the", "and", "a", "to", "of", "in", "is", "it", "you", "that", "for",
    "on", "with", "as", "are", "this", "was", "but", "they", "at", "be",
    "have", "from", "or", "had", "by", "not", "word", "what", "some", "we",
    "can", "out", "other", "were", "all", "there", "when", "use", "your",
    "how", "said", "each", "she", "which", "their", "time", "will", "way",
    "about", "many", "then", "them", "would", "like", "these", "her", "long",
    "make", "thing", "see", "him", "two", "has", "look", "more", "day",
    "could", "go", "come", "did", "my", "sound", "no", "most", "number",
    "who", "over", "know", "water", "than", "call", "first", "people",
    "may", "down", "side", "been", "now", "find",
]
_DOMAIN_WORDS = [
    "wireless", "bluetooth", "headphones", "battery", "sound", "quality",
    "comfortable", "running", "shoes", "lightweight", "yellow", "cat",
    "socks", "soft", "cotton", "kitchen", "knife", "set", "stainless",
    "steel", "gaming", "mouse", "rgb", "keyboard", "mechanical",
    "waterproof", "phone", "case", "protective", "organic", "green", "tea",
    "leather", "wallet", "men", "usb", "charging", "cable", "fast",
    "shirt", "fabric", "durable", "cheap", "excellent", "terrible",
    "product", "review", "amazing", "broke", "return", "shipping",
    "arrived", "recommend", "price", "value", "color", "size", "fit",
    "warranty", "replacement", "customer", "service", "month", "year",
    "week", "daily", "noise", "cancelling", "earbuds", "charge", "hold",
    "screen", "protector", "grip", "slim", "heavy", "light", "bright",
]


def build_vocab(size: int = 5000) -> list[str]:
    vocab = list(_HEAD_WORDS) + list(_DOMAIN_WORDS)
    i = 0
    while len(vocab) < size:
        vocab.append(f"tok{i}")
        i += 1
    return vocab[:size]


_VOCAB = build_vocab()
_VOCAB_ARR = np.array(_VOCAB)

# Zipf(1.2) inverse CDF over the vocabulary.
_weights = 1.0 / np.power(np.arange(1, len(_VOCAB) + 1, dtype=np.float64), ZIPF_S)
_CDF = np.cumsum(_weights / _weights.sum())

# Golden queries and their planted phrases. Query i's relevant docs are
# doc_ids with doc_id % PLANT_PERIOD == PLANT_OFFSETS[i][j] (j = 0..n_rel-1).
GOLDEN_PHRASES = [
    "wireless bluetooth headphones",
    "comfortable running shoes",
    "yellow cat socks",
    "kitchen knife set stainless steel",
    "gaming mouse rgb",
    "waterproof phone case",
    "organic green tea",
    "leather wallet men",
    "usb charging cable long",
    "soft cotton t-shirt",
]
PLANT_PERIOD = 997  # prime, so planting spreads across doc-ranges
N_RELEVANT = 3

# Synonym substitutions for the LAST relevant offset of each query: these
# docs express the query in paraphrase (same synonym groups the engine's
# gate/encoder use — utils.py:15-38), so exact-term BM25 cannot see them
# while a synonym-aware dense signal can — the lexical/semantic
# complementarity a hybrid exploits. Only gate-safe substitutions are
# used: the substitute must belong to a SYNONYMS/COLORS group the gate
# expands for the original query token (e.g. kitten∈cat-group), otherwise
# the attribute gate would penalize the paraphrase doc as off-topic.
_SYN_SUB = {
    "cat": "kitten", "yellow": "golden", "green": "emerald",
}

# ---- bursty/topical mode constants (pages_pdf(bursty=True) only) ----
# A golden query term at web scale has df/N ~ 1e-4..1e-6 and lives in
# topical pages that mention it repeatedly; with k1=1.2 the tf side of
# BM25 saturates fast, so what differentiates doc-range bounds (and lets
# block-max pruning skip) is per-range term ABSENCE plus dl, not raw tf.
# Bursty mode therefore confines each golden phrase's domain words to a
# 1-in-GOLDEN_TOPICS slice of "pages about that topic", enriched with the
# phrase's words (plus the hub bursts below).
GOLDEN_TOPICS = 512
_ENRICH_P = 0.05
_N_CORE = len(_HEAD_WORDS) + len(_DOMAIN_WORDS)
# vocab index → owning golden-query topic (-1 = unrestricted). Only the
# _DOMAIN_WORDS instance of a word is restricted: words that also sit in
# the stopword-heavy head ("long", "sound") keep their global
# distribution, so stopword-adjacent query terms stay high-df — realistic
# mixed selectivity.
_GOLDEN_TOPIC_OF_VOCAB = np.full(len(_VOCAB), -1, dtype=np.int64)
for _qi, _phrase in enumerate(GOLDEN_PHRASES):
    for _w in _phrase.split():
        if _w in _DOMAIN_WORDS:
            _GOLDEN_TOPIC_OF_VOCAB[len(_HEAD_WORDS)
                                   + _DOMAIN_WORDS.index(_w)] = _qi
_PHRASE_WORDS = [p.split() for p in GOLDEN_PHRASES]
_PW_MAXLEN = max(len(ws) for ws in _PHRASE_WORDS)
_PW_TABLE = np.array([[ws[j % len(ws)] for j in range(_PW_MAXLEN)]
                      for ws in _PHRASE_WORDS])
_PW_LEN = np.array([len(ws) for ws in _PHRASE_WORDS], dtype=np.int64)

# Mixed-selectivity query set for the bursty corpus: each golden phrase
# (rare topical terms, df ~1/GOLDEN_TOPICS) plus one head word that
# SURVIVES the K2 query stoplist (df 10-20%) — the rare+common mix
# block-max WAND benchmarks use, because the measurable win is skipping
# the common term's long posting list once θ is set by full-coverage
# topical docs.
COMMON_QUERY_TAILS = ["water", "people", "time", "number", "day",
                      "first", "way", "most", "know", "many"]


def bursty_queries() -> list[str]:
    return [p + " " + c for p, c in zip(GOLDEN_PHRASES, COMMON_QUERY_TAILS)]


def planted_doc_offsets(query_idx: int) -> list[int]:
    return [(13 + query_idx * 89 + j * 101) % PLANT_PERIOD
            for j in range(N_RELEVANT)]


N_DISTRACTOR = 3


def distractor_doc_offsets(query_idx: int, family: int) -> list[int]:
    """Hard-negative plants that make the golden eval discriminative —
    both families plant ALL-BUT-ONE query terms, differing in document
    shape: family 0 = short truncated doc (×8 — near-ceiling cosine AND a
    high short-dl BM25 score); family 1 = longer doc at higher tf (×10 —
    inflates dl-normalized BM25 more than L2-normalized cosine). Offsets
    are shifted away from every query's relevant offsets (asserted
    disjoint in tests/test_golden_eval.py)."""
    return [(13 + query_idx * 89 + j * 101 + 419 + family * 211)
            % PLANT_PERIOD for j in range(N_DISTRACTOR)]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_u(doc_ids: np.ndarray, stream: int) -> np.ndarray:
    """Uniform [0,1) per doc for a given stream id, deterministic."""
    h = _splitmix64(doc_ids.astype(np.uint64)
                    ^ _splitmix64(np.uint64(SEED * 1_000_003 + stream)))
    return h.astype(np.float64) / float(2**64)


def pages_pdf(doc_ids: np.ndarray, bursty: bool = False,
              plant: bool = True,
              topics: int = GOLDEN_TOPICS) -> pd.DataFrame:
    """Generate page rows for the given doc_ids (vectorized, deterministic).

    ``bursty=True`` reshapes the corpus into the regime real web text
    puts an index in, deterministic per (doc, position):

      * TOPICAL df: each golden phrase owns a 1/``GOLDEN_TOPICS`` slice
        of docs ("pages about X"); its domain words are remapped to
        filler everywhere else and enriched (~5% of tokens) inside the
        slice. Query-term df drops from ~12% to web-realistic ~0.2%, so
        most doc-ranges hold NO postings for a query term — with k1=1.2
        the tf side of BM25 saturates, and per-range term ABSENCE is
        what actually differentiates block-max bounds. Words also in the
        stopword-heavy head ("long") stay global: mixed selectivity.
      * TWO-LEVEL tf bursts: ~6% of occurrences repeat 1+⌊u^-0.7⌋ times
        (cap 24 — within-sentence repetition) and ~0.25% hub-burst
        8+⌊u^-0.5⌋ times (cap 160 — a spec sheet mentioning its product
        term dozens of times).

    ``plant=False`` drops the golden-query relevance/distractor plants
    (the bursty BENCH corpus uses this: plants deliberately scatter
    near-θ docs into EVERY range — PLANT_PERIOD is prime for exactly that
    — which flattens range bounds and hides the skip machinery the phase
    exists to measure). The default corpus (bursty=False, plant=True) is
    byte-identical to earlier revisions."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = len(doc_ids)
    # document length in tokens: 10..410, skewed short
    n_tok = (10 + (_hash_u(doc_ids, 1) ** 2 * 400)).astype(np.int64)
    total = int(n_tok.sum())
    # token stream: position-counter hashing → Zipf vocab indices
    doc_rep = np.repeat(doc_ids.astype(np.uint64), n_tok)
    pos = np.concatenate([np.arange(k, dtype=np.uint64) for k in n_tok]) \
        if n else np.zeros(0, dtype=np.uint64)
    u = _splitmix64(doc_rep * np.uint64(0x9E3779B1) ^ _splitmix64(
        pos + np.uint64(SEED))).astype(np.float64) / float(2**64)
    tok_idx = np.searchsorted(_CDF, u, side="right")
    words = _VOCAB_ARR[np.clip(tok_idx, 0, len(_VOCAB) - 1)]
    if bursty and total:
        # topical restriction: golden-phrase domain words survive only in
        # docs of their topic (df drops to web-realistic ~0.2%); topic
        # docs get enriched with their phrase's words
        tok_clip = np.clip(tok_idx, 0, len(_VOCAB) - 1)
        doc_topic = (_splitmix64(doc_ids.astype(np.uint64)
                                 ^ _splitmix64(np.uint64(SEED * 53)))
                     % np.uint64(topics)).astype(np.int64)
        topic_rep = np.repeat(doc_topic, n_tok)
        wt = _GOLDEN_TOPIC_OF_VOCAB[tok_clip]
        mismatch = (wt >= 0) & (wt != topic_rep)
        words = words.copy()
        words[mismatch] = _VOCAB_ARR[
            _N_CORE + (tok_clip[mismatch] * 13)
            % (len(_VOCAB) - _N_CORE)]
        ue = _splitmix64(doc_rep * np.uint64(0x27D4EB2F) ^ _splitmix64(
            pos + np.uint64(SEED * 41))).astype(np.float64) / float(2**64)
        upick = _splitmix64(doc_rep * np.uint64(0x165667B1) ^ _splitmix64(
            pos + np.uint64(SEED * 43))).astype(np.float64) / float(2**64)
        enrich = ((topic_rep < len(GOLDEN_PHRASES)) & (ue < _ENRICH_P)
                  & (wt < 0))
        et = topic_rep[enrich]
        words[enrich] = _PW_TABLE[
            et, (upick[enrich] * _PW_LEN[et]).astype(np.int64)]
        # two-level heavy-tailed repetition (see docstring)
        ub1 = _splitmix64(doc_rep * np.uint64(0xC2B2AE35) ^ _splitmix64(
            pos + np.uint64(SEED * 31))).astype(np.float64) / float(2**64)
        ub2 = _splitmix64(doc_rep * np.uint64(0x85EBCA77) ^ _splitmix64(
            pos + np.uint64(SEED * 37))).astype(np.float64) / float(2**64)
        u2 = np.maximum(ub2, 1e-12)
        rep = np.ones(total, dtype=np.int64)
        sent = ub1 < 0.06  # short within-sentence repetition
        rep[sent] = 1 + np.minimum(u2[sent] ** -0.7, 24.0).astype(np.int64)
        hub = ub1 < 0.0025  # rare "page about X" hub runs
        rep[hub] = 8 + np.minimum(u2[hub] ** -0.5, 160.0).astype(np.int64)
        words = np.repeat(words, rep)
        n_tok = np.add.reduceat(rep, np.concatenate(
            [[0], np.cumsum(n_tok)[:-1]]))
    bounds = np.concatenate([[0], np.cumsum(n_tok)])
    # materialize plain Python strings ONCE (tolist), then join per doc:
    # str.join over numpy str_ objects re-wraps every element and
    # dominated corpus synthesis (~60% of pages_pdf)
    wl = words.tolist()
    texts = [" ".join(wl[bounds[i]:bounds[i + 1]]) for i in range(n)]

    # plant golden phrases — graded relevance plus two hard-negative
    # families so the eval discriminates methods (a contiguous-phrase-only
    # plant saturates every method at nDCG 1.0):
    #   relevant   : every query word scattered 2-3×, PREPENDED (inside
    #                the rerank/gate text caps)
    #   family 0   : all-but-one query terms ×8 in a short truncated doc —
    #                near-ceiling cosine AND high short-dl BM25
    #   family 1   : all-but-one query terms ×10 in a longer doc — inflates
    #                dl-normalized BM25 more than L2-normalized cosine
    mod = doc_ids % PLANT_PERIOD
    rel_offsets = {off for qj in range(len(GOLDEN_PHRASES))
                   for off in planted_doc_offsets(qj)}
    for qi, phrase in enumerate(GOLDEN_PHRASES) if plant else ():
        words_q = phrase.split()
        for j, off in enumerate(planted_doc_offsets(qi)):
            syn = j == N_RELEVANT - 1
            for row in np.flatnonzero(mod == off):
                # graded relevance: each word 2-3×, scattered — strong
                # enough for every signal to see, weak enough that the
                # hard negatives (log1p-capped spam weight ≈ 1.6-2.2× the
                # relevant per-term weight at only (k-1)/k coverage)
                # interleave with relevants on any SINGLE signal. The last
                # offset plants SYNONYM paraphrases (BM25-invisible).
                reps = 2 + int(doc_ids[row]) % 2
                ws = [_SYN_SUB.get(w, w) if syn else w for w in words_q]
                scattered = " ".join(w for w in ws for _ in range(reps))
                texts[row] = scattered + " " + texts[row]
        # never distract a doc that is relevant for ANY query: family 0
        # truncates the text, which would corrupt that ground truth
        for off in distractor_doc_offsets(qi, 0):
            if off in rel_offsets:
                continue
            for row in np.flatnonzero(mod == off):
                # short doc spamming all-but-one query terms: near-ceiling
                # cosine AND a high short-dl BM25 score — fools BOTH
                # single-signal methods; only the hybrid's attribute gate
                # (missing term group) and rerank coverage demote it
                drop = int(doc_ids[row]) % len(words_q)
                sub = " ".join(w for k, w in enumerate(words_q)
                               if k != drop)
                texts[row] = ((sub + " ") * 8) + texts[row][:120]
        for off in distractor_doc_offsets(qi, 1):
            if off in rel_offsets:
                continue
            for row in np.flatnonzero(mod == off):
                # long doc with all-but-one terms at high tf: inflates the
                # dl-normalized BM25 score more than the L2-normalized
                # cosine (norm dominated by the base text)
                drop = (1 + int(doc_ids[row])) % len(words_q)
                sub = " ".join(w for k, w in enumerate(words_q)
                               if k != drop)
                texts[row] = ((sub + " ") * 10) + texts[row][:300]

    # adversarial whitespace/content in ~1% of rows (byte-identity chain)
    adv = _hash_u(doc_ids, 2) < 0.01
    for row in np.flatnonzero(adv):
        texts[row] = ("  " + texts[row][:200] + "\r\n\ttabbed nbsp "
                      + "z" * 12 + " \x1c end  ")

    lang_u = _hash_u(doc_ids, 3)
    langs = np.where(lang_u < 0.95, "en",
                     np.where(lang_u < 0.97, "es",
                              np.where(lang_u < 0.99, "de", "zh")))
    cat = (doc_ids % 7).astype(str)
    urls = np.char.add(
        np.char.add(
            np.char.add("https://site",
                        (doc_ids % 1000).astype(str)),
            np.char.add(".example/c", cat)),
        np.char.add("/page-", doc_ids.astype(str)))
    ts = pd.to_datetime(
        np.datetime64("2019-01-01")
        + ((_hash_u(doc_ids, 4) * 5 * 365 * 24 * 3600).astype("int64")
           ).astype("timedelta64[s]"))
    html_null = _hash_u(doc_ids, 5) < 0.02
    html = [None if null else
            ("<html><body><p>" + t + "</p></body></html>").encode("utf-8")
            for null, t in zip(html_null, texts)]
    return pd.DataFrame({
        "doc_id": doc_ids,
        "url": urls,
        "warc_ts": ts,
        "html": html,
        "text": texts,
        "lang": langs,
    })


PAGES_SCHEMA = ("doc_id long, url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def _all_relevant_offsets() -> list[int]:
    return sorted({off for qi in range(len(GOLDEN_PHRASES))
                   for off in planted_doc_offsets(qi)})


def page_meta_py(doc_ids: np.ndarray) -> pd.DataFrame:
    """Deterministic per-doc popularity metadata (stand-in for the review
    KPIs the reference aggregates — n_reviews/avg_stars drive the prior and
    trust signals in the second pass). Planted relevant docs get HIGH
    popularity — in the reference's data, genuinely relevant products ARE
    the well-reviewed ones, which is why its eval gives the Bayesian prior
    0.1-0.2 of the fusion weight; uncorrelated noise metadata would turn
    that design decision into a handicap."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    base_n = (doc_ids * 7919) % 120
    base_s = 1.0 + ((doc_ids * 104729) % 401) / 100.0
    rel = np.isin(doc_ids % PLANT_PERIOD, _all_relevant_offsets())
    return pd.DataFrame({
        "doc_id": doc_ids,
        "n_reviews": np.where(rel, 60 + (doc_ids * 31) % 60, base_n),
        "avg_stars": np.where(rel, 3.5 + ((doc_ids * 17) % 15) / 10.0,
                              base_s),
    })


def page_meta_cols(df):
    """Same formulas as JVM expressions (exact integer arithmetic)."""
    from pyspark.sql import functions as F
    rel = (F.col("doc_id") % PLANT_PERIOD).isin(_all_relevant_offsets())
    return df.withColumns({
        "n_reviews": F.when(rel, 60 + (F.col("doc_id") * 31) % 60)
                      .otherwise((F.col("doc_id") * 7919) % 120),
        "avg_stars": F.when(rel, 3.5 + ((F.col("doc_id") * 17) % 15) / 10.0)
                      .otherwise(1.0 + ((F.col("doc_id") * 104729) % 401)
                                 / 100.0),
    })


def pages_df(spark: SparkSession, n: int, partitions: int | None = None,
             bursty: bool = False, plant: bool = True,
             topics: int = GOLDEN_TOPICS) -> DataFrame:
    """Distributed deterministic corpus of n pages."""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def gen(it):
        for pdf in it:
            yield pages_pdf(pdf["id"].to_numpy(), bursty=bursty,
                            plant=plant, topics=topics)

    return (spark.range(0, n, numPartitions=partitions)
            .mapInPandas(gen, schema=PAGES_SCHEMA))
