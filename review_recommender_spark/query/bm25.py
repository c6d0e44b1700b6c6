"""BM25 top-k query answering over the term-partitioned posting index.

Replaces the reference's full-corpus scan (``bm25.get_scores`` computes a
dense score for every document on every query — app/test.py:168-173, a scan
the comment at :169 wrongly claims is candidates-only; SURVEY.md quirk Q2)
with:

  exact path   : partition-pruned scan of the query terms' posting blocks
                 (directory pruning on term_bucket, row-group pruning on
                 term) → vectorized decode+score in Arrow batches → one
                 shuffle of candidate (doc_id, partial) rows →
                 TakeOrderedAndProject top-k.

  pruned path  : block-max pruning at doc-range granularity. Per-block
                 score upper bounds come from (max_tf, min_dl) metadata —
                 valid for any (k1, b). Ranges whose summed per-term bounds
                 cannot beat the current k-th score are skipped entirely
                 (their blocks are never decoded). The threshold is seeded
                 by exactly scoring the most promising ranges first. This is
                 the distributed analogue of block-max WAND: the doc-range is
                 the pruning unit (blocks are range-aligned at build time),
                 which keeps the decision vectorizable and rank-safe —
                 skipping a range drops *whole documents*, never a single
                 term's contribution. Scores of surviving docs are exact, so
                 the result is rank-identical to the exact path (asserted in
                 tests/test_wand.py).

Scoring formula per SURVEY.md §2.12 (BM25Okapi semantics): repeated query
tokens weight a term by its query multiplicity; unknown terms contribute 0.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.tokenize import tokenize_k2_py
from ..index.build import InvertedIndex, term_bucket_py
from ..index.codec import decode_block

RESULT_SCHEMA = "doc_id long, score double"


def query_term_weights(spark: SparkSession, index: InvertedIndex,
                       query: str) -> dict[str, float]:
    """K2-tokenize the query and resolve per-term weights idf(t) * qtf(t).

    Unknown terms drop out (they contribute 0 in BM25Okapi)."""
    qtf = Counter(tokenize_k2_py(query))
    if not qtf:
        return {}
    terms = sorted(qtf)
    rows = (index.term_stats(spark)
            .filter(F.col("term").isin(terms))
            .select("term", "idf").collect())
    return {r["term"]: r["idf"] * qtf[r["term"]] for r in rows}


def _query_blocks(spark: SparkSession, index: InvertedIndex,
                  weights: dict[str, float]) -> DataFrame:
    terms = sorted(weights)
    buckets = sorted({term_bucket_py(t, index.cfg.index.term_buckets)
                      for t in terms})
    return (index.postings(spark)
            .filter(F.col("term_bucket").isin(buckets)
                    & F.col("term").isin(terms)))


def _score_blocks_df(blocks: DataFrame, weights: dict[str, float],
                     index: InvertedIndex) -> DataFrame:
    """Decode + score posting blocks → (doc_id, partial score) rows."""
    k1, b = index.cfg.bm25.k1, index.cfg.bm25.b
    avgdl = index.avgdl
    w = dict(weights)

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            if len(pdf) == 0:
                continue
            doc_parts, score_parts = [], []
            for term, n, db, tb, lb in zip(pdf["term"], pdf["n"],
                                           pdf["doc_bytes"], pdf["tf_bytes"],
                                           pdf["dl_bytes"]):
                doc_ids, tfs, dls = decode_block(bytes(db), bytes(tb),
                                                 bytes(lb), int(n))
                tfs = tfs.astype(np.float64)
                denom = tfs + k1 * (1 - b + b * dls.astype(np.float64) / avgdl)
                score_parts.append(w[term] * (tfs * (k1 + 1) / denom))
                doc_parts.append(doc_ids)
            yield pd.DataFrame({
                "doc_id": np.concatenate(doc_parts),
                "score": np.concatenate(score_parts),
            })

    return blocks.mapInPandas(score_batches, schema=RESULT_SCHEMA)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    return (scored.groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def bm25_topk_exact(spark: SparkSession, index: InvertedIndex, query: str,
                    k: int = 10) -> DataFrame:
    """Exact BM25 top-k: decodes every posting block of the query's terms."""
    weights = query_term_weights(spark, index, query)
    if not weights:
        return spark.createDataFrame([], RESULT_SCHEMA)
    blocks = _query_blocks(spark, index, weights)
    return _topk(_score_blocks_df(blocks, weights, index), k)


def _block_upper_bound_col(weights: dict[str, float], index: InvertedIndex):
    """Per-block score upper bound as a JVM column expression:
    w_t · (k1+1)·max_tf / (max_tf + k1·(1 − b + b·min_dl/avgdl))."""
    k1, b = index.cfg.bm25.k1, index.cfg.bm25.b
    avgdl = index.avgdl
    wcol = F.element_at(
        F.create_map(*[F.lit(x) for kv in weights.items() for x in kv]),
        F.col("term"))
    mt = F.col("max_tf").cast("double")
    denom = mt + k1 * (1 - b + b * F.col("min_dl").cast("double") / avgdl)
    return wcol * (k1 + 1) * mt / denom


def bm25_topk_pruned(spark: SparkSession, index: InvertedIndex, query: str,
                     k: int = 10, seed_ranges: int = 8,
                     min_ranges_to_prune: int = 64) -> DataFrame:
    """Rank-identical to ``bm25_topk_exact``; skips doc-ranges whose summed
    per-term upper bounds cannot reach the k-th best score.

    Adaptive: when the query's terms touch fewer than
    ``min_ranges_to_prune`` doc-ranges, the multi-job pruning machinery
    cannot beat a single exact pass (job-scheduling overhead dominates), so
    it falls through to the exact scorer. At 10^12-doc scale a head term
    touches ~10^8 ranges and pruning pays for itself."""
    weights = query_term_weights(spark, index, query)
    if not weights:
        return spark.createDataFrame([], RESULT_SCHEMA)
    blocks = _query_blocks(spark, index, weights).withColumn(
        "ub", _block_upper_bound_col(weights, index))
    n_ranges = blocks.select("range_id").distinct().count()
    if n_ranges < min_ranges_to_prune:
        return _topk(_score_blocks_df(blocks.drop("ub"), weights, index), k)

    # Per-range upper bound: Σ_t max over t's blocks in the range.
    range_bounds = (blocks.groupBy("range_id", "term")
                    .agg(F.max("ub").alias("tub"))
                    .groupBy("range_id")
                    .agg(F.sum("tub").alias("range_ub")))
    range_bounds = range_bounds.cache()
    try:
        seed = [r["range_id"] for r in
                range_bounds.orderBy(F.desc("range_ub"), F.asc("range_id"))
                .limit(seed_ranges).collect()]
        if not seed:
            return spark.createDataFrame([], RESULT_SCHEMA)
        seed_scored = _topk(
            _score_blocks_df(blocks.filter(F.col("range_id").isin(seed)),
                             weights, index), k).collect()
        theta = (seed_scored[k - 1]["score"]
                 if len(seed_scored) >= k else float("-inf"))

        survivor_ranges = (range_bounds
                           .filter((F.col("range_ub") > theta)
                                   & ~F.col("range_id").isin(seed)))
        rest = _topk(
            _score_blocks_df(
                blocks.join(F.broadcast(survivor_ranges.select("range_id")),
                            "range_id"), weights, index), k)
        seed_df = spark.createDataFrame(
            [(r["doc_id"], r["score"]) for r in seed_scored], RESULT_SCHEMA)
        return (seed_df.unionByName(rest)
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
    finally:
        range_bounds.unpersist()
