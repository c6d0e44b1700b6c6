"""Golden-query benchmark: the reference's evals/run_benchmark.py flow
(4 method configs × 10 golden queries → nDCG/MRR/Recall/Precision table)
over the synthetic page corpus, executed through the distributed engine."""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig
from ..index.build import InvertedIndex
from ..query.search import hybrid_search_batch
from .golden import golden_queries, method_configs
from .metrics import evaluate_query, mean_metrics


def run_golden_eval(spark: SparkSession, index: InvertedIndex,
                    embeddings: DataFrame, doc_meta: DataFrame,
                    n_docs: int, k: int = 20,
                    query_encoder=None) -> dict[str, dict]:
    """Returns {method: {metric: mean, "per_query": [...]}}.

    ``query_encoder``: pass the matching text→vector callable when
    ``embeddings`` was built with a non-default encoder (the
    encoder-independence gate runs the whole table under a second,
    independent stand-in — tests/test_golden_eval.py)."""
    queries = golden_queries(n_docs)
    out: dict[str, dict] = {}
    for method, sp in method_configs().items():
        cfg = dataclasses.replace(index.cfg, second_pass=sp)
        idx = dataclasses.replace(index, cfg=cfg)
        res = hybrid_search_batch(
            spark, idx, embeddings, doc_meta,
            [q.query for q in queries], k=k,
            query_encoder=query_encoder).toPandas()
        per_query = []
        for q in queries:
            ranked = (res[res["query_id"] == q.qid]
                      .sort_values("rank")["doc_id"].tolist())
            per_query.append(evaluate_query([str(d) for d in ranked],
                                            {str(d) for d in q.relevant}))
        metrics = mean_metrics(per_query)
        metrics["per_query"] = per_query
        out[method] = metrics
    return out


def format_table(results: dict[str, dict]) -> str:
    methods = list(results)
    cols = ["ndcg@10", "mrr", "recall@10", "recall@20", "precision@10"]
    lines = ["| Metric | " + " | ".join(methods) + " |",
             "|---|" + "---|" * len(methods)]
    for c in cols:
        lines.append("| " + c + " | "
                     + " | ".join(f"{results[m][c]:.3f}" for m in methods)
                     + " |")
    return "\n".join(lines)
