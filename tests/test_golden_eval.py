"""Golden-query eval over the planted corpus: the 4 reference method
configs must retrieve the planted relevant docs (quality floor), and
results must be deterministic."""

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.corpus.pages import page_meta_cols
from review_recommender_spark.evalx.run_eval import (format_table,
                                                     run_golden_eval)
from review_recommender_spark.query.encoder import embed_documents


@pytest.fixture(scope="module")
def eval_results(spark, small_pages, small_index):
    emb = (embed_documents(small_pages.select("doc_id", "text"))
           .select("doc_id", "embedding").cache())
    emb.count()
    meta = (small_pages.select("doc_id", F.col("text").alias("agg_text"))
            .join(page_meta_cols(small_pages.select("doc_id")), "doc_id"))
    res = run_golden_eval(spark, small_index, emb, meta, n_docs=1000, k=20)
    return res


def test_all_methods_present(eval_results):
    assert set(eval_results) == {"dense_only", "bm25_only", "hybrid",
                                 "hybrid_rerank"}


def test_quality_floor(eval_results):
    """Planted docs carry the literal phrase repeated 3-5×, so BM25 and the
    hybrid must rank them highly."""
    table = format_table(eval_results)
    print("\n" + table)
    assert eval_results["bm25_only"]["ndcg@10"] > 0.6, table
    assert eval_results["hybrid"]["ndcg@10"] > 0.6, table
    assert eval_results["hybrid"]["mrr"] > 0.6, table
    assert eval_results["bm25_only"]["recall@20"] > 0.5, table


def test_hybrid_not_worse_than_weakest_single(eval_results):
    weakest = min(eval_results["dense_only"]["ndcg@10"],
                  eval_results["bm25_only"]["ndcg@10"])
    assert eval_results["hybrid"]["ndcg@10"] >= weakest - 0.05
