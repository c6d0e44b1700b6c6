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


def test_method_ordering_matches_reference(eval_results):
    """The reference's §1 quality ordering (README.md:307-311:
    hybrid+rerank ≥ hybrid ≥ singles) must hold on the planted eval —
    the corpus plants graded relevants, two hard-negative families and
    synonym paraphrases precisely so single-signal methods cannot
    saturate and fusion genuinely earns its margin."""
    nd = {m: eval_results[m]["ndcg@10"] for m in eval_results}
    assert nd["hybrid_rerank"] >= nd["hybrid"] - 1e-9, nd
    assert nd["hybrid"] >= max(nd["dense_only"], nd["bm25_only"]) - 1e-9, nd
    # non-saturation: a method at 1.0 means the task stopped discriminating
    assert max(nd.values()) < 0.995, nd
    # fusion margin is real, not a tie
    assert nd["hybrid"] >= min(nd["dense_only"], nd["bm25_only"]) + 0.05, nd


@pytest.fixture(scope="module")
def eval_results_v2(spark, small_pages, small_index):
    """Same eval under the INDEPENDENT stand-in encoder (md5 hash family,
    384 dims, sqrt-tf) the corpus was NOT designed against."""
    from review_recommender_spark.query.encoder import (DIM_V2,
                                                        encode_text_v2,
                                                        hashing_encoder_v2)
    emb = (embed_documents(small_pages.select("doc_id", "text"),
                           dim=DIM_V2, model_factory=hashing_encoder_v2)
           .select("doc_id", "embedding").cache())
    emb.count()
    meta = (small_pages.select("doc_id", F.col("text").alias("agg_text"))
            .join(page_meta_cols(small_pages.select("doc_id")), "doc_id"))
    res = run_golden_eval(spark, small_index, emb, meta, n_docs=1000, k=20,
                          query_encoder=encode_text_v2)
    emb.unpersist()
    return res


def test_method_ordering_holds_under_independent_encoder(eval_results_v2):
    """Encoder-independence gate: the reference quality ordering must
    hold under an encoder the planted corpus was not co-designed with —
    evidence the golden eval measures the fusion design, not a
    corpus/encoder tuning artifact."""
    table = format_table(eval_results_v2)
    print("\n" + table)
    nd = {m: eval_results_v2[m]["ndcg@10"] for m in eval_results_v2}
    assert nd["hybrid_rerank"] >= nd["hybrid"] - 1e-9, table
    assert nd["hybrid"] >= max(nd["dense_only"], nd["bm25_only"]) - 1e-9, \
        table
    assert max(nd.values()) < 0.995, table
    assert nd["hybrid"] >= min(nd["dense_only"], nd["bm25_only"]) + 0.05, \
        table
    # the dense signal itself must be non-degenerate under v2
    assert nd["dense_only"] > 0.3, table


def test_distractor_offsets_disjoint_from_relevants():
    from review_recommender_spark.corpus.pages import (
        GOLDEN_PHRASES, distractor_doc_offsets, planted_doc_offsets)
    rel = {off for qi in range(len(GOLDEN_PHRASES))
           for off in planted_doc_offsets(qi)}
    for qi in range(len(GOLDEN_PHRASES)):
        for fam in (0, 1):
            # generator SKIPS colliding offsets rather than corrupting a
            # relevant doc; assert most survive so the families exist
            offs = distractor_doc_offsets(qi, fam)
            assert len([o for o in offs if o not in rel]) >= 1, (qi, fam)
