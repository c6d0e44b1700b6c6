"""IR metric unit tests — hand-computed values mirroring the reference's
tests/test_performance_metrics.py cases, both DCG variants (quirk Q6)."""

import math

import pytest

from review_recommender_spark.evalx.metrics import (dcg_at_k, dcg_exp_at_k,
                                                    evaluate_query,
                                                    mean_metrics, mrr,
                                                    mrr_score, ndcg_at_k,
                                                    ndcg_graded_at_k,
                                                    precision_at_k,
                                                    precision_score_at_k,
                                                    recall_at_k,
                                                    recall_score_at_k)


def test_dcg_textbook():
    # rel = [3,2,3,0,1,2]; DCG@6 = 3 + 2/log2(3) + 3/2 + 0 + 1/log2(6) + 2/log2(7)
    rels = [3, 2, 3, 0, 1, 2]
    expected = (3 + 2 / math.log2(3) + 3 / math.log2(4) + 0
                + 1 / math.log2(6) + 2 / math.log2(7))
    assert dcg_at_k(rels, 6) == pytest.approx(expected)


def test_dcg_k_truncates():
    assert dcg_at_k([1, 1, 1, 1], 2) == pytest.approx(1 + 1 / math.log2(3))


def test_dcg_exp_variant():
    # (2^3-1)/log2(2) + (2^2-1)/log2(3)
    expected = 7 / 1.0 + 3 / math.log2(3)
    assert dcg_exp_at_k([3, 2], 5) == pytest.approx(expected)


def test_ndcg_perfect_ranking_is_one():
    assert ndcg_at_k(["a", "b", "c"], {"a", "b", "c"}, 3) == pytest.approx(1.0)


def test_ndcg_no_relevant_retrieved():
    assert ndcg_at_k(["x", "y"], {"a"}, 10) == 0.0


def test_ndcg_partial():
    # relevant at ranks 1 and 3 of 3, |rel|=2 → idcg = 1 + 1/log2(3)
    got = ndcg_at_k(["a", "x", "b"], {"a", "b"}, 3)
    expected = (1 + 1 / math.log2(4)) / (1 + 1 / math.log2(3))
    assert got == pytest.approx(expected)


def test_mrr_first_hit_rank():
    assert mrr(["x", "a", "y"], {"a"}) == pytest.approx(0.5)
    assert mrr(["a"], {"a"}) == 1.0
    assert mrr(["x", "y"], {"a"}) == 0.0


def test_mrr_mean_over_queries():
    ms = [evaluate_query(["a"], {"a"}), evaluate_query(["x", "a"], {"a"})]
    assert mean_metrics(ms)["mrr"] == pytest.approx((1.0 + 0.5) / 2)


def test_recall_divides_by_relevant_size():
    assert recall_at_k(["a", "b"], {"a", "b", "c", "d"}, 10) == 0.5
    assert recall_at_k([], {"a"}, 10) == 0.0
    assert recall_at_k(["a"], set(), 10) == 0.0


def test_precision():
    assert precision_at_k(["a", "x", "b", "y"], {"a", "b"}, 4) == 0.5
    # reference semantics: divide by len(top_k), NOT k — a 1-item result
    # list that is relevant has precision 1.0 at any k
    # (evals/performance_metrics.py:144-150)
    assert precision_at_k(["a"], {"a"}, 5) == 1.0
    assert precision_at_k([], {"a"}, 5) == 0.0


# ---- verbatim ports of the reference's edge-case rows ----
# (tests/test_performance_metrics.py:22-133, one named test per case)


def test_ref_dcg_textbook_at_3():
    relevance = [3, 2, 3, 0, 1, 2]
    expected = 3.0 + 2.0 / math.log2(3) + 3.0 / math.log2(4)
    assert dcg_at_k(relevance, 3) == pytest.approx(expected, abs=0.01)


def test_ref_dcg_at_0_is_zero():
    assert dcg_at_k([3, 2, 3, 0, 1, 2], 0) == 0.0
    assert dcg_at_k([3, 2], -1) == 0.0


def test_ref_dcg_at_1_is_first_relevance():
    assert dcg_at_k([3, 2, 3, 0, 1, 2], 1) == 3.0


def test_ref_ndcg_graded_bounded_and_perfect():
    relevance = [3, 2, 3, 0, 1, 2]
    ideal = sorted(relevance, reverse=True)
    assert 0.0 <= ndcg_graded_at_k(relevance, ideal, 3) <= 1.0
    assert ndcg_graded_at_k(ideal, ideal, 3) == pytest.approx(1.0, abs=0.01)


def test_ref_ndcg_no_relevant_is_zero():
    no_rel = [0, 0, 0]
    assert ndcg_graded_at_k(no_rel, no_rel, 3) == 0.0


def test_ref_mrr_first_position():
    assert mrr_score([["item1", "item2", "item3"]],
                     [{"item1", "item4"}]) == 1.0


def test_ref_mrr_second_position():
    assert mrr_score([["item1", "item2", "item3"]],
                     [{"item2", "item4"}]) == 0.5


def test_ref_mrr_no_relevant_is_zero():
    assert mrr_score([["item1", "item2", "item3"]],
                     [{"item4", "item5"}]) == 0.0


def test_ref_mrr_multi_query_mean():
    got = mrr_score([["item1", "item2", "item3"],
                     ["item4", "item5", "item6"]],
                    [{"item2"}, {"item4"}])
    assert got == pytest.approx((0.5 + 1.0) / 2, abs=0.01)


def test_ref_mrr_length_mismatch_raises():
    with pytest.raises(ValueError):
        mrr_score([["a"]], [{"a"}, {"b"}])


def test_ref_recall_two_of_three():
    got = recall_score_at_k([["item1", "item2", "item3", "item4", "item5"]],
                            [{"item2", "item4", "item6"}], 5)
    assert got == pytest.approx(2.0 / 3.0, abs=0.01)


def test_ref_recall_perfect():
    assert recall_score_at_k([["item1", "item2", "item3"]],
                             [{"item1", "item2"}], 3) == 1.0


def test_ref_recall_empty_relevant_is_zero():
    assert recall_score_at_k([["item1", "item2", "item3"]], [set()], 3) == 0.0


def test_ref_precision_two_of_five():
    got = precision_score_at_k(
        [["item1", "item2", "item3", "item4", "item5"]],
        [{"item2", "item4", "item6"}], 5)
    assert got == pytest.approx(2.0 / 5.0, abs=0.01)


def test_ref_precision_perfect():
    assert precision_score_at_k([["item1", "item2"]],
                                [{"item1", "item2", "item3"}], 2) == 1.0


def test_devset_jsonl_roundtrip(spark, tmp_path):
    """JSONL dev-set format (app_product_search.py:436) round-trips."""
    from review_recommender_spark.evalx.devset import (load_devset_jsonl,
                                                       write_devset_jsonl)
    from review_recommender_spark.evalx.golden import GoldenQuery

    qs = [GoldenQuery(0, "wireless headphones", frozenset({1, 22, 333})),
          GoldenQuery(1, "green tea", frozenset({4}))]
    path = str(tmp_path / "dev.jsonl")
    write_devset_jsonl(qs, path)
    back = load_devset_jsonl(spark, path)
    assert {q.query for q in back} == {q.query for q in qs}
    by_q = {q.query: q.relevant for q in back}
    assert by_q["wireless headphones"] == frozenset({1, 22, 333})
    assert by_q["green tea"] == frozenset({4})
